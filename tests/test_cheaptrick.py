"""Calibration + consistency tests for the f0-adaptive envelope estimator
(ops.cheaptrick) and the per-harmonic aperiodicity estimator
(ops.aperiodicity) — the round-2 vocoder analysis stack."""

import numpy as np
import pytest

import jax.numpy as jnp

from percivaltts_tpu.ops.aperiodicity import harmonic_noise_mask
from percivaltts_tpu.ops.cheaptrick import CAL, cheaptrick_envelope

FS, HOP, DFTLEN = 16000, 80, 1024


def _harmonic(f0, amps, dur=1.0, fs=FS, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * fs)) / fs
    x = sum(
        a * np.cos(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
        for k, a in zip(range(1, len(amps) + 1), amps)
    )
    return np.asarray(x, np.float32)


@pytest.mark.parametrize("f0v", [80.0, 140.0, 240.0, 400.0])
def test_harmonic_calibration(f0v):
    """Envelope at a harmonic equals the harmonic's log amplitude — the
    amplitude convention is f0-independent (pins CAL)."""
    K = int(FS / 2 / f0v) - 1
    amps = np.array([1.0 / (1.0 + (k * f0v / 900.0) ** 2) for k in range(1, K + 1)])
    x = _harmonic(f0v, amps)
    nf = int(np.ceil(len(x) / HOP))
    env = np.asarray(
        cheaptrick_envelope(
            jnp.asarray(x), jnp.asarray(np.full(nf, f0v, np.float32)), FS, HOP, DFTLEN
        )
    )
    core = slice(nf // 4, 3 * nf // 4)
    errs = []
    for k, a in zip(range(1, K + 1), amps):
        if k * f0v > FS / 2 * 0.9:
            break
        bp = k * f0v * DFTLEN / FS
        b0, fr = int(bp), bp - int(bp)
        errs.append(
            np.median(env[core, b0] * (1 - fr) + env[core, b0 + 1] * fr) - np.log(a)
        )
    assert abs(np.median(errs)) < 0.05, np.median(errs)


def test_noise_calibration():
    """White noise of std σ reads log(σ·sqrt(f0·CAL·dftlen/fs)) within the
    measured Jensen bias of the log-domain smoothing (~0.15 nats)."""
    rng = np.random.default_rng(1)
    sig = 0.1
    x = (rng.normal(size=FS) * sig).astype(np.float32)
    nf = int(np.ceil(len(x) / HOP))
    for f0a in (140.0, 400.0):
        env = np.asarray(
            cheaptrick_envelope(
                jnp.asarray(x),
                jnp.asarray(np.full(nf, f0a, np.float32)),
                FS,
                HOP,
                DFTLEN,
            )
        )
        pred = np.log(sig) + 0.5 * np.log(f0a * CAL * DFTLEN / FS)
        mid = np.median(env[nf // 4 : 3 * nf // 4, 80:400])
        assert abs(mid - pred) < 0.3, (f0a, mid, pred)


@pytest.mark.slow
@pytest.mark.parametrize("nu", [0.1, 0.3, 0.7])
def test_noise_mask_calibration(nu):
    """Per-harmonic noise-fraction estimator reads the constructed ground
    truth (harmonics + white noise of known per-f0-interval power fraction)
    within ±0.07 across f0."""
    for f0v in (100.0, 220.0):
        A = 0.3
        K = int(FS / 2 / f0v) - 1
        amps = np.full(K, A * np.sqrt(1.0 - nu))
        x = _harmonic(f0v, amps, seed=2)
        h = (A * np.sqrt(1 - nu)) ** 2 / 2.0
        sig2 = h * nu / (1.0 - nu) * FS / (2.0 * f0v)
        rng = np.random.default_rng(3)
        x = (x + rng.normal(size=len(x)) * np.sqrt(sig2)).astype(np.float32)
        nf = int(np.ceil(len(x) / HOP))
        nm = np.asarray(
            harmonic_noise_mask(
                jnp.asarray(x),
                jnp.asarray(np.full(nf, f0v, np.float32)),
                FS,
                HOP,
                33,
                60.0,
            )
        )
        m = np.median(nm[nf // 4 : 3 * nf // 4, 4:20])
        assert abs(m - nu) < 0.07, (f0v, nu, m)


def test_temporal_stability():
    """The f0-adaptive window keeps the envelope temporally stable on a
    stationary harmonic signal (CheapTrick's design goal)."""
    f0v = 137.0  # deliberately not hop-aligned
    K = int(FS / 2 / f0v) - 1
    x = _harmonic(f0v, np.ones(K) * 0.1)
    nf = int(np.ceil(len(x) / HOP))
    env = np.asarray(
        cheaptrick_envelope(
            jnp.asarray(x),
            jnp.asarray(np.full(nf, f0v, np.float32)),
            FS,
            HOP,
            DFTLEN,
            time_smooth=0,
        )
    )
    core = env[nf // 4 : 3 * nf // 4, 60:420]
    flut = core - np.median(core, axis=0, keepdims=True)
    assert np.sqrt((flut**2).mean()) < 0.05, np.sqrt((flut**2).mean())


def test_wide_dynamic_range_no_collapse():
    """Regression for the float32 cumsum cancellation: a loud low band must
    not corrupt quiet top bands (was a −10 nat collapse above 6 kHz)."""
    rng = np.random.default_rng(4)
    t = np.arange(FS) / FS
    # loud low tone + quiet high noise, 60 dB apart
    x = np.sin(2 * np.pi * 150.0 * t)
    hi = rng.normal(size=FS)
    from numpy.fft import irfft, rfft

    H = rfft(hi)
    fr = np.fft.rfftfreq(FS, 1 / FS)
    H[fr < 6000] = 0.0
    x = (x + 1e-3 * irfft(H, n=FS)).astype(np.float32)
    nf = int(np.ceil(len(x) / HOP))
    env = np.asarray(
        cheaptrick_envelope(
            jnp.asarray(x), jnp.asarray(np.full(nf, 150.0, np.float32)), FS, HOP, DFTLEN
        )
    )
    core = env[nf // 4 : 3 * nf // 4]
    bins_7k = slice(int(6500 * DFTLEN / FS), int(7500 * DFTLEN / FS))
    # high-band noise floor ~1e-3·sqrt(f0·CAL·dftlen/fs)·(per-Hz density):
    # just assert it is measured within a few nats of the true level, i.e.
    # far above a float32-cancellation collapse (which read ≈ −23)
    level = np.median(core[:, bins_7k])
    assert level > -12.0, level


@pytest.mark.parametrize("f0v", [90.0, 140.0, 220.0, 330.0])
def test_harmonic_envelope_calibration(f0v):
    """The peak/valley harmonic envelope reads each harmonic's log amplitude
    f0-independently (pins ENV_PK), with a tighter gate than CheapTrick:
    its 4·T0 peaks are phase-insensitive (measured ±0.02 nats)."""
    from percivaltts_tpu.ops.aperiodicity import harmonic_envelope
    from percivaltts_tpu.ops.stft import num_frames
    import math

    K = int(FS / 2 / f0v) - 1
    amps = np.array([1.0 / (1.0 + (k * f0v / 900.0) ** 2) for k in range(1, K + 1)])
    x = _harmonic(f0v, amps)
    Lnm = int(math.ceil(4.0 * FS / 60.0))
    nf = num_frames(len(x), Lnm, HOP)
    env = np.asarray(
        harmonic_envelope(
            jnp.asarray(x),
            jnp.asarray(np.full(nf, f0v, np.float32)),
            FS,
            HOP,
            DFTLEN,
            60.0,
        )
    )
    core = slice(nf // 4, 3 * nf // 4)
    errs = []
    for k, a in zip(range(1, K + 1), amps):
        if k * f0v > FS / 2 * 0.9:
            break
        bp = k * f0v * DFTLEN / FS
        b0, fr = int(bp), bp - int(bp)
        errs.append(
            np.median(env[core, b0] * (1 - fr) + env[core, b0 + 1] * fr) - np.log(a)
        )
    assert abs(np.median(errs)) < 0.03, np.median(errs)
    assert np.abs(errs).max() < 0.06, np.abs(errs).max()


def test_harmonic_envelope_noise_convention():
    """Stationary noise reads the SAME amplitude convention as
    ops.cheaptrick (log(σ·sqrt(f0·CAL·dftlen/fs))), so one synthesis
    inversion serves both estimators."""
    from percivaltts_tpu.ops.aperiodicity import harmonic_envelope
    from percivaltts_tpu.ops.stft import num_frames
    import math

    rng = np.random.default_rng(1)
    sig = 0.1
    x = (rng.normal(size=FS) * sig).astype(np.float32)
    Lnm = int(math.ceil(4.0 * FS / 60.0))
    nf = num_frames(len(x), Lnm, HOP)
    for f0a in (140.0, 500.0):
        env = np.asarray(
            harmonic_envelope(
                jnp.asarray(x),
                jnp.asarray(np.full(nf, f0a, np.float32)),
                FS,
                HOP,
                DFTLEN,
                60.0,
            )
        )
        pred = np.log(sig) + 0.5 * np.log(f0a * CAL * DFTLEN / FS)
        mid = np.median(env[nf // 4 : 3 * nf // 4, 80:400])
        assert abs(mid - pred) < 0.1, (f0a, mid, pred)


def test_lerp_gather_out_of_range_positions():
    """Positions past the table end must clamp, not NaN: float32 clamping to
    n−1−ε rounds back to n−1 for n ≥ ~1025 and take_along_axis fills NaN
    (the bug behind NaN envelopes on high-harmonic configs)."""
    from percivaltts_tpu.ops.cheaptrick import lerp_gather

    vals = jnp.asarray(np.arange(1025, dtype=np.float32))[None, :]
    pos = jnp.asarray(np.array([[1024.0, 1024.5, 3000.0, -5.0]], np.float32))
    out = np.asarray(lerp_gather(vals, pos))
    assert np.isfinite(out).all(), out
    np.testing.assert_allclose(out, [[1024.0, 1024.0, 1024.0, 0.0]])
