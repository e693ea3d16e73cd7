"""F0-adaptive spectral-envelope estimation (CheapTrick-style), batched.

Reference parity: the spectral-envelope analysis of percivaltts's vocoders —
the vendored pulsemodel envelope for PML and pyworld's CheapTrick for
``VocoderWORLD`` (``percivaltts/vocoders.py``, ``external/pulsemodel/**``;
SURVEY.md §2 — file-level cites, mount empty). This is a clean-room,
TPU-first implementation of the *published* CheapTrick algorithm (M. Morise,
"CheapTrick, a spectral envelope estimator for high-quality speech
synthesis", Speech Communication 67, 2015):

1. f0-adaptive Hanning window of length 3·T0 (per frame),
2. power spectrum with DC mirroring below f0,
3. rectangular smoothing of width 2·f0/3 over frequency,
4. log, then quefrency liftering with the sinc smoothing lifter
   ``sin(π f0 q)/(π f0 q)`` and the compensation lifter
   ``(1 − 2 q1) + 2 q1 · cos(2π f0 q)`` (q1 = −0.15).

TPU-first shape: there is no per-frame Python loop anywhere — frames are a
(nf, Lmax) tensor (Lmax = 3·fs/f0_floor, static), the f0-adaptive windows are
masked per-frame cosines over that static length, the rectangular smoothing
is a cumulative-sum + fractional-index linear gather, and the lifters are
per-frame elementwise masks around two batched real FFTs. Everything jits
with static shapes.

Output convention: **log harmonic amplitude** — for a harmonic of amplitude
``a_k`` at ``f_k`` the envelope reads ``log a_k`` (window-independent), and
for stationary noise of per-sample standard deviation σ within a band it
reads ``log(σ · sqrt(f0 · CAL · dftlen / fs))`` — i.e. the amplitude of the
harmonic that would carry the band's per-f0-interval noise power. This makes
analysis → synthesis → analysis a fixed point for both components (the PML
vocoder's synthesis inverts exactly these two formulas).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from percivaltts_tpu.ops.stft import frame_signal

# Calibration constant of the estimator chain for the Hanning(3·T0) window:
# measured once on synthetic harmonic signals across f0 ∈ [80, 400] Hz (see
# tests/test_cheaptrick.py::test_harmonic_calibration) so that the envelope
# at a harmonic equals the harmonic's log amplitude. Window-shape dependent
# only; independent of fs/dftlen/f0 by construction of the chain.
CAL = 0.004057  # exp(-2 · 2.7537): offset measured f0-independent ±0.001 nats

# Default f0 used for unvoiced frames (wide analysis bands, low estimator
# variance on noise), matching WORLD's unvoiced-frame convention.
DEFAULT_UNVOICED_F0 = 500.0

# reflect padding (bins) for the rectangular smoothing at the spectrum edges;
# covers the widest smoothing window (2·500/3 Hz at fs=16k, dftlen=1024 ≈ 21
# bins) with margin
_EDGE_PAD = 48


def lerp_gather(values: jax.Array, pos: jax.Array) -> jax.Array:
    """Batched linear interpolation: values (nf, n), pos (nf, m) fractional
    indices (clamped) → (nf, m).

    The base index is clamped as an INTEGER to n − 2: clamping the float
    position to n − 1 − ε is not enough — for n ≥ ~1025 the f32 value
    rounds back up to n − 1, making i0 + 1 out of bounds, which
    take_along_axis fills with NaN (measured: NaN envelopes on any config
    whose gather positions exceed the table length)."""
    n = values.shape[-1]
    p = jnp.clip(pos, 0.0, float(n - 1))
    i0 = jnp.minimum(jnp.floor(p).astype(jnp.int32), n - 2)
    fr = p - i0.astype(values.dtype)
    lo = jnp.take_along_axis(values, i0, axis=-1)
    hi = jnp.take_along_axis(values, i0 + 1, axis=-1)
    return lo * (1.0 - fr) + hi * fr


def _time_smooth(P: jax.Array, radius: int, vuv=None) -> jax.Array:
    """Triangular smoothing of (nf, bins) along the frame axis,
    edge-replicated. Cuts the independent per-frame estimator variance on
    noise regions; harmonic powers are locally stationary so voiced frames
    lose almost nothing. When ``vuv`` is given, only neighbors with the
    SAME voicing state contribute — smoothing across a voicing boundary
    mixes a loud voiced neighbor's power into quiet unvoiced frames (the
    dominant boundary-frame copy-synthesis error)."""
    if radius <= 0:
        return P
    nf = P.shape[0]

    def shift(x, k):
        if k > 0:
            return jnp.concatenate([x[k:], jnp.repeat(x[-1:], k, axis=0)])[:nf]
        k = -k
        return jnp.concatenate([jnp.repeat(x[:1], k, axis=0), x[: nf - k]])

    v = None if vuv is None else (vuv > 0.5)
    acc = (radius + 1.0) * P
    den = jnp.full((nf, 1), radius + 1.0, P.dtype)
    for k in list(range(-radius, 0)) + list(range(1, radius + 1)):
        w = radius + 1.0 - abs(k)
        m = 1.0 if v is None else (shift(v, k) == v).astype(P.dtype)[:, None]
        acc = acc + w * m * shift(P, k)
        den = den + w * m
    return acc / den


@functools.partial(
    jax.jit,
    static_argnames=("fs", "hop", "dftlen", "f0_floor", "q1", "time_smooth"),
)
def cheaptrick_envelope(
    x: jax.Array,
    f0: jax.Array,
    fs: int,
    hop: int,
    dftlen: int,
    f0_floor: float = 60.0,
    q1: float = -0.15,
    time_smooth: int = 0,
    mirror_mask=None,
) -> jax.Array:
    """Log-amplitude spectral envelope, (frames, dftlen//2 + 1).

    x: (n,) waveform; f0: (frames,) per-frame f0 in Hz — pass the continuous
    track with unvoiced frames replaced by ``DEFAULT_UNVOICED_F0`` (the
    caller decides voicing; this function only needs a positive f0 per
    frame). frames = ceil(n / hop), centered at i·hop.

    ``mirror_mask`` (frames,) ∈ {0, 1} is the voicing decision and gates the
    TIME smoothing: only neighbors with the same voicing state contribute
    (see ``_time_smooth``). It does NOT gate the sub-f0 fill — that is
    deficit-gated on the measured signal itself for every frame (harmonic
    frames show a sub-f0 deficit and get the mirror; noise frames have real
    sub-f0 content and don't), which survives copy-synthesis where a
    voicing-keyed gate would corrupt every flipped frame. None = ungated
    time smoothing.
    """
    bins = dftlen // 2 + 1
    Lmax = int(math.ceil(3.0 * fs / f0_floor))
    if Lmax > dftlen:
        raise ValueError(
            f"dftlen {dftlen} < 3·fs/f0_floor = {Lmax}; raise dftlen or f0_floor"
        )
    f0c = jnp.clip(f0, f0_floor, fs / 6.0)  # window 3·T0 must fit Lmax

    frames = frame_signal(x, Lmax, hop)  # (nf, Lmax) centered at i·hop
    nf = frames.shape[0]

    # --- 1. f0-adaptive Hanning window over the static frame length ------- #
    half = 1.5 * fs / f0c  # (nf,) half window length in samples
    t = jnp.arange(Lmax, dtype=jnp.float32) - (Lmax // 2)
    inwin = jnp.abs(t)[None, :] <= half[:, None]
    w = jnp.where(
        inwin, 0.5 + 0.5 * jnp.cos(jnp.pi * t[None, :] / half[:, None]), 0.0
    )
    wsum2 = jnp.maximum(jnp.sum(w * w, axis=-1), 1e-12)  # (nf,)

    # --- 2. normalized power spectrum + DC mirroring below f0 ------------- #
    X = jnp.fft.rfft(frames * w, n=dftlen, axis=-1)
    P = (X.real * X.real + X.imag * X.imag) / wsum2[:, None]  # (nf, bins)
    P = _time_smooth(P, time_smooth, vuv=mirror_mask)

    dfreq = fs / dftlen
    b = jnp.arange(bins, dtype=jnp.float32)
    f0_bins = f0c / dfreq  # (nf,)
    mirror_pos = 2.0 * f0_bins[:, None] - b[None, :]  # reflect around f0
    below = b[None, :] < f0_bins[:, None]
    # Deficit-gated fill: harmonic frames have no physical energy below f0
    # and need the mirror; noise frames have real sub-f0 content that
    # mirroring would double-count (and compound each resynthesis). The
    # gate is the measured sub-f0 deficit itself — a property of the
    # SIGNAL, which copy-synthesis reproduces — rather than the voicing
    # decision, whose boundary flips would corrupt the low bands of every
    # flipped frame.
    taps = jnp.zeros_like(P)
    for j in range(-2, 3):
        lo = jnp.clip(jnp.arange(bins) + j, 0, bins - 1)
        taps = taps + P[:, lo]
    Ps5 = taps / 5.0  # lightly pre-smoothed P for the gate measurement
    p_half = lerp_gather(Ps5, 0.5 * f0_bins[:, None])  # (nf, 1)
    p_f0 = lerp_gather(Ps5, f0_bins[:, None])
    w_fill = jnp.clip(1.0 - p_half / jnp.maximum(p_f0, 1e-20), 0.0, 1.0)
    P = jnp.where(below, P + w_fill * lerp_gather(P, mirror_pos), P)

    # --- 3. rectangular smoothing, width 2·f0/3 ---------------------------- #
    # Local shifted-taps sum with fractional edge weights — NOT a global
    # cumulative sum: cumsum-and-difference in float32 cancels
    # catastrophically when the spectrum spans a wide dynamic range (a loud
    # low band pushes the running sum to where quiet top-band differences
    # fall below the rounding floor — measured as a spurious −10 nat
    # envelope collapse above 6 kHz on loud voiced frames).
    pad = _EDGE_PAD
    Pp = jnp.concatenate(
        [P[:, pad:0:-1], P, P[:, bins - 2 : bins - 2 - pad : -1]], axis=-1
    )  # reflect-padded, (nf, bins + 2·pad)
    wb = jnp.minimum((2.0 * f0_bins / 3.0)[:, None], float(pad))  # bins
    J = pad // 2 + 1
    acc = jnp.zeros_like(P)
    for j in range(-J, J + 1):
        wgt = jnp.clip(0.5 * wb + 0.5 - abs(j), 0.0, 1.0)  # (nf, 1)
        acc = acc + wgt * Pp[:, pad + j : pad + j + bins]
    S = acc / wb

    # --- 4. log + quefrency liftering -------------------------------------- #
    L = jnp.log(jnp.maximum(S, 1e-20))
    cep = jnp.fft.irfft(L + 0j, n=dftlen, axis=-1)  # (nf, dftlen)
    tau = jnp.arange(dftlen, dtype=jnp.float32)
    qq = jnp.minimum(tau, dftlen - tau) / fs  # symmetric quefrency (s)
    arg = jnp.pi * f0c[:, None] * qq[None, :]
    ls = jnp.where(arg > 1e-6, jnp.sin(arg) / jnp.maximum(arg, 1e-6), 1.0)
    lq = (1.0 - 2.0 * q1) + 2.0 * q1 * jnp.cos(2.0 * arg)
    env_logpow = jnp.fft.rfft(cep * ls * lq, axis=-1).real[:, :bins]

    # --- amplitude convention ---------------------------------------------- #
    # harmonic power a²/2·Σw² spreads over ~κ·f0 of bandwidth through the
    # window + smoothing chain, so the smoothed normalized power at the
    # harmonic is a²·dfreq/(CAL·f0); invert for log amplitude.
    off = jnp.log(f0c * CAL / dfreq)
    env = 0.5 * (env_logpow + off[:, None])

    # Nyquist hold: above the last harmonic (which can sit up to ~2·f0
    # below fs/2) a harmonic frame's envelope genuinely dips — but a
    # warped-band representation cannot carry "flat then dip" at its top
    # edge, so the dip corrupts synthesis-side unwarping of the highest
    # harmonics and compounds each roundtrip. Hold the level measured at
    # fs/2 − 2.5·f0 instead. Applied to ALL frames (not vuv-gated): on
    # noise frames the hold costs a little top-band resolution but is
    # applied identically by both analyses (synthesis regenerates noise at
    # the held level), while gating it by voicing would make every voicing
    # flip corrupt the top bands.
    hold_pos = (bins - 1.0) - 2.5 * f0_bins  # per-frame hold start (bins)
    hold_val = lerp_gather(env, hold_pos[:, None])  # (nf, 1)
    above = b[None, :] > hold_pos[:, None]
    return jnp.where(above, hold_val, env)
