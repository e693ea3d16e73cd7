"""PML-style vocoder: f0 + warped log spectral envelope + warped noise mask.

Reference parity: percivaltts's default vocoder ``VocoderPML``
(``percivaltts/vocoders.py`` + vendored ``external/pulsemodel/**``;
SURVEY.md §2): per-frame features are

* ``lf0``  — log of the continuous f0 track (interpolated through unvoiced),
* ``spec`` — frequency-warped log spectral amplitude envelope
  (``spec_size`` bands, demo 65 @ 16 kHz),
* ``nm``   — frequency-warped noise mask ∈ [0, 1] (``nm_size`` bands, demo
  33): 0 = deterministic/harmonic band, 1 = noise band. Unvoiced frames are
  all-noise (nm = 1), which also encodes the voicing decision.

Clean-room TPU-first rebuild (no reference code available — SURVEY.md §0):
the pulse-model *behavior* (harmonic + shaped-noise decomposition driven by
a per-band noise mask) is re-derived as batched spectral ops:

* analysis (default ``envelope="cheaptrick"``): one YIN pass (ops.f0), the
  f0-adaptive CheapTrick envelope in log-amplitude convention
  (ops.cheaptrick), the per-harmonic peak/valley noise mask
  (ops.aperiodicity), warping as constant matmuls (ops.warp). The round-1
  estimator (fixed-window true-envelope + band autocorrelation harmonicity,
  STFT-magnitude convention) remains under ``envelope="te"``.
* synthesis (``pml_synthesize_amp_core``): harmonic-plus-noise — a bank of
  harmonics of the continuous f0 with amplitudes from the envelope gated by
  sqrt(1 − nm) and the envelope's minimum-phase response, plus
  pitch-synchronously modulated phase-only noise shaped to the per-band
  power the analyzer reads back.

Everything is jit-compiled with static shapes; utterances are padded to a
frame multiple so the jit variant count stays bounded.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from percivaltts_tpu.config import AnalysisParams
from percivaltts_tpu.ops.aperiodicity import (
    DEFAULT_ANALYSIS,
    erode5 as _erode5,
    harmonic_envelope as _harmonic_envelope,
    harmonic_noise_mask as _harmonic_noise_mask,
)
from percivaltts_tpu.ops.cheaptrick import (
    CAL,
    DEFAULT_UNVOICED_F0,
    cheaptrick_envelope,
    lerp_gather,
)
from percivaltts_tpu.ops.envelope import spectral_envelope
from percivaltts_tpu.ops.f0 import estimate_f0
from percivaltts_tpu.ops.morph import dilate1d, erode1d, fill_from_interior
from percivaltts_tpu.ops.stft import hann_window, istft, stft
from percivaltts_tpu.ops.warp import unwarp_matrix, warp_matrix
from percivaltts_tpu.vocoders.base import (
    Vocoder,
    chunked_synthesize_batch,
    dsp_scope,
    register,
    stacked_analyze_batch,
)

# Calibration of the stochastic component for the "cheaptrick"
# (amplitude-convention) synthesis, fixing the analyze→synthesize→analyze
# loop on noise bands. Two opposing measured effects: the envelope
# estimator's log-domain smoothing reads stationary noise ~0.13 nats below
# the analytic prediction (Jensen bias), while synthesis-side pitch
# modulation and the istft/OLA chain read back ~0.16 nats hot; the net
# constant is pinned by the nm=1 roundtrip measurement (envelope bias ≈ 0,
# noise-mask roundtrip ≈ neutral — tests/test_vocoder_pml.py).
NOISE_CAL = 0.97

# Analysis/rendering conventions (nm valley smoothing, gate placement,
# edge backfill, closed-loop correction profile, THE voicing rule) live in
# ``config.AnalysisParams`` — threaded through every core below as the
# static ``ap`` argument — so the workdir config dump, the compose feature
# cache and exported artifacts all record them (VERDICT round-3 weak #2).
# Sweep provenance of each default: BASELINE.md. Highlights that must not
# be retried blindly:
#
# * nm_valley_smooth=0 — radius 3 measured WORSE (mean 4.39→5.67, flips
#   1.37→2.97%): the voicing-partitioned smoothing desynchronizes the two
#   analyses of the closed loop (each partitions by its own YIN vuv) —
#   estimator CONSISTENCY beats per-frame variance.
# * gate_theta=0.56 — swept 0.50/0.56/0.62/0.70 → 5.70/5.62/5.68/5.84 dB
#   mean; U→V resynth edge shifts best-centered at 0.56.
# * gate_min_gap=1.5 nats — below it the w-based edge placement falls back
#   to a 1-frame erosion of the voicing bit (best fixed offset, measured).
# * edge_backfill=2 / gate_edge_radius=6 — see pml_synthesize_amp_core.

# utterances are padded to a multiple of this many frames before the jitted
# cores run (bounded compile-variant count)
FRAME_MULTIPLE = 128


def env_halfw_for(envelope: str) -> float:
    """Analysis-window half-width (units of T0) of the given envelope
    estimator, for the amplitude-sharpening inverse in
    ``pml_synthesize_amp_core`` — "harmonic" reads 4·T0 windows (half-width
    2·T0), "cheaptrick" 3·T0 (1.5·T0); anything else (the fixed-window
    "te" estimator) disables sharpening (0.0)."""
    return {"harmonic": 2.0, "cheaptrick": 1.5}.get(envelope, 0.0)

def _smooth_noiselike(
    x: jax.Array, noisiness: jax.Array, radius: int = 5
) -> jax.Array:
    """Box-smooth (frames, bands) features over time within noise-like runs.

    Noise spectra carry irreducible per-frame envelope-estimator variance;
    averaging across neighboring noise-like frames cuts it. The gate is the
    *continuous* noisiness (soft-thresholded noise-mask values) rather than
    the binary voicing decision: a continuous gate roundtrips through
    copy-synthesis within ~0.1, while a voicing-bit gate made every boundary
    flip apply heavy smoothing on one side only (measured ~50 dB per-frame
    MCD on flipped frames). ``noisiness`` is either (nf,) per-frame or
    (nf, bands) per-band — per-band gating also smooths the noisy HIGH
    bands of voiced frames, whose valley-readback variance dominates the
    stationary-vowel roundtrip floor above ~3 kHz."""
    if noisiness.ndim == 1:
        noisiness = noisiness[:, None]
    s = jnp.clip((noisiness - 0.45) / 0.35, 0.0, 1.0)  # (nf, 1|bands)
    nf = x.shape[0]
    num = x * s
    den = s
    acc_n, acc_d = num, den
    for k in range(1, radius + 1):
        lead_n = jnp.concatenate([num[k:], jnp.zeros_like(num[:k])])
        lag_n = jnp.concatenate([jnp.zeros_like(num[:k]), num[: nf - k]])
        lead_d = jnp.concatenate([den[k:], jnp.zeros_like(den[:k])])
        lag_d = jnp.concatenate([jnp.zeros_like(den[:k]), den[: nf - k]])
        acc_n = acc_n + lead_n + lag_n
        acc_d = acc_d + lead_d + lag_d
    sm = acc_n / jnp.maximum(acc_d, 1e-6)
    return (1.0 - s) * x + s * sm


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
        "frame_len",
        "dftlen",
        "spec_size",
        "nm_size",
        "f0_min",
        "f0_max",
        "envelope",
        "env_time_smooth",
        "ap",
    ),
)
def pml_analyze_core(
    wav: jax.Array,
    fs: int,
    hop: int,
    frame_len: int,
    dftlen: int,
    spec_size: int,
    nm_size: int,
    f0_min: float,
    f0_max: float,
    envelope: str = "cheaptrick",
    env_time_smooth: int = 1,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> Tuple[jax.Array, jax.Array]:
    """waveform → ((frames, 1+spec+nm) features, (frames,) vuv).

    ``envelope`` selects the spec-stream estimator and its convention:
    "cheaptrick" = f0-adaptive log *harmonic amplitude* (ops.cheaptrick);
    "te" = true-envelope of the fixed-window log STFT magnitude (round-1
    estimator, kept for regression comparison)."""
    res = estimate_f0(wav, fs, hop, f0_min, f0_max)
    f0, vuv = res.f0, res.vuv

    window = hann_window(frame_len)
    spec = stft(wav, frame_len, hop, dftlen, window)  # (nf, bins)
    mag = jnp.abs(spec)
    if envelope in ("cheaptrick", "harmonic"):
        # Voiced frames key the envelope convention (window length,
        # smoothing width, amplitude normalization) on the continuous f0
        # track (roundtrips at ~0.1%); unvoiced frames use WORLD's 500 Hz
        # convention — the short (~6 ms) window stops loud voiced neighbors
        # leaking into quiet boundary frames (measured: unvoiced-frame MCD
        # 6.9→6.5 dB mean / p90 13.2→11.1; flipped-frame damage unchanged
        # at ~33 dB since a flip already switches the frame's envelope
        # convention and voicing-partitioned time smoothing either way).
        # Synthesis inverts the same convention per frame (see
        # pml_synthesize_amp_core's sigma).
        #
        # "harmonic" (default) replaces the voiced-frame CheapTrick chain
        # with the phase-insensitive peak/valley harmonic envelope
        # (ops.aperiodicity.harmonic_envelope): CheapTrick's 3·T0 window
        # makes adjacent harmonics' mainlobe skirts interfere, so its
        # envelope depends on the harmonics' relative phases — which
        # copy-synthesis replaces with minimum phase (a measured
        # 0.1–0.2 nat per-band floor even on stationary vowels,
        # scripts/dyn_diag.py). Unvoiced frames keep the 500 Hz CheapTrick
        # path either way (peaks/valleys don't exist in noise).
        f0_env = jnp.where(vuv > 0.5, f0, DEFAULT_UNVOICED_F0)
        env = cheaptrick_envelope(
            wav,
            f0_env if envelope == "cheaptrick" else jnp.full_like(f0, DEFAULT_UNVOICED_F0),
            fs,
            hop,
            dftlen,
            f0_floor=min(f0_min, 60.0),
            time_smooth=env_time_smooth,
            mirror_mask=vuv,
        )
        if envelope == "harmonic":
            env_v = _harmonic_envelope(
                wav,
                f0,
                fs,
                hop,
                dftlen,
                f0_floor=min(f0_min, 60.0),
                time_smooth=env_time_smooth,
                vuv=vuv,
                ap=ap,
            )
            env = jnp.where(vuv[:, None] > 0.5, env_v, env)
    else:
        logmag = jnp.log(jnp.maximum(mag, 1e-8))
        # True envelope everywhere. Gating TE by voicing (plain smoothing on
        # unvoiced frames) was tried and measured WORSE on copy-synthesis MCD
        # (21.5 vs 20.1 dB): wherever the voicing decision differs between two
        # analyses of near-identical audio, the estimator flips and adds a
        # 2–4 dB asymmetry — a consistent estimator beats a per-frame-optimal
        # one for parity metrics.
        _, env = spectral_envelope(logmag, f0, fs, dftlen)

    W_spec = jnp.asarray(warp_matrix(spec_size, dftlen, fs))
    spec_w = env @ W_spec  # (nf, spec_size)

    if envelope in ("cheaptrick", "harmonic"):
        nm_raw = _harmonic_noise_mask(
            wav, f0, fs, hop, nm_size, min(f0_min, 60.0),
            valley_smooth=ap.nm_valley_smooth, vuv=vuv, ap=ap,
        )
        gd_raw = None
        if ap.nm_method == "d4c_gd":
            # group-delay estimator for the nm STREAM (the gate below
            # defaults to the peak/valley reading; ap.gate_nm_source="d4c"
            # drives it from this reading instead)
            from percivaltts_tpu.ops.aperiodicity import (
                group_delay_aperiodicity as _gd_ap,
            )

            gd_raw = _gd_ap(
                wav, f0, fs, hop, nm_size, min(f0_min, 60.0),
                vuv=vuv, ap=ap,
            )
            nm = _erode5(gd_raw)
        elif ap.nm_method == "peak_valley":
            nm = _erode5(nm_raw)
        else:
            raise ValueError(
                f"unknown AnalysisParams.nm_method: {ap.nm_method!r}"
            )
        # gate on the ERODED noisiness: the raw aperiodicity spikes on
        # voiced attack/release frames (its 4·T0 window straddles the edge
        # and reads the transient as noise), and a spiky gate mixes
        # silence-level spectra into the attack frame's envelope — an
        # unreproducible suppression measured as 1–2 nats of low-band error
        # on the first voiced frames (scripts/edge_deepdive.py). Erosion
        # costs the 1–2 unvoiced frames nearest each edge their smoothing;
        # the attack frames' integrity is worth more. The gate is PER BAND
        # (nm interpolated to the spec bands — both mel-uniform): voiced
        # frames' noisy high bands need the smoothing as much as unvoiced
        # frames do.
        if ap.gate_nm_source == "d4c":
            if gd_raw is None:
                raise ValueError(
                    'gate_nm_source="d4c" requires nm_method="d4c_gd"'
                )
            gate_raw = gd_raw
        elif ap.gate_nm_source == "peak_valley":
            gate_raw = nm_raw
        else:
            raise ValueError(
                f"unknown AnalysisParams.gate_nm_source: {ap.gate_nm_source!r}"
            )
        ji = np.arange(spec_size) * (nm_size - 1) / max(spec_size - 1, 1)
        j0 = np.clip(ji.astype(np.int32), 0, nm_size - 2)
        M = np.zeros((nm_size, spec_size), np.float32)
        M[j0, np.arange(spec_size)] = 1.0 - (ji - j0)
        M[j0 + 1, np.arange(spec_size)] += ji - j0
        nm_spec = gate_raw @ jnp.asarray(M)  # (nf, spec_size)
        # 5-band box smoothing of the per-band gate, then max with the
        # per-frame scalar gate: the raw per-band gate carries the nm
        # estimator's own variance, and a gate that differs between the two
        # analyses adds (x − smoothed)·Δgate of error — measured +0.05 nats
        # on far unvoiced frames vs the stable scalar gate
        pad = jnp.concatenate(
            [nm_spec[:, :1], nm_spec[:, :1], nm_spec, nm_spec[:, -1:], nm_spec[:, -1:]],
            axis=-1,
        )
        nm_band = sum(pad[:, i : i + spec_size] for i in range(5)) / 5.0
        gate = jnp.maximum(nm_band, gate_raw.mean(axis=-1, keepdims=True))
        spec_w = _smooth_noiselike(spec_w, _erode5(gate))
    else:
        # round-1 estimator: per-band harmonicity r(τ0)/r(0) from the power
        # spectrum as band-weighted sums, bias-corrected by the window
        # autocorrelation. Ill-defined for bands narrower than f0 (the cos
        # weight is nearly constant inside such a band), which is why the
        # cheaptrick path uses the per-harmonic peak/valley estimator above.
        P = jnp.square(mag)
        W_nm = jnp.asarray(warp_matrix(nm_size, dftlen, fs))
        tau0 = fs / jnp.maximum(f0, 1.0)  # (nf,) samples
        bins = P.shape[-1]
        binidx = jnp.arange(bins, dtype=jnp.float32)
        cosv = jnp.cos(2.0 * jnp.pi * binidx[None, :] * tau0[:, None] / dftlen)
        r0 = jnp.maximum(P @ W_nm, 1e-12)
        rt = (P * cosv) @ W_nm

        # window autocorrelation (time domain, via FFT of the window's power
        # spectrum at full resolution) evaluated at the per-frame real lag τ0.
        # For a pure harmonic, r(τ0)/r(0) of the *windowed* frame equals
        # exactly this curve — dividing by it unbiases the harmonicity.
        n2 = 1 << (2 * frame_len - 1).bit_length()
        wac = jnp.fft.irfft(jnp.square(jnp.abs(jnp.fft.rfft(window, n=n2))), n=n2)
        bias_curve = wac[:frame_len] / jnp.maximum(wac[0], 1e-12)
        ti = jnp.clip(tau0, 0.0, frame_len - 2.0)
        i0 = jnp.floor(ti).astype(jnp.int32)
        fr = ti - i0.astype(jnp.float32)
        bias = bias_curve[i0] * (1.0 - fr) + bias_curve[i0 + 1] * fr
        bias = jnp.clip(bias, 0.05, 1.0)  # (nf,)

        harm = jnp.clip((rt / r0) / bias[:, None], 0.0, 1.0)
        nm = 1.0 - harm
    nm = jnp.where(vuv[:, None] > 0.5, nm, 1.0)

    lf0 = jnp.log(jnp.maximum(f0, 1.0))
    feats = jnp.concatenate([lf0[:, None], spec_w, nm], axis=-1)
    return feats, vuv


def _harmonic_grid(f0, f0_min, fs, dftlen):
    """Static harmonic-count grid: (k numbers, (nf, K) fractional bin
    positions, validity mask below Nyquist). Shared by both synthesis
    cores; sampling a spectrum at the harmonics is ``lerp_gather(M, bp)``.
    """
    K = int(fs / 2.0 / f0_min)
    k = jnp.arange(1, K + 1, dtype=jnp.float32)
    binpos = f0[:, None] * k[None, :] * dftlen / fs  # (nf, K)
    valid = binpos < (dftlen / 2.0 - 1.0)
    return k, binpos, valid


def _frame_to_sample(nf, n, hop):
    """Per-sample frame interpolation coefficients: (i0, w1) with
    track_s = track[i0]·(1−w1) + track[i0+1]·w1."""
    frame_pos = jnp.arange(n, dtype=jnp.float32) / hop
    i0 = jnp.clip(jnp.floor(frame_pos).astype(jnp.int32), 0, nf - 2)
    w1 = frame_pos - i0.astype(jnp.float32)
    return i0, w1


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
        "frame_len",
        "dftlen",
        "f0_min",
        "f0_max",
    ),
)
def pml_synthesize_core(
    lf0: jax.Array,
    spec_w: jax.Array,
    nm_w: jax.Array,
    fs: int,
    hop: int,
    frame_len: int,
    dftlen: int,
    f0_min: float,
    f0_max: float,
    seed: int = 0,
) -> jax.Array:
    """(frames,) lf0 + (frames, S) warped log env + (frames, M) warped noise
    mask → waveform (frames · hop,). Harmonic-plus-noise reconstruction."""
    nf = lf0.shape[0]
    n = nf * hop
    spec_size = spec_w.shape[-1]
    nm_size = nm_w.shape[-1]

    f0 = jnp.clip(jnp.exp(lf0), f0_min, f0_max * 1.5)
    U_spec = jnp.asarray(unwarp_matrix(spec_size, dftlen, fs))
    U_nm = jnp.asarray(unwarp_matrix(nm_size, dftlen, fs))
    logenv = spec_w @ U_spec  # (nf, bins)
    A = jnp.exp(logenv)
    nm_bins = jnp.clip(nm_w @ U_nm, 0.0, 1.0)

    window = hann_window(frame_len)
    wsum = jnp.sum(window)

    # ---- harmonic part ------------------------------------------------- #
    k, binpos, valid = _harmonic_grid(f0, f0_min, fs, dftlen)
    A_k = lerp_gather(A, binpos)  # (nf, K)
    nm_k = lerp_gather(nm_bins, binpos)
    amp_f = (2.0 / wsum) * A_k * jnp.sqrt(jnp.clip(1.0 - nm_k, 0.0, 1.0))
    amp_f = jnp.where(valid, amp_f, 0.0)

    # per-sample phase from the continuous f0 (linear interp per sample)
    i0, w1 = _frame_to_sample(nf, n, hop)
    f0_s = f0[i0] * (1.0 - w1) + f0[i0 + 1] * w1
    phase = 2.0 * jnp.pi * jnp.cumsum(f0_s) / fs  # (n,)

    # per-sample harmonic amplitudes (linear interp over frames), then sum
    amp_lo = amp_f[i0]  # (n, K)
    amp_hi = amp_f[i0 + 1]
    amp_s = amp_lo * (1.0 - w1)[:, None] + amp_hi * w1[:, None]
    harm = jnp.sum(amp_s * jnp.cos(phase[:, None] * k[None, :]), axis=-1)

    # ---- noise part ----------------------------------------------------- #
    key = jax.random.key(seed)
    noise = jax.random.normal(key, (n,), jnp.float32)
    Nspec = stft(noise, frame_len, hop, dftlen, window)[:nf]
    # E|N(f)|² = σ²·Σw² for unit-variance noise through the window, so
    # dividing by √(Σw²) normalizes the noise STFT magnitude to ~1; scaling
    # by A·√nm then puts the shaped noise in the same STFT-magnitude
    # convention the envelope was measured in, and istft inverts it.
    norm = jnp.sqrt(jnp.sum(jnp.square(window)))
    shaped = Nspec / norm * (A * jnp.sqrt(nm_bins))
    noise_wav = istft(shaped, frame_len, hop, n, window)

    return harm + noise_wav


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
        "frame_len",
        "dftlen",
        "f0_min",
        "f0_max",
        "noise_mod",
        "min_phase",
        "env_halfw",
        "env_tri_radius",
        "ap",
    ),
)
def pml_synthesize_amp_core(
    lf0: jax.Array,
    spec_w: jax.Array,
    nm_w: jax.Array,
    fs: int,
    hop: int,
    frame_len: int,
    dftlen: int,
    f0_min: float,
    f0_max: float,
    seed: int = 0,
    noise_mod: float = 0.4,
    min_phase: bool = True,
    env_halfw: float = 2.0,
    env_tri_radius: int = 1,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> jax.Array:
    """Amplitude-convention (cheaptrick) synthesis: harmonics carry the
    envelope's *minimum-phase* response (cepstrum → causal-cepstrum fold →
    Im of the analytic log-spectrum), and the stochastic part is white noise
    shaped to the per-band power the analyzer will read back
    (σ(f) = A·√nm / √(f0ₐ·CAL·dftlen/fs), with f0ₐ the f0 the re-analysis
    will use), pitch-synchronously amplitude-modulated in voiced regions —
    the pulse-model behavior of the reference's vendored
    ``external/pulsemodel/synthesis.py`` (file-level cite, mount empty),
    re-derived as batched spectral ops."""
    nf = lf0.shape[0]
    n = nf * hop
    spec_size = spec_w.shape[-1]
    nm_size = nm_w.shape[-1]
    bins = dftlen // 2 + 1

    f0 = jnp.clip(jnp.exp(lf0), f0_min, f0_max * 1.5)
    U_spec = jnp.asarray(unwarp_matrix(spec_size, dftlen, fs))
    U_nm = jnp.asarray(unwarp_matrix(nm_size, dftlen, fs))
    logA = spec_w @ U_spec  # (nf, bins) log amplitude
    A = jnp.exp(logA)
    nm_bins = jnp.clip(nm_w @ U_nm, 0.0, 1.0)
    # intended voicing: the shared low-band rule (AnalysisParams.vuv_*)
    voiced_f = _vuv_from_nm(nm_w, ap)

    # ---- harmonic part: amplitudes + minimum-phase offsets --------------- #
    # Time-SHARPEN the harmonic amplitudes before rendering. The analysis
    # reading of a moving harmonic amplitude a(t) is ≈ (K∗a)(t) with K the
    # normalized 4·T0 Hann analysis window (halfwidth 2·T0 ≈ 2–3 frames),
    # further smoothed by the ±1 triangular env_time_smooth — so rendering
    # the analyzed amplitudes verbatim makes the re-analysis smear them
    # AGAIN (feats2 ≈ C²·truth, C = K∗S): a deterministic error wherever
    # the envelope moves in time (intra-voiced phone transitions), measured
    # as ~92% of the steady-voiced copy-synthesis floor (seed-to-seed
    # 2.2 dB vs ref-vs-resynth 5.9 dB, seed study 2026-08-17). Rendering
    # the first-order inverse a ↦ 2a − C∗a instead cancels the smear to
    # second order (C(2−C) = I − (C−I)²). C is f0-adaptive per frame;
    # voiced frames only — unvoiced-frame error is stochastic, and
    # sharpening would amplify it.
    # ``env_halfw`` is the ANALYSIS window half-width in units of T0 — it
    # must match the estimator that produced spec_w (envelope="harmonic"
    # reads 4·T0 windows → 2.0; "cheaptrick"/WORLD use 3·T0 → 1.5) and
    # ``env_tri_radius`` must match its env_time_smooth, else the inverse
    # smear is mis-shaped and overshoots. 0 disables sharpening (e.g. the
    # fixed-window "te" estimator, whose smear is not f0-adaptive).
    if env_halfw > 0.0:
        halfw_f = env_halfw * fs / (f0 * hop)  # half-width in frames, (nf,)
        RAD = 4
        taus = jnp.arange(-RAD, RAD + 1, dtype=jnp.float32)
        Kw = jnp.where(
            jnp.abs(taus)[None, :] < halfw_f[:, None],
            0.5 + 0.5 * jnp.cos(jnp.pi * taus[None, :] / halfw_f[:, None]),
            0.0,
        )  # Hann amplitude kernel, (nf, 2R+1)
        r = env_tri_radius
        if r > 0:
            # compose with the analysis-side triangular time smoothing
            tw = np.asarray(
                [r + 1 - abs(s) for s in range(-r, r + 1)], np.float32
            )
            tw = tw / tw.sum()
            padded = jnp.pad(Kw, ((0, 0), (r, r)))
            W = 2 * RAD + 1
            C = sum(
                tw[s + r] * padded[:, r - s : r - s + W]
                for s in range(-r, r + 1)
            )
        else:
            C = Kw
        C = C / jnp.maximum(C.sum(axis=-1, keepdims=True), 1e-9)
        vcol = voiced_f[:, None]

        def shift_rows(x, t):
            if t == 0:
                return x
            if t > 0:
                return jnp.concatenate([x[t:], jnp.repeat(x[-1:], t, axis=0)])
            return jnp.concatenate([jnp.repeat(x[:1], -t, axis=0), x[:t]])

        # voicing-partitioned smear: only same-state frames contribute (the
        # analysis-side backfill/edge machinery owns the boundaries)
        num = sum(
            C[:, RAD + t, None] * shift_rows(A * vcol, t)
            for t in range(-RAD, RAD + 1)
        )
        den = sum(
            C[:, RAD + t, None] * shift_rows(vcol, t)
            for t in range(-RAD, RAD + 1)
        )
        A_smear = num / jnp.maximum(den, 1e-6)
        A_h = jnp.where(vcol > 0.5, jnp.maximum(2.0 * A - A_smear, 0.2 * A), A)
    else:
        A_h = A

    k, binpos, valid = _harmonic_grid(f0, f0_min, fs, dftlen)
    amp_f = lerp_gather(A_h, binpos) * jnp.sqrt(
        jnp.clip(1.0 - lerp_gather(nm_bins, binpos), 0.0, 1.0)
    )
    amp_f = jnp.where(valid, amp_f, 0.0)

    if min_phase:
        # minimum phase of the envelope: fold the real cepstrum of log A
        # onto causal quefrencies; the imaginary part of its spectrum is the
        # phase
        cep = jnp.fft.irfft(logA + 0j, n=dftlen, axis=-1)  # (nf, dftlen)
        tau = jnp.arange(dftlen)
        fold = jnp.where(
            (tau == 0) | (tau == dftlen // 2),
            1.0,
            jnp.where(tau < dftlen // 2, 2.0, 0.0),
        ).astype(jnp.float32)
        phi_bins = jnp.fft.rfft(cep * fold[None, :], axis=-1).imag[:, :bins]
        phi_f = jnp.where(valid, lerp_gather(phi_bins, binpos), 0.0)  # (nf, K)
    else:
        phi_f = jnp.zeros_like(amp_f)

    # per-sample tracks (linear interp over frames)
    i0, w1 = _frame_to_sample(nf, n, hop)
    f0_s = f0[i0] * (1.0 - w1) + f0[i0 + 1] * w1
    phase = 2.0 * jnp.pi * jnp.cumsum(f0_s) / fs  # (n,)

    # Voicing-gated harmonic bank with de-smeared attacks. The analysis
    # window (~3·T0) smears each voicing attack/release across ±2 frames of
    # envelope estimates; rendering those smeared amplitudes as the actual
    # amplitude ramp makes the re-analysis smear them AGAIN (feats2 ≈
    # S²(orig) instead of S(orig)). Instead: (1) backfill the first/last
    # EDGE_BACKFILL frames of each voiced run with the nearest interior
    # ("clean") frame's amplitude/phase, (2) hold through the first unvoiced
    # frame on each side, and (3) let a per-sample voicing gate place a
    # step-like attack at the boundary — the re-analysis then smears the
    # step exactly once, the same way it smeared the original's own attack.
    vmask = (voiced_f > 0.5)[:, None]
    prev_v = jnp.concatenate([vmask[:1], vmask[:-1]])
    next_v = jnp.concatenate([vmask[1:], vmask[-1:]])

    def hold1(x):
        prev = jnp.concatenate([x[:1], x[:-1]])
        nxt = jnp.concatenate([x[1:], x[-1:]])
        fill = jnp.where(prev_v, prev, jnp.where(next_v, nxt, x))
        return jnp.where(vmask, x, fill)

    def backfill(x):
        clean = erode1d(vmask, ap.edge_backfill)
        filled, cm = fill_from_interior(x, clean, ap.edge_backfill)
        # runs shorter than 2·EDGE_BACKFILL+1 have no clean interior: keep
        # the measured values there
        return jnp.where(vmask & cm, filled, x)

    amp_h = hold1(backfill(amp_f))
    phi_h = hold1(backfill(phi_f))
    amp_s = amp_h[i0] * (1.0 - w1)[:, None] + amp_h[i0 + 1] * w1[:, None]
    phi_s = phi_h[i0] * (1.0 - w1)[:, None] + phi_h[i0 + 1] * w1[:, None]

    # Window-power-fraction gate position. The YIN flip leads/lags the true
    # attack by a variable 1–3 frames, but the envelope's own low-band
    # energy track E records where it actually happened: for a step attack,
    # E(t) ≈ E_plateau + ½·log w(t−p), with w the fraction of the analysis
    # window's power past the step. Inverting, w = exp(2·(E − E_plateau))
    # crosses ½ exactly when the (symmetric) window is centered on the step
    # — so the rendered attack/release sits at the w = ½ crossing,
    # independent of the voiced/unvoiced level gap. (A normalized-rise
    # crossing in LOG domain is biased ~1.5 frames toward the unvoiced side
    # and gap-dependent — measured on scripts/boundary_diag.py.)
    lowb = max(int(1500.0 * dftlen / fs), 8)
    E = jnp.mean(logA[:, :lowb], axis=-1, keepdims=True)  # (nf, 1)

    def interior_fill(mask, depth):
        """Nearest-interior fill of E: interior = frames ≥``depth`` inside
        ``mask`` runs. Returns (filled E, reached?) after 8 dilation steps."""
        return fill_from_interior(E, erode1d(mask, depth), 8)

    # voiced-side smear spans ~±2.5 frames (window half-width ~1.7 plus the
    # ±1 triangular time smoothing), so the voiced plateau needs a 4-deep
    # interior; the unvoiced side's ~6 ms window needs only 2
    Ev, rv = interior_fill(vmask, 4)
    Eu, ru = interior_fill(~vmask, 2)
    ok = rv & ru & ((Ev - Eu) > ap.gate_min_gap)
    w_frac = jnp.clip(jnp.exp(2.0 * (E - Ev)), 0.0, 1.0)
    # fallback where the plateaus can't be localized (tiny low-band gap or
    # run too short): the voicing bit eroded by one frame on each side (the
    # best fixed-offset placement, measured)
    v_er = erode1d(vmask.astype(jnp.float32), 1)
    w_fin = jnp.where(ok, w_frac, v_er)[:, 0]  # (nf,)
    # The w-based edge placement owns only frames NEAR a voicing edge:
    # deep inside a voiced run a quiet phone's energy dip can push w below
    # the crossing and silence the harmonics mid-run (measured: interior
    # voiced frames re-read as unvoiced, ~35 dB per-frame MCD). Beyond
    # gate_edge_radius frames of any edge the gate follows the voicing bit.
    vb = voiced_f > 0.5
    edge = jnp.concatenate(
        [jnp.zeros((1,), bool), vb[1:] != vb[:-1]]
    ).astype(jnp.float32)
    near_edge = dilate1d(edge, ap.gate_edge_radius)
    w_fin = jnp.where(near_edge > 0.5, w_fin, voiced_f)
    w_s = w_fin[i0] * (1.0 - w1) + w_fin[i0 + 1] * w1
    step = (w_s > ap.gate_theta).astype(jnp.float32)
    # mask to within one frame of the voiced region so plateau noise in w
    # far from any boundary cannot leak harmonics
    v_dil = dilate1d(voiced_f, 1)
    m_s = v_dil[i0] * (1.0 - w1) + v_dil[i0 + 1] * w1
    step = step * jnp.clip(2.0 * m_s, 0.0, 1.0)
    # triangular ~5 ms ramp (two box filters) centered on the crossing: the
    # corpus's own attacks are ~5 ms crossfades; rendering a sharper cliff
    # splatters broadband energy that the re-analysis reads as aperiodicity
    if n > 0:
        R = max(hop // 2, 2)
        c = jnp.cumsum(jnp.pad(step, (R, R), mode="edge"))
        box = (c[R + R :] - c[: -R - R]) / (2 * R)
        c2 = jnp.cumsum(jnp.pad(box, (R // 2, R // 2), mode="edge"))
        gate_s = (c2[R // 2 + R // 2 :] - c2[: -R // 2 - R // 2]) / (2 * (R // 2))
    else:
        gate_s = step
    harm = gate_s * jnp.sum(
        amp_s * jnp.cos(phase[:, None] * k[None, :] + phi_s), axis=-1
    )

    # ---- stochastic part -------------------------------------------------- #
    # per-band noise std from the envelope amplitude under the analyzer's
    # convention (see ops.cheaptrick module docstring): voiced frames key on
    # the continuous f0 track (this lf0 stream); unvoiced frames on WORLD's
    # 500 Hz convention, exactly mirroring the analysis-side window choice —
    # inverting with the continuous f0 instead was measured +sqrt(500/f0)
    # (~+2..6 dB) too loud on unvoiced frames, invisible to the MCD gate
    # because a per-frame gain lands in the excluded c0
    f0_a = jnp.where(voiced_f > 0.5, f0, DEFAULT_UNVOICED_F0)
    sigma = (
        A
        * jnp.sqrt(nm_bins)
        * NOISE_CAL
        / jnp.sqrt(f0_a * CAL * dftlen / fs)[:, None]
    )  # (nf, bins)
    key = jax.random.key(seed)
    noise = jax.random.normal(key, (n,), jnp.float32)
    # short synthesis frames (2·hop) so a loud frame's noise cannot smear
    # into quiet neighbors — the analysis window on unvoiced frames is only
    # ~6 ms, and ±frame_len/2 of overlap-add leakage from a 25 ms window was
    # measured as a +1.5–5 nat envelope error at voiced→silence transitions
    nframe = 2 * hop
    window = hann_window(nframe)
    Nspec = stft(noise, nframe, hop, dftlen, window)[:nf]
    # phase-only: keep the white noise's phases but pin each bin's magnitude
    # to its expectation — the synthesized noise then carries the *exact*
    # target spectrum instead of a Rayleigh draw around it, which cuts the
    # re-analysis envelope fluctuation on noise bands by ~40% (measured)
    mag = jnp.sqrt(jnp.sum(window * window))
    Nspec = mag * Nspec / jnp.maximum(jnp.abs(Nspec), 1e-12)
    noise_wav = istft(Nspec * sigma, nframe, hop, n, window)

    # pulse-synchronous amplitude modulation of the noise in voiced regions
    # (noise bursts ride the glottal pulses), power-normalized
    voiced_s = voiced_f[i0] * (1.0 - w1) + voiced_f[i0 + 1] * w1
    g = 1.0 + noise_mod * voiced_s * jnp.cos(phase)
    g = g / jnp.sqrt(1.0 + 0.5 * (noise_mod * voiced_s) ** 2)

    return harm + noise_wav * g


# Closed-loop correction gates (see pml_closed_loop_core): frames within
# ap.cl_boundary_radius of a voicing flip apply DAMPED corrections
# (ap.cl_near_alpha, clamped to ±ap.cl_near_clamp nats) — the boundary
# error is only partially a repeatable operator bias, and full-strength
# corrections there raise the re-analysis vuv flip rate; interior frames
# correct at full strength, clamped to ±ap.cl_clamp (outlier readings near
# flips would otherwise overshoot). The defaults (config.AnalysisParams)
# are a validated plateau — sweep provenance, all on
# scripts/closed_loop_proto.py / cl_gate_sweep.py / boundary_diag.py:
#
# * damped-boundary profile: 5.53 dB mean vs 5.93 hard-gated, flips 2.66%
#   vs 2.93% (12 utts). Re-swept post-session-2: cl_near_alpha=0.65
#   improves seed 1234 (4.64→4.58, flips 1.49→1.43%) but regresses
#   seed-777 flips 1.51→1.99% — rejected; radius 3/2 and clamp 1.5 no
#   better.
# * cl_near_alpha_hi (near-boundary gain for bands ABOVE the voicing-read
#   region): 0.65/0.8 buy −0.06/−0.08 dB mean but flip seed 777 1.57→1.69%
#   — even high-band corrections perturb voicing (plausibly through the
#   full-band YIN f0), so the flip-neutral 0.5 stays.
# * cl_full_alpha (interior gain): the roundtrip Jacobian is slightly
#   below identity, so mild overcorrection helps — 1.0 → 5.62/5.51 mean,
#   1.1 → 5.57/5.45 (steady 3.15→3.07, flips unchanged), 1.2 → flips
#   +0.08pt, 1.3 worse.
# * cl_it2_freeze_frac (low spec bands frozen in iterations ≥ 2): the
#   voicing decision reads the nm low quarter, which moves with the low
#   spec bands — it-2 flips 1.51→2.34% all-bands vs 1.63% low-quarter
#   frozen, saturating at 0.33 (0.42 no better).
# * cl_nm_alpha (nm pre-compensation, 0 = off): 0.5 buys 0.04–0.05 dB on
#   all seeds but regresses HELD-OUT flips 1.63→1.75% — rejected by the
#   no-flip-regression rule. Knob retained for estimator changes.
#
# THE voicing rule, defined once (ap.vuv_low_frac / ap.vuv_threshold): a
# frame is voiced iff the mean of the low quarter of its warped noise-mask
# bands is below 0.75 (analysis writes nm = 1 everywhere on unvoiced
# frames, so unvoiced reads exactly 1.0 while voiced low bands carry the
# measured noise fraction, ≲0.5 plus estimator spread). Used by
# _vuv_from_nm (closed loop), the synthesis harmonic gate, and
# PMLVocoder.f0_vuv — all read the SAME AnalysisParams, or the closed-loop
# same-voicing gate, the rendered gate, and the analysis decision
# desynchronize and boundary flips return.


def _vuv_low_bands(nm, ap: AnalysisParams = DEFAULT_ANALYSIS):
    """The noise-mask band slice the voicing rule reads (np or jnp)."""
    return nm[..., : max(int(nm.shape[-1] * ap.vuv_low_frac), 1)]


def _vuv_from_nm(nm_w: jax.Array, ap: AnalysisParams = DEFAULT_ANALYSIS) -> jax.Array:
    """Voicing bit from the warped noise mask (the rule above)."""
    return (
        jnp.mean(_vuv_low_bands(nm_w, ap), axis=-1) < ap.vuv_threshold
    ).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
        "frame_len",
        "dftlen",
        "spec_size",
        "nm_size",
        "f0_min",
        "f0_max",
        "envelope",
        "env_time_smooth",
        "iters",
        "ap",
    ),
)
def pml_closed_loop_core(
    lf0: jax.Array,
    spec_w: jax.Array,
    nm_w: jax.Array,
    fs: int,
    hop: int,
    frame_len: int,
    dftlen: int,
    spec_size: int,
    nm_size: int,
    f0_min: float,
    f0_max: float,
    envelope: str = "harmonic",
    env_time_smooth: int = 1,
    seed: int = 0,
    iters: int = 1,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> jax.Array:
    """Closed-loop (analysis-by-synthesis) PML rendering.

    The roundtrip operator R = analyze∘synthesize is not the identity: on
    steady frames its error e = R(f) − f repeats across consecutive
    roundtrips (autocorrelation +0.67, per-band bias correlation +0.87 —
    scripts/double_roundtrip.py), i.e. R(x) ≈ x + b(x) with a smooth bias
    b. One correction pass renders from f − (R(f) − f): since b changes
    slowly in feature space, R(f − e) ≈ f − e + b(f) = f − (e − b) cancels
    the bias and leaves only the reading variance (steady-state
    copy-synthesis 5.6 → 3.2 dB MCD measured; the reference's open-loop
    pulse-model synthesis has no equivalent — this is what makes the
    analyze→synthesize→analyze loop near-transparent). Corrections apply to
    the spec stream only, on frames where both analyses agree on voicing:
    full strength away from voicing flips, damped (ap.cl_near_alpha,
    ap.cl_near_clamp) within ap.cl_boundary_radius of one."""
    syn_kw = dict(
        fs=fs,
        hop=hop,
        frame_len=frame_len,
        dftlen=dftlen,
        f0_min=f0_min,
        f0_max=f0_max,
        seed=seed,
        env_halfw=env_halfw_for(envelope),
        env_tri_radius=env_time_smooth,
        ap=ap,
    )
    ana_kw = dict(
        fs=fs,
        hop=hop,
        frame_len=frame_len,
        dftlen=dftlen,
        spec_size=spec_size,
        nm_size=nm_size,
        f0_min=f0_min,
        f0_max=f0_max,
        envelope=envelope,
        env_time_smooth=env_time_smooth,
        ap=ap,
    )
    v1 = _vuv_from_nm(nm_w, ap)  # (nf,)
    # distance-to-flip gate: dilate the flip indicator ap.cl_boundary_radius
    # frames each way; frames it reaches are left uncorrected
    flip = jnp.concatenate([jnp.zeros((1,)), jnp.abs(jnp.diff(v1))])
    near = dilate1d(flip, ap.cl_boundary_radius)
    # near-boundary damping is per-band: the vuv-flip channel rides the LOW
    # spec bands (they move the noise-mask readings the voicing rule
    # depends on — see ap.cl_it2_freeze_frac), so low bands keep the
    # flip-validated ap.cl_near_alpha while bands above the voicing-read
    # region may correct harder (ap.cl_near_alpha_hi)
    lo_b = max(int(spec_size * ap.cl_it2_freeze_frac), 1)
    na_band = jnp.concatenate(
        [
            jnp.full((lo_b,), ap.cl_near_alpha),
            jnp.full((spec_size - lo_b,), ap.cl_near_alpha_hi),
        ]
    )[None, :]
    alpha = ap.cl_full_alpha - (ap.cl_full_alpha - na_band) * near[:, None]
    clamp = (ap.cl_clamp - (ap.cl_clamp - ap.cl_near_clamp) * near)[:, None]

    spec_c = spec_w
    nm_c = nm_w
    for it in range(iters):
        wav = pml_synthesize_amp_core(lf0, spec_c, nm_c, **syn_kw)
        feats2, _ = pml_analyze_core(wav, **ana_kw)
        spec2 = feats2[:, 1 : 1 + spec_size]
        nm2 = feats2[:, 1 + spec_size :]
        v2 = _vuv_from_nm(nm2, ap)
        same = (v1 == v2).astype(jnp.float32)[:, None]
        if it == 0:
            a_it, c_it = alpha, clamp
        else:
            # Iterations beyond the first correct INTERIOR frames only and
            # under a tighter clamp: the residual there is ~90% repeatable
            # operator bias (corr +0.93 voiced between independent-seed
            # renders, scripts/residual_repeat.py) so a second pass cancels
            # more of it, but near-boundary corrections destabilize the
            # rendered edges, and large second corrections flip frames
            # whose voicing reading is marginal. ``marg`` additionally
            # damps frames whose re-analysis noise-mask low-band mean sits
            # within 0.15 of the voicing threshold (_vuv_from_nm).
            low2 = jnp.mean(_vuv_low_bands(nm2, ap), axis=-1)
            marg = jnp.clip(
                jnp.abs(low2 - ap.vuv_threshold) / 0.15, 0.0, 1.0
            )[:, None]
            far = erode1d(1.0 - near, ap.cl_boundary_radius)
            a_it = ap.cl_full_alpha * far[:, None] * marg
            # low-band freeze (see ap.cl_it2_freeze_frac)
            lo = max(int(spec_size * ap.cl_it2_freeze_frac), 1)
            a_it = a_it * jnp.concatenate(
                [jnp.zeros((lo,)), jnp.ones((spec_size - lo,))]
            )[None, :]
            c_it = 0.8
        # NOTE: temporally unsharp-masking the error (to invert the
        # analysis window's ±1–2 frame smear of the roundtrip Jacobian)
        # was measured WORSE at gains 0.2/0.4 (mean 4.56→4.96/5.29, flips
        # 1.49→1.77/1.89% — the mask amplifies the non-repeatable error
        # component faster than it deblurs the bias); do not retry
        # without a way to separate the two components first.
        e = jnp.clip(spec2 - spec_w, -c_it, c_it) * a_it * same
        spec_c = spec_c - e
        if ap.cl_nm_alpha > 0.0:
            # interior-only nm pre-compensation (see ap.cl_nm_alpha)
            a_nm = (ap.cl_nm_alpha * (1.0 - near))[:, None] * same
            en = jnp.clip(nm2 - nm_w, -ap.cl_nm_clamp, ap.cl_nm_clamp) * a_nm
            nm_c = jnp.clip(nm_c - en, 0.0, 1.0)
    return pml_synthesize_amp_core(lf0, spec_c, nm_c, **syn_kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
        "frame_len",
        "dftlen",
        "spec_size",
        "nm_size",
        "f0_min",
        "f0_max",
        "envelope",
        "env_time_smooth",
        "ap",
    ),
)
def _pml_analyze_vmapped(wavs, **kw):
    """vmap of the analysis core over a stacked (B, n) waveform batch."""
    return jax.vmap(lambda w: pml_analyze_core(w, **kw))(wavs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "amp",
        "fs",
        "hop",
        "frame_len",
        "dftlen",
        "f0_min",
        "f0_max",
        "env_halfw",
        "env_tri_radius",
        "ap",
    ),
)
def _pml_synthesize_vmapped(
    lf0s, specs, nms, amp, env_halfw=2.0, env_tri_radius=1,
    ap=DEFAULT_ANALYSIS, **kw
):
    """vmap of a synthesis core over stacked (B, frames, ·) features."""
    if amp:
        kw = dict(kw, env_halfw=env_halfw, env_tri_radius=env_tri_radius, ap=ap)
    core = pml_synthesize_amp_core if amp else pml_synthesize_core
    return jax.vmap(lambda a, b, c: core(a, b, c, **kw))(lf0s, specs, nms)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
        "frame_len",
        "dftlen",
        "spec_size",
        "nm_size",
        "f0_min",
        "f0_max",
        "envelope",
        "env_time_smooth",
        "iters",
        "ap",
    ),
)
def _pml_closed_loop_vmapped(lf0s, specs, nms, **kw):
    """vmap of the closed-loop core over stacked (B, frames, ·) features."""
    return jax.vmap(lambda a, b, c: pml_closed_loop_core(a, b, c, **kw))(
        lf0s, specs, nms
    )


@register
class PMLVocoder(Vocoder):
    """PML-equivalent vocoder (see module docstring)."""

    kind = "pml"

    def _pad_wav(self, wav: np.ndarray) -> Tuple[np.ndarray, int]:
        wav = self._check_wav(wav)
        hop = self.cfg.shift_samples
        nf = int(np.ceil(len(wav) / hop))
        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE
        wav_p = np.zeros(nf_pad * hop, dtype=np.float32)
        wav_p[: len(wav)] = wav
        return wav_p, nf

    def analyze(self, wav: np.ndarray) -> np.ndarray:
        c = self.cfg
        wav_p, nf = self._pad_wav(np.asarray(wav, np.float32))
        with dsp_scope():
            feats, _ = pml_analyze_core(
                jnp.asarray(wav_p),
                fs=c.fs,
                hop=c.shift_samples,
                frame_len=c.frame_samples,
                dftlen=c.dftlen,
                spec_size=c.spec_size,
                nm_size=c.nm_size,
                f0_min=c.f0_min,
                f0_max=c.f0_max,
                envelope=c.envelope,
                env_time_smooth=c.env_time_smooth,
                ap=c.analysis,
            )
        return np.asarray(feats[:nf])

    def _pad_feats(self, feats: np.ndarray, nf_pad: int) -> np.ndarray:
        """Pad (frames, F) features to ``nf_pad`` frames by replicating the
        last real frame.

        The pad tail must be ANALYSIS-CONSISTENT, not silent: the closed
        loop re-analyzes the padded render, and a silence-cliff tail
        (floor envelope, all-noise mask — the round-2 padding) dragged the
        analyzer's time-smoothed readings of the last ~5 real frames down
        by 0.5–4 nats. The loop then "corrected" those frames up by the
        clamp, leaving ~1 nat of error on every utterance ending (measured:
        scripts/residual_repeat.py; the outer analyses never see the tail
        because they run on the truncated waveform). Replicating the last
        frame renders a steady continuation the re-analysis reads at the
        same level, so end-frame corrections stay unbiased; the rendered
        tail is cut off by the caller either way."""
        nf = feats.shape[0]
        fp = np.zeros((nf_pad, feats.shape[1]), np.float32)
        fp[:nf] = feats
        if nf:
            fp[nf:] = feats[-1]
        else:
            fp[:, 0] = np.log(100.0)
            fp[:, 1 + self.cfg.spec_size :] = 1.0
            fp[:, 1 : 1 + self.cfg.spec_size] = -18.0
        return fp

    def synthesize(self, feats: np.ndarray, seed: int = 0) -> np.ndarray:
        c = self.cfg
        feats = np.asarray(feats, np.float32)
        nf = feats.shape[0]
        if nf == 0:
            return np.zeros((0,), np.float32)
        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE
        fp = self._pad_feats(feats, nf_pad)
        amp = c.envelope in ("cheaptrick", "harmonic")
        args_np = (
            fp[:, 0],
            fp[:, 1 : 1 + c.spec_size],
            fp[:, 1 + c.spec_size :],
        )
        if amp and c.closed_loop > 0:
            with dsp_scope():
                # device_put INSIDE the scope: on the tunneled runtime the
                # default device is the TPU, and placing the features there
                # first would ship them host→TPU→host (two needless ~1 GB/s
                # tunnel crossings) before the CPU-routed DSP jit runs
                args = tuple(jnp.asarray(a) for a in args_np)
                wav = pml_closed_loop_core(
                    *args,
                    fs=c.fs,
                    hop=c.shift_samples,
                    frame_len=c.frame_samples,
                    dftlen=c.dftlen,
                    spec_size=c.spec_size,
                    nm_size=c.nm_size,
                    f0_min=c.f0_min,
                    f0_max=c.f0_max,
                    envelope=c.envelope,
                    env_time_smooth=c.env_time_smooth,
                    seed=seed,
                    iters=c.closed_loop,
                    ap=c.analysis,
                )
        else:
            args = tuple(jnp.asarray(a) for a in args_np)
            core = pml_synthesize_amp_core if amp else pml_synthesize_core
            extra = (
                dict(
                    env_halfw=env_halfw_for(c.envelope),
                    env_tri_radius=c.env_time_smooth,
                    ap=c.analysis,
                )
                if amp
                else {}
            )
            wav = core(
                *args,
                fs=c.fs,
                hop=c.shift_samples,
                frame_len=c.frame_samples,
                dftlen=c.dftlen,
                f0_min=c.f0_min,
                f0_max=c.f0_max,
                seed=seed,
                **extra,
            )
        return np.asarray(wav[: nf * c.shift_samples])

    def synthesize_stacked(self, fp, seed: int = 0):
        """Traced core behind ``synthesize_batch`` (see base class): split
        the stacked features into streams and run the default synthesis
        path — closed-loop when configured, else the open-loop core."""
        c = self.cfg
        lf0 = fp[:, :, 0]
        spec = fp[:, :, 1 : 1 + c.spec_size]
        nm = fp[:, :, 1 + c.spec_size :]
        amp = c.envelope in ("cheaptrick", "harmonic")
        if amp and c.closed_loop > 0:
            return _pml_closed_loop_vmapped(
                lf0, spec, nm,
                fs=c.fs, hop=c.shift_samples, frame_len=c.frame_samples,
                dftlen=c.dftlen, spec_size=c.spec_size, nm_size=c.nm_size,
                f0_min=c.f0_min, f0_max=c.f0_max, envelope=c.envelope,
                env_time_smooth=c.env_time_smooth, seed=seed,
                iters=c.closed_loop, ap=c.analysis,
            )
        return _pml_synthesize_vmapped(
            lf0, spec, nm, amp=amp,
            fs=c.fs, hop=c.shift_samples, frame_len=c.frame_samples,
            dftlen=c.dftlen, f0_min=c.f0_min, f0_max=c.f0_max, seed=seed,
            env_halfw=env_halfw_for(c.envelope),
            env_tri_radius=c.env_time_smooth, ap=c.analysis,
        )

    def synthesize_batch(self, feats_list, seed: int = 0, chunk: int = 4) -> list:
        """One vmapped device call per chunk of utterances (all padded to
        the chunk's frame bound), instead of one jit variant + dispatch per
        distinct utterance length. ``seed`` keys the stochastic component;
        every utterance draws the same noise sequence, exactly as repeated
        ``synthesize(f, seed=seed)`` calls would."""
        c = self.cfg

        def build(batch, nf_pad):
            # numpy out: run() device_puts inside dsp_scope so the
            # tunneled runtime doesn't ship features host→TPU→host first
            fp = np.stack([self._pad_feats(f, nf_pad) for f in batch])
            return (
                fp[:, :, 0],
                fp[:, :, 1 : 1 + c.spec_size],
                fp[:, :, 1 + c.spec_size :],
            )

        amp = c.envelope in ("cheaptrick", "harmonic")

        def run(args):
            if amp and c.closed_loop > 0:
                with dsp_scope():
                    args = tuple(jnp.asarray(a) for a in args)
                    return _pml_closed_loop_vmapped(
                        *args,
                        fs=c.fs,
                        hop=c.shift_samples,
                        frame_len=c.frame_samples,
                        dftlen=c.dftlen,
                        spec_size=c.spec_size,
                        nm_size=c.nm_size,
                        f0_min=c.f0_min,
                        f0_max=c.f0_max,
                        envelope=c.envelope,
                        env_time_smooth=c.env_time_smooth,
                        seed=seed,
                        iters=c.closed_loop,
                        ap=c.analysis,
                    )
            return _pml_synthesize_vmapped(
                *(jnp.asarray(a) for a in args),
                amp=amp,
                fs=c.fs,
                hop=c.shift_samples,
                frame_len=c.frame_samples,
                dftlen=c.dftlen,
                f0_min=c.f0_min,
                f0_max=c.f0_max,
                seed=seed,
                env_halfw=env_halfw_for(c.envelope),
                env_tri_radius=c.env_time_smooth,
                ap=c.analysis,
            )

        return chunked_synthesize_batch(
            feats_list, chunk, FRAME_MULTIPLE, c.shift_samples, build, run
        )

    def analyze_batch(self, wavs) -> list:
        """One vmapped device call for the stacked chunk (see
        ``base.stacked_analyze_batch``)."""
        c = self.cfg

        def run(stack):
            with dsp_scope():
                feats, _ = _pml_analyze_vmapped(
                    jnp.asarray(stack),
                    fs=c.fs,
                    hop=c.shift_samples,
                    frame_len=c.frame_samples,
                    dftlen=c.dftlen,
                    spec_size=c.spec_size,
                    nm_size=c.nm_size,
                    f0_min=c.f0_min,
                    f0_max=c.f0_max,
                    envelope=c.envelope,
                    env_time_smooth=c.env_time_smooth,
                    ap=c.analysis,
                )
            return feats

        return stacked_analyze_batch(
            [self._check_wav(w) for w in wavs], FRAME_MULTIPLE, c.shift_samples, run
        )

    def f0_vuv(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """f0 from the lf0 stream; voicing from the shared low-band
        noise-mask rule (``AnalysisParams.vuv_low_frac`` /
        ``vuv_threshold``) — numpy here, but the SAME AnalysisParams as
        the in-jit gates."""
        lf0 = self.stream(feats, "f0")[..., 0]
        nm = self.stream(feats, "nm")
        ap = self.cfg.analysis
        vuv = (
            _vuv_low_bands(nm, ap).mean(axis=-1) < ap.vuv_threshold
        ).astype(np.float32)
        return np.exp(lf0), vuv

    def f0_vuv_pred(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Voicing for MODEL-PREDICTED tracks under the prediction-side
        rule (``VocoderConfig.vuv_pred_low_frac``/``vuv_pred_threshold``;
        None = the analysis rule). The predicted d4c_gd nm stream sits
        lower through voicing releases than analysis tracks, so the
        analysis threshold (0.75 on the lowest 25% of bands) over-voices
        release tails — the round-4 matched-soak calibration (lowest 65%
        < 0.60, valid-chosen) reads test VUV 2.69% → 0.95% on the same
        checkpoint. Analysis/copy-synthesis paths never call this."""
        c = self.cfg
        if c.vuv_pred_low_frac is None and c.vuv_pred_threshold is None:
            return self.f0_vuv(feats)
        ap = c.analysis
        frac = c.vuv_pred_low_frac if c.vuv_pred_low_frac is not None else ap.vuv_low_frac
        th = c.vuv_pred_threshold if c.vuv_pred_threshold is not None else ap.vuv_threshold
        nm = self.stream(feats, "nm")
        k = max(int(nm.shape[-1] * frac), 1)
        vuv = (nm[..., :k].mean(axis=-1) < th).astype(np.float32)
        return np.exp(self.stream(feats, "f0")[..., 0]), vuv
