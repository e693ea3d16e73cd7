"""Per-harmonic aperiodicity (noise-fraction) estimation, batched.

Reference parity: the aperiodicity analyses of percivaltts's vocoders — the
noise mask of the vendored pulsemodel (PML) and pyworld's D4C band
aperiodicity for ``VocoderWORLD`` (``percivaltts/vocoders.py``; SURVEY.md §2
— file-level cites, mount empty). Clean-room TPU-first estimator shared by
both vocoder front-ends:

A 4·T0 f0-adaptive Hann window places exact spectral nulls at the
inter-harmonic valleys (k ± ½)·f0, so the valley power is a clean estimate
of the noise level per harmonic interval while the peak at k·f0 carries
harmonic + noise. The per-harmonic noise fraction
``v / (v + NM_RHO·(p − v))`` is then interpolated at each output band's
center frequency in harmonic-index space — well-defined at every band
width, unlike band-aggregated autocorrelation (which is blind inside bands
narrower than f0). Everything is batched over frames with static shapes;
there is no per-frame Python loop.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from percivaltts_tpu.config import AnalysisParams
from percivaltts_tpu.ops.stft import frame_signal
from percivaltts_tpu.ops.warp import _band_centers_hz

# default estimator conventions; experiments pass their own
# ``config.AnalysisParams`` (threaded from ``VocoderConfig.analysis``)
# instead of mutating module globals — see that dataclass's docstring
DEFAULT_ANALYSIS = AnalysisParams()

# ratio of the harmonic mainlobe's integrated power to its peak value for
# the 4·T0 Hann window, in units of the per-f0-interval noise integral
# (analytically 3/8 = the Hann equivalent noise bandwidth ratio; calibrated
# on synthetic harmonic+noise mixtures across f0 ∈ [100, 300] Hz and noise
# fractions 0.1–0.9 — see tests/test_cheaptrick.py)
NM_RHO = 0.375


from percivaltts_tpu.ops.cheaptrick import lerp_gather as lerp_cols  # one impl


def erode5(x: jax.Array) -> jax.Array:
    """Running minimum over ±2 frames along axis 0 (edge-replicated).

    The aperiodicity analysis window spans ±2·T0 (~±2–3 frames), so at a
    voicing edge it straddles the transition and misreads the spectral
    change as aperiodicity — measured as the low-band noise fraction
    spiking from ~0.02 to ~0.4 on the last two voiced frames of every run,
    which synthesis then renders as a loud low-frequency noise burst. A
    5-frame erosion removes the edge spike; the true value cannot change
    faster than the window anyway."""
    from percivaltts_tpu.ops.morph import erode1d

    return erode1d(x, 2)


# Read valleys from an ADDITIONAL 8·T0-window spectrum averaged over the
# {k±3/8, k±1/2, k±5/8}·f0 nulls (6 draws per harmonic vs the 4·T0
# window's 2). In theory a ~1.7× std cut on the noise reading (a
# periodogram bin's variance is PSD² regardless of window length, so only
# more independent null reads help). Measured WORSE on copy-synthesis
# (scripts/boundary_diag.py 12 1234, closed_loop=2: mean 4.39→4.87,
# steady 2.76→3.03, flips 1.37→2.00%): the power-lerp at the off-midpoint
# nulls reads partway up the f0/8-wide sidelobe shoulders (harmonic
# leakage the 4·T0 midpoint double-null doesn't have), and the 2× window
# smears voicing edges past what the erode/gating machinery expects. The
# steady-state floor did NOT drop — leakage replaced the variance it
# removed. Keep False; a retry needs exact-bin nulls (f0-synchronous FFT
# length), not lerp'd ones.
VALLEY_8T0 = False

# Pitch-SYNCHRONOUS peak/valley spectrum (AnalysisParams.psync /
# .ps_periods — PS_PERIODS below refers to that field): resample
# PS_PERIODS periods of signal to a fixed PS_N-sample frame (linear
# interp), so harmonic k lands
# EXACTLY on bin PS_PERIODS·k and every inter-harmonic bin at offsets
# ±2..±6 is an exact null of both neighbors (full-length periodic Hann
# mainlobe = ±2 bins): 10 leakage-free noise draws per harmonic instead of
# 2 power-lerp'd ones, and exact-bin peaks. Prototype measurement
# (`scripts/psync_proto.py`): valley reading rel-std 0.52–0.80 →
# 0.33–0.44, pure-noise 0.70 → 0.39, peak rel-std −20%. Readings are
# converted back to the production 4·T0 conventions (see
# _psync_peaks_valleys) so downstream calibration constants (ENV_PK, CAL,
# NM_RHO, NOISE_CAL) keep their meaning; the linear interpolator's sinc²
# amplitude roll-off is divided out analytically. Caveat: the resampled
# Nyquist is (PS_N/(2·PS_PERIODS))·f0 — full-band only for f0 ≥ 62.5 Hz at
# the defaults; harmonics above it lose the exactness guarantee.
#
# MEASURED HISTORY.
#
# Round-3 session 5, PS_PERIODS=8: wins every micro-benchmark — valley
# rel-std 0.70→0.39, mixture-oracle Jensen bias +0.04→+0.01, exact-bin
# peak conventions to ≤1% — yet LOSES end-to-end copy-synthesis
# (scripts/boundary_diag.py 12 1234, closed_loop=2: mean 4.39→5.70,
# steady 2.76→3.50, flips 1.37→2.74% with INTERIOR flips appearing).
# A noise_mod=0 knockout showed modulated-noise aliasing explains only a
# small part (5.70→5.53, flips 2.74→2.31%).
#
# Round-3 session 7 ATTRIBUTION, via PS_PERIODS=4: at 4 periods the
# window support (±2·T0) matches the production 4·T0 reader while the
# bins stay exact, isolating support from exactness — and the deficit
# VANISHES: 12-utt seeds 1234/777/42 mean 4.28/4.45/4.18 (production
# reader 4.39/4.74/4.63), steady-state 2.48 (2.76), hard corpus 6.07
# (6.08); WORLD 4.28/4.55 (4.39/4.87). The session-5 loss was therefore
# the 8-period window's 2× time support smearing voicing edges past what
# the erode/gate radii are tuned for (the VALLEY_8T0 failure mode), NOT
# the exact-bin reads — which, with support matched, deliver the variance
# cut end-to-end: the steady-state floor drops 10%. Flip rates are mixed
# (PML 1234 1.37→1.56%, 777 1.53→1.61%, held-out 42 1.63→1.55%, hard
# 2.35→2.27%; WORLD 0.70→0.98 / 0.72→0.76%) — net flat, and the held-out
# seed improves on BOTH axes, so this is not tuned-seed overfitting.
# DEFAULT since session 7: PSYNC=True, PS_PERIODS=4 (the 4·T0 lerp reader
# remains under PSYNC=False). The closed-loop gate constants were
# re-swept under this reader (CL_FA 1.0/1.1/1.2, CL_NA 0.35/0.65,
# CL_BR 3/5, scripts/cl_gate_sweep.py): every move is a wash or a
# held-out flip regression (BR=3 improves both tuned seeds but flips
# seed-42 1.55→1.79%) — the validated plateau holds for both readers.
# At 4 periods only the ±2-bin midpoint nulls are outside both neighbors'
# kernels (2 draws per harmonic, like production) — the win is exactness,
# not draw count. The support/draws tradeoff was swept: PS_PERIODS=5
# (4 draws, ±2.5·T0) looks better on seed 1234 (flips 1.56→1.21%) but
# regresses everywhere else (777 flips 1.61→2.55%, 42 1.55→1.79%, hard
# 2.27→2.76%); PS_PERIODS=6 is worse on all axes (mean 4.72, steady
# 2.82). 4 dominates — support damage grows faster than √draws variance
# reduction.
PS_N = 2048

# Boundary-side reflection (AnalysisParams.ps_reflect — a
# sub-frame/pitch-event-aligned analysis
# prototype, round-3): read positions that would cross the nearest voicing
# transition are reflected back into the frame's own voicing region, so
# the window at a dist-0 frame reads ONLY same-side content. Both analyses
# of the copy-synthesis loop apply it (each from its own YIN vuv), so the
# boundary frames' harmonic/noise mixture becomes consistent between them
# — the dist-0 error mode the round-3 error budget identified (both
# analyses straddle the transition and read different mixtures of the
# same instant). The transition position is frame-granular (the midpoint
# between the two frame centers); a single reflection per side + clamp.
#
# MEASURED (round-3 session 8, scripts/boundary_diag.py): a WASH on the
# tuned seed (mean 4.39→4.38, flips 1.56→1.53%) and a slight held-out
# regression (seed 42: 4.27→4.33, flips 1.55→1.59%). The mechanism works
# as designed — near-boundary voiced low/mid band errors drop (g0
# 0.217→0.184, g3 0.147→0.116 nats) — but the fold's phase discontinuity
# leaks into the high harmonics (g6 0.195→0.215, g7 0.196→0.205) and
# cancels the gain. Default False; a retry in this estimator class should
# pitch-event-align the window START rather than folding its tail.
# NOTE: the reflection requires ``vuv`` — enabling ps_reflect without
# threading it raises at trace time (partial application would otherwise
# be silent and undetectable during experiments).


def _psync_frames(
    wav, f0c, fs, hop, nf, vuv=None, ap: AnalysisParams = DEFAULT_ANALYSIS
):
    """Pitch-synchronously resampled analysis frames, (nf, PS_N): PS_PERIODS
    pitch periods linear-resampled to PS_N samples, window placement per the
    AnalysisParams conventions (centered; optional reflect/shift near
    voicing transitions). Shared by the exact-bin peak/valley reader and the
    group-delay aperiodicity statistic."""
    PS_PERIODS = ap.ps_periods
    span = PS_PERIODS * fs / f0c  # (nf,) original samples per frame
    centers = jnp.arange(nf, dtype=jnp.float32) * hop
    rel = (jnp.arange(PS_N, dtype=jnp.float32) - PS_N / 2) / PS_N  # (N,)
    idx = centers[:, None] + rel[None, :] * span[:, None]
    if (ap.ps_reflect or ap.ps_shift) and vuv is None:
        raise ValueError(
            "AnalysisParams.ps_reflect/ps_shift=True requires the vuv track "
            "to be threaded into the peak/valley reader (got vuv=None)"
        )
    if (ap.ps_reflect or ap.ps_shift) and nf > 1:
        v = (vuv[:nf] > 0.5).astype(jnp.float32)
        flips = v[1:] != v[:-1]  # (nf-1,) flip between frames i and i+1
        far = jnp.full((1,), 1e9, jnp.float32)
        bnd = (jnp.arange(nf - 1, dtype=jnp.float32) + 0.5) * hop
        # nearest flip boundary strictly left/right of each frame's center
        left = jnp.concatenate(
            [-far, jax.lax.cummax(jnp.where(flips, bnd, -1e9))]
        )[:, None]
        right = jnp.concatenate(
            [jax.lax.cummin(jnp.where(flips, bnd, 1e9), reverse=True), far]
        )[:, None]
    if ap.ps_shift and nf > 1:
        # Pulse-aligned sub-frame estimator (the class the PS_REFLECT
        # post-mortem called for): a window that would cross the nearest
        # voicing transition SLIDES — as a whole, no fold — until it sits
        # inside the frame's own voicing region. Dist-0 frames then read
        # contiguous, same-side, phase-coherent content (the fold's failure
        # was its time-reversed tail leaking into the high harmonics), and
        # BOTH analyses of the closed loop place their windows by the same
        # rule from their own vuv. The feature TIMELINE is unchanged — the
        # frame still reports at i·hop. ps_shift_snap quantizes the slide
        # to whole periods (window start pitch-event-aligned). Windows that
        # cannot fit (voicing run shorter than the span) stay centered.
        #
        # MEASURED (round 4) — REJECTED, kept as the second rigorous probe
        # of this estimator class (full record: BASELINE.md round-4 row).
        # The intended effect is real — voiced-side non-flip frames improve
        # at every boundary distance (777: dist-2 V 9.01→6.94, dist-4-5 V
        # 4.38→3.76) — but the shifted analysis writes interior-like
        # amplitudes into edge frames, flattening the edge amplitude RAMP
        # the rendered gate's sub-frame placement reads: rendered U→V edges
        # move ~1 frame outward, re-analysis voicing follows, vuv flips
        # rise ~50-90% at ~55 dB/frame and the mean regresses on ALL seeds
        # (4.28/4.45/4.18 → 5.18/5.47/5.07). gate_theta re-sweep, snap, and
        # nm-only variants each measured and falsified as rescues. Lesson:
        # near-edge readings decoupled from the frame-centered ramp break
        # either the gate's edge placement or the analyses' voicing
        # consistency — the dist-0 term is bounded by boundary-position
        # estimation consistency, not window placement.
        half = 0.5 * span[:, None]
        over_r = jnp.maximum(centers[:, None] + half - right, 0.0)
        over_l = jnp.maximum(left - (centers[:, None] - half), 0.0)
        if ap.ps_shift_snap:
            T0 = (fs / f0c)[:, None]
            over_r = jnp.ceil(over_r / T0) * T0
            over_l = jnp.ceil(over_l / T0) * T0
        delta = over_l - over_r
        new_c = centers[:, None] + delta
        fits = (new_c - half >= left) & (new_c + half <= right)
        delta = jnp.where(fits, delta, 0.0)
        idx = idx + delta
    elif ap.ps_reflect and nf > 1:
        idx = jnp.where(idx > right, 2.0 * right - idx, idx)
        idx = jnp.where(idx < left, 2.0 * left - idx, idx)
        # degenerate 1-frame regions can still escape after one fold
        idx = jnp.clip(idx, left, right)
    idx = jnp.clip(idx, 0.0, wav.shape[0] - 1.001)
    i0 = jnp.floor(idx).astype(jnp.int32)
    frac = (idx - i0).astype(wav.dtype)
    return wav[i0] * (1.0 - frac) + wav[i0 + 1] * frac  # (nf, N)


def _psync_peaks_valleys(
    wav, f0c, fs, hop, nf, K, vuv=None, ap: AnalysisParams = DEFAULT_ANALYSIS
):
    """Pitch-synchronous exact-bin (peak, valley), (nf, K) each, in the
    4·T0 path's conventions (peak: such that a² = peak·ENV_PK·f0/fs;
    valley: white noise of per-sample variance σ² reads σ²)."""
    PS_PERIODS = ap.ps_periods
    seg = _psync_frames(wav, f0c, fs, hop, nf, vuv=vuv, ap=ap)
    n = jnp.arange(PS_N, dtype=jnp.float32)
    win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / PS_N)  # periodic Hann
    wsum2 = jnp.sum(win * win)
    X = jnp.fft.rfft(seg * win, axis=-1)
    P = (X.real * X.real + X.imag * X.imag) / wsum2  # (nf, N/2+1)

    ks = jnp.arange(1, K + 1)
    pk_bins = PS_PERIODS * ks  # exact harmonic bins
    # linear-interp power roll-off |sinc(f/fs)|⁴ at the read frequency,
    # divided out so readings match the native-rate conventions
    fk = ks[None, :].astype(jnp.float32) * f0c[:, None]  # (nf, K) Hz

    def corr(fhz):
        x = jnp.pi * fhz / fs
        s = jnp.where(x > 1e-6, jnp.sin(x) / jnp.maximum(x, 1e-6), 1.0)
        return 1.0 / jnp.maximum(s * s * s * s, 1e-3)

    cap = PS_N // 2 - PS_PERIODS  # last fully-representable bin
    pk_bins_c = jnp.minimum(pk_bins, cap)
    acc = 0.0
    # usable inter-harmonic bins: outside BOTH neighbors' 3-bin periodic-
    # Hann kernels, i.e. 2 <= |o| <= PS_PERIODS - 2 (PERIODS=8 → ±2..±6,
    # the round-3 tuple; PERIODS=4 → ±2 only — the support-attribution
    # configuration, see the PSYNC comment)
    offs = tuple(range(-(PS_PERIODS - 2), -1)) + tuple(range(2, PS_PERIODS - 1))
    for o in offs:
        bins_o = jnp.clip(pk_bins_c + o, 1, PS_N // 2)
        fo = fk + o * f0c[:, None] / PS_PERIODS
        acc = acc + P[:, bins_o] * corr(jnp.abs(fo))
    vraw = acc / len(offs)  # noise bin-PSD in psync P units
    # → 4·T0 σ²-convention: upsampled noise concentrates its power in the
    # fs/rate_r fraction of the resampled band (rate_r = N·f0/PS_PERIODS),
    # so the in-band PSD reads σ²·rate_r/fs — divide it back out. Measured
    # κ = PS_NOISE_CAL ≈ 1.0 across f0 ∈ [90, 250] (0.993–1.028).
    rate_ratio = (PS_PERIODS * fs) / (PS_N * f0c[:, None])
    valley = vraw * rate_ratio * PS_NOISE_CAL

    # peak: a pure harmonic of amplitude a reads P_pk = a²·(Σw)²/(4·Σw²)
    # = a²·N/6 (periodic Hann); the bin also carries the local noise
    # floor, directly comparable to vraw in the SAME P units — subtract it
    # there, convert the harmonic part to the 4·T0 peak convention
    # (a² = peak·ENV_PK·f0/fs ⇒ peak = a²·fs/(ENV_PK·f0)), and re-add the
    # σ²-convention valley so downstream's max(peak − valley, 0) recovers
    # the harmonic term exactly (as it does for the 4·T0 spectrum, where
    # peak and valley share units natively).
    a2 = jnp.maximum(P[:, pk_bins_c] * corr(fk) - vraw, 0.0) * (6.0 / PS_N)
    peak = a2 * fs / (ENV_PK * f0c[:, None]) + valley
    return peak, valley


# valley convention factor: stationary white noise of per-sample variance
# σ² must read σ² (the 4·T0 path's Σw²-normalized convention). The lerp
# resampling both colors the noise (sinc⁴, divided out above) and scales
# its per-sample variance (position-dependent var(lerp) = 1−2f(1−f),
# frame-averaged); the residual constant is measured on pure-noise
# roundtrips across f0 ∈ [90, 280] (tests/test_cheaptrick.py gates the
# production path; value measured by scripts/psync_proto.py methodology).
PS_NOISE_CAL = 1.0


def _peaks_valleys(
    wav,
    f0,
    fs,
    hop,
    f0_floor,
    time_smooth=0,
    vuv=None,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
):
    """Shared 4·T0-window peak/valley measurement.

    Returns (peak, valley, k, f0c): per-harmonic power at k·f0 and the mean
    of the two adjacent inter-harmonic valleys, (nf, K) each, from one
    f0-adaptive windowed power spectrum normalized by Σw² (so stationary
    white noise of per-sample variance σ² reads ``valley ≈ σ²·fs/dftlen``
    per unit bin... i.e. the bin-PSD). The 4·T0 Hann window places exact
    nulls at (k ± ½)·f0, making the peaks PHASE-INSENSITIVE — adjacent
    mainlobes do not overlap — and the valleys clean noise estimates."""
    Lnm = int(math.ceil(4.0 * fs / f0_floor))
    fftnm = 1 << (Lnm - 1).bit_length()
    f0c = jnp.clip(f0, f0_floor, fs / 8.0)

    if ap.psync:
        from percivaltts_tpu.ops.stft import num_frames as _num_frames

        nf = _num_frames(wav.shape[0], Lnm, hop)
        K = int(fs / 2.0 / f0_floor)
        k = jnp.arange(1, K + 1, dtype=jnp.float32)
        peak, valley = _psync_peaks_valleys(
            wav, f0c, fs, hop, nf, K, vuv=vuv, ap=ap
        )
        if time_smooth:
            # smooth the per-harmonic tracks (f0-drift-proof), not the raw
            # spectrum — the psync grid realigns harmonics frame by frame
            from percivaltts_tpu.ops.cheaptrick import _time_smooth

            peak = _time_smooth(peak, time_smooth, vuv=vuv)
            valley = _time_smooth(valley, time_smooth, vuv=vuv)
        return peak, valley, k, f0c

    frames4 = frame_signal(wav, Lnm, hop)  # (nf, Lnm) centered at i·hop
    halfw = 2.0 * fs / f0c  # (nf,) half window = 2·T0
    t4 = jnp.arange(Lnm, dtype=jnp.float32) - (Lnm // 2)
    w4 = jnp.where(
        jnp.abs(t4)[None, :] <= halfw[:, None],
        0.5 + 0.5 * jnp.cos(jnp.pi * t4[None, :] / halfw[:, None]),
        0.0,
    )
    wsum2 = jnp.maximum(jnp.sum(w4 * w4, axis=-1), 1e-12)
    X4 = jnp.fft.rfft(frames4 * w4, n=fftnm, axis=-1)
    P4 = (X4.real * X4.real + X4.imag * X4.imag) / wsum2[:, None]
    if time_smooth:
        from percivaltts_tpu.ops.cheaptrick import _time_smooth

        P4 = _time_smooth(P4, time_smooth, vuv=vuv)

    K = int(fs / 2.0 / f0_floor)
    k = jnp.arange(1, K + 1, dtype=jnp.float32)
    f0bins = f0c * fftnm / fs  # (nf,)
    kpos = f0bins[:, None] * k[None, :]  # (nf, K)
    peak = lerp_cols(P4, kpos)
    # valley: ONLY the exact (k ± ½)·f0 nulls are clean — the harmonic's
    # mainlobe extends to ±0.5·f0 and the first sidelobe peaks near
    # ±0.62·f0, so averaging a segment around the null mixes in
    # phase-dependent harmonic leakage (measured +3 dB on the stationary
    # roundtrip, scripts/dyn_diag.py)
    valley = 0.5 * (
        lerp_cols(P4, kpos - 0.5 * f0bins[:, None])
        + lerp_cols(P4, kpos + 0.5 * f0bins[:, None])
    )
    if VALLEY_8T0:
        Lnm8 = int(math.ceil(8.0 * fs / f0_floor))
        fft8 = 1 << (Lnm8 - 1).bit_length()
        frames8 = frame_signal(wav, Lnm8, hop)
        halfw8 = 4.0 * fs / f0c
        t8 = jnp.arange(Lnm8, dtype=jnp.float32) - (Lnm8 // 2)
        w8 = jnp.where(
            jnp.abs(t8)[None, :] <= halfw8[:, None],
            0.5 + 0.5 * jnp.cos(jnp.pi * t8[None, :] / halfw8[:, None]),
            0.0,
        )
        ws8 = jnp.maximum(jnp.sum(w8 * w8, axis=-1), 1e-12)
        X8 = jnp.fft.rfft(frames8 * w8, n=fft8, axis=-1)
        P8 = (X8.real * X8.real + X8.imag * X8.imag) / ws8[:, None]
        if time_smooth:
            from percivaltts_tpu.ops.cheaptrick import _time_smooth

            P8 = _time_smooth(P8, time_smooth, vuv=vuv)
        f0bins8 = f0c * fft8 / fs
        kpos8 = f0bins8[:, None] * k[None, :]
        acc = 0.0
        offs = (0.375, 0.5, 0.625)
        for o in offs:
            acc = acc + lerp_cols(P8, kpos8 - o * f0bins8[:, None])
            acc = acc + lerp_cols(P8, kpos8 + o * f0bins8[:, None])
        valley = acc / (2.0 * len(offs))
    return peak, valley, k, f0c


def harmonic_noise_mask(
    wav: jax.Array,
    f0: jax.Array,
    fs: int,
    hop: int,
    num_bands: int,
    f0_floor: float,
    valley_smooth: int = 0,
    vuv: jax.Array | None = None,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> jax.Array:
    """Per-harmonic noise fraction mapped to warped bands, (frames, bands).

    0 = fully deterministic/harmonic band, 1 = fully noise. See module
    docstring for the estimator design. ``valley_smooth`` > 0 triangularly
    smooths the per-harmonic VALLEY track over ±radius frames (voicing-
    partitioned when ``vuv`` is given) before forming the ratio: the valley
    is a 2-draw noise estimate whose per-frame variance both adds ratio
    noise and carries a Jensen bias (the ratio is convex in the valley —
    see tests/test_vocoder_variants.py); noise levels move slowly, so
    smoothing in per-harmonic space (f0-drift-proof, unlike smoothing the
    raw spectrum) cuts both. The smoothing is per-HARMONIC, matching
    ops.aperiodicity.harmonic_envelope's valley_sm."""
    peak, valley, k, f0c = _peaks_valleys(
        wav, f0, fs, hop, f0_floor, vuv=vuv, ap=ap
    )
    if valley_smooth:
        from percivaltts_tpu.ops.cheaptrick import _time_smooth

        valley = _time_smooth(valley, valley_smooth, vuv=vuv)
    harmpow = jnp.maximum(peak - valley, 0.0)
    nm_k = valley / jnp.maximum(valley + NM_RHO * harmpow, 1e-20)
    # harmonics at/above Nyquist carry no deterministic content
    nm_k = jnp.where((k[None, :] + 0.5) * f0c[:, None] < fs / 2.0, nm_k, 1.0)

    centers = jnp.asarray(_band_centers_hz(num_bands, fs), jnp.float32)
    hpos = centers[None, :] / f0c[:, None] - 1.0  # harmonic-index space
    return jnp.clip(lerp_cols(nm_k, hpos), 0.0, 1.0)


# Peak-power → harmonic-amplitude² calibration of the 4·T0 Hann window for
# harmonic_envelope: analytically a²·(Σw)²/(4·Σw²) = a²·(2/3)·(4·fs/f0)/4,
# i.e. a² = peak·(3/2)·f0/fs; the measured constant absorbs the ~2–3%
# power-lerp loss at fractional-bin peaks (tests/test_cheaptrick.py).
ENV_PK = 1.5

# Valley-power → equivalent-amplitude² conversion: stationary noise of
# per-sample std σ must read the SAME convention as ops.cheaptrick
# (log(σ·√(f0·CAL·dftlen/fs))), so synthesis inverts one formula for both
# estimators. valley ≈ σ²·(bin PSD), so A_eq² = valley·f0·CAL·dftlen/fs.


def harmonic_envelope(
    wav: jax.Array,
    f0: jax.Array,
    fs: int,
    hop: int,
    dftlen: int,
    f0_floor: float,
    time_smooth: int = 0,
    vuv=None,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> jax.Array:
    """Phase-insensitive log-amplitude envelope from harmonic peaks/valleys,
    (frames, dftlen//2+1), in ops.cheaptrick's amplitude convention.

    CheapTrick's 3·T0 window overlaps adjacent harmonics' mainlobe skirts,
    so its smoothed envelope depends on the harmonics' relative PHASES —
    copy-synthesis re-renders with minimum phase, and the two analyses'
    interference patterns differ by 0.1–0.2 nats even on a stationary vowel
    (measured: scripts/dyn_diag.py). The 4·T0 window's peaks are clean, so
    the per-harmonic total content a_k² + noise_eq² roundtrips exactly:
    synthesis re-renders a_k at k·f0 and the re-analysis reads it back at a
    clean peak. Between harmonics the log-envelope is interpolated in
    harmonic-index space; below h1 and above the last sub-Nyquist harmonic
    the envelope holds (replacing the sub-f0 mirror + Nyquist-hold
    machinery of ops.cheaptrick for this estimator).
    """
    from percivaltts_tpu.ops.cheaptrick import CAL

    if ap.ps_shift and ap.ps_shift_nm_only:
        # envelope reading stays frame-centered (see AnalysisParams)
        import dataclasses

        ap = dataclasses.replace(ap, ps_shift=False)
    peak, valley, k, f0c = _peaks_valleys(
        wav, f0, fs, hop, f0_floor, time_smooth=time_smooth, vuv=vuv, ap=ap
    )
    # extra time smoothing on the VALLEYS only: the noise-level estimate is
    # 2 draws per harmonic and its variance spreads coherently over
    # neighboring bands (low-quefrency error, fully counted by MCD); noise
    # levels move slowly so ±3 frames is safe where harmonic peaks aren't
    from percivaltts_tpu.ops.cheaptrick import _time_smooth

    valley_sm = _time_smooth(valley, 3, vuv=vuv)
    a2 = jnp.maximum(peak - valley, 0.0) * ENV_PK * (f0c / fs)[:, None]
    n2 = valley_sm * (f0c * CAL * dftlen / fs)[:, None]
    A2 = jnp.maximum(a2 + n2, 1e-20)
    # harmonics at/above Nyquist: hold the last valid harmonic's level
    valid = (k[None, :] + 0.5) * f0c[:, None] < fs / 2.0
    logA_k = 0.5 * jnp.log(A2)
    # forward-fill invalid tail with the last valid value
    K = logA_k.shape[1]

    def ffill(carry, x):
        v, m = x
        out = jnp.where(m, v, carry)
        return out, out

    _, filled_T = jax.lax.scan(
        ffill, logA_k[:, 0], (logA_k.T, valid.T)
    )
    logA_k = filled_T.T

    bins = dftlen // 2 + 1
    freqs = jnp.arange(bins, dtype=jnp.float32) * fs / dftlen
    hpos = freqs[None, :] / f0c[:, None] - 1.0  # harmonic-index space
    return lerp_cols(logA_k, hpos)  # clamped: holds h1 below f0


# --- D4C-family group-delay band aperiodicity -------------------------------
#
# The algorithm FAMILY of WORLD's D4C (Morise 2016, "D4C, a band-
# aperiodicity estimator using the group delay of a periodic signal" /
# pyworld's d4c — the estimator the reference's VocoderWORLD uses:
# percivaltts/vocoders.py, file-level cite, mount empty): aperiodicity is
# read from the STATISTICS OF THE GROUP DELAY across a frequency band, not
# from peak/valley power ratios. For a clean harmonic signal under a
# symmetric window, spectral energy sits at the harmonics and the group
# delay τ(ω) = −dφ/dω at energy-bearing bins is the window's (constant)
# energy centroid; additive noise randomizes τ in proportion to its local
# power share, up to the pure-noise asymptote where τ is distributed with
# the window's own RMS time spread. The energy-weighted variance of τ
# within a band, normalized by that asymptote, is therefore a monotone
# [0,1] aperiodicity statistic — independent of the peak/valley reader, so
# the two estimator families cross-check each other.
#
# TPU-first implementation: the statistic is computed on the SAME
# pitch-synchronously resampled frames as the exact-bin reader
# (_psync_frames — harmonics on exact bins, one batched rfft pair), with
# τ(m) = Re(X_d(m)·conj(X(m)))/|X(m)|² where X_d is the rfft of the
# time-weighted frame ((n−N/2)·w(n)·x(n)) — the standard derivative-of-
# phase identity, no unwrapping, no data-dependent control flow. Band
# aggregation follows D4C's coarse-band design (ap.gd_band_hz-wide linear
# bands; the statistic needs many bins to converge, which is exactly why
# D4C reports coarse bands), then expands to the warped band axis by
# linear interpolation between coarse-band centers.

# Coarse-band width (Hz). D4C uses 3 kHz bands at fs=16k+ (boundaries
# 3/6/... kHz); 2 kHz here reads slightly finer structure at the same
# statistic quality on the oracle mixtures (>= 60 bins/band at PS_N=2048).
# (coarse-band width lives in AnalysisParams.gd_band_hz — a convention,
# so the config system records it and sweeps re-trace; 2000.0 default)

# Measured calibration of the statistic (CPU, synthetic mixtures via the
# tests/test_vocoder_variants.py harness; constants are physics-of-the-
# window measurements, module-level like NM_RHO/ENV_PK — not conventions):
#
# * GD_NOISE_VAR — the pure-noise asymptote of the ENERGY-WEIGHTED
#   group-delay variance, in units of T_w² (T_w² = Σw²(n−N/2)²/Σw²):
#   measured 0.481 (flat across all bands/f0; the power weighting
#   suppresses high-|τ| low-power bins, hence ≈1/2 rather than 1).
# * GD_FLOOR — the pure-HARMONIC reading: 0.026 (frame-resample jitter
#   plus the harmonics' residual mainlobe spread).
# * GD_MIX_EXP — the mixture law. With r' = (s²/T_w² − floor)/(V_n −
#   floor), the measured curve across f0 ∈ {100, 250} and noise
#   fractions 0.09–0.83 is r' ≈ 1 − (1−a)³ (per-point exponents
#   2.6–3.1 below a=0.5), so the inverse a = 1 − (1−r')^(1/3) recovers
#   the true fraction to |err| ≤ 0.02 for a ≤ 0.5 and ~0.1 in the
#   saturated 0.67–0.83 range — the same coarse-at-high-aperiodicity
#   behavior as D4C itself (the statistic compresses as the harmonic
#   reference drowns).
GD_NOISE_VAR = 0.481
GD_FLOOR = 0.026
GD_MIX_EXP = 3.0


def group_delay_aperiodicity(
    wav: jax.Array,
    f0: jax.Array,
    fs: int,
    hop: int,
    num_bands: int,
    f0_floor: float,
    vuv: jax.Array | None = None,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> jax.Array:
    """Band aperiodicity from the group-delay statistic, (frames, bands)
    in [0, 1] (0 = deterministic, 1 = noise) on the warped band axis —
    the D4C-family alternative to ``harmonic_noise_mask``'s peak/valley
    reader (AnalysisParams.bap_method = "d4c_gd")."""
    f0c = jnp.clip(jnp.asarray(f0, jnp.float32), f0_floor, fs / 2.0)
    nf = f0c.shape[0]
    seg = _psync_frames(wav, f0c, fs, hop, nf, vuv=vuv, ap=ap)
    n = jnp.arange(PS_N, dtype=jnp.float32)
    win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / PS_N)  # periodic Hann
    nc = n - PS_N / 2
    X = jnp.fft.rfft(seg * win, axis=-1)
    Xd = jnp.fft.rfft(seg * win * nc, axis=-1)
    P = X.real * X.real + X.imag * X.imag  # (nf, N/2+1)
    # group delay in resampled samples; normalized by the window's RMS
    # time spread so the pure-noise asymptote is O(1)
    tw2 = jnp.sum(win * win * nc * nc) / jnp.sum(win * win)
    tau = (Xd.real * X.real + Xd.imag * X.imag) / jnp.maximum(P, 1e-30)
    u = tau / jnp.sqrt(tw2)

    # per-frame frequency of each resampled bin, in original Hz
    bins = jnp.arange(PS_N // 2 + 1, dtype=jnp.float32)
    fbin = bins[None, :] * f0c[:, None] / ap.ps_periods  # (nf, nbins)
    # usable bins: above DC's mainlobe, below both the original Nyquist
    # and the last fully-representable resampled bin
    cap_hz = (PS_N // 2 - ap.ps_periods) * f0c / ap.ps_periods
    usable = (bins[None, :] >= 2.0) & (
        fbin < jnp.minimum(fs / 2.0, cap_hz[:, None])
    )

    band_hz = float(ap.gd_band_hz)
    n_coarse = max(int(math.ceil((fs / 2.0) / band_hz)), 1)
    edges = jnp.arange(n_coarse + 1, dtype=jnp.float32) * band_hz
    a_coarse = []
    for b in range(n_coarse):
        m = usable & (fbin >= edges[b]) & (fbin < edges[b + 1])
        w = jnp.where(m, P, 0.0)
        tot = jnp.maximum(jnp.sum(w, axis=1), 1e-30)
        mu = jnp.sum(w * u, axis=1) / tot
        s2 = jnp.sum(w * (u - mu[:, None]) ** 2, axis=1) / tot
        # bands with (numerically) no usable energy read 1.0 (pure noise)
        has = jnp.sum(m.astype(jnp.float32), axis=1) > 2.0
        # invert the measured mixture law (see the constants above)
        rp = jnp.clip((s2 - GD_FLOOR) / (GD_NOISE_VAR - GD_FLOOR), 0.0, 1.0)
        a_b = 1.0 - (1.0 - rp) ** (1.0 / GD_MIX_EXP)
        a_coarse.append(jnp.where(has, a_b, 1.0))
    a_coarse = jnp.stack(a_coarse, axis=1)  # (nf, n_coarse)

    # expand to the warped band axis: linear interpolation between coarse
    # band centers (D4C's own expansion when writing per-bin aperiodicity)
    centers_hz = jnp.asarray(_band_centers_hz(num_bands, fs), jnp.float32)
    ccenters = (edges[:-1] + edges[1:]) / 2.0
    pos = (centers_hz - ccenters[0]) / band_hz  # fractional coarse index
    return jnp.clip(lerp_cols(a_coarse, pos[None, :].repeat(nf, 0)), 0.0, 1.0)
