"""WORLD-style vocoder: f0 + vuv + spectral envelope + band aperiodicity.

Reference parity: percivaltts's ``VocoderWORLD`` (``percivaltts/vocoders.py``,
via pyworld in the reference; SURVEY.md §2 "Vocoder layer" — file-level cite,
mount empty). Feature schema: explicit voicing stream (unlike PML, where
voicing lives in the noise mask), warped log spectral envelope, and coarse
band aperiodicities.

Clean-room TPU-first analysis built from the same published algorithm
families pyworld implements:

* envelope — same selector as PML (``config.VocoderConfig.envelope``):
  default "harmonic" = phase-insensitive peak/valley harmonic envelope on
  voiced frames (``ops.aperiodicity.harmonic_envelope``) + 500 Hz
  CheapTrick on unvoiced, with PML's aperiodicity-gated noise-band time
  smoothing (measured 5.94 → 4.51 dB copy-synthesis mean, round-3
  session 7); "cheaptrick" = the f0-adaptive 3·T0 CheapTrick estimator
  (Morise 2015) everywhere;
* band aperiodicity — ``ops.aperiodicity``: per-harmonic noise fractions
  from peak/valley measurements on a 4·T0 window (the D4C role: one
  aperiodic-to-total power ratio per band), mapped to ``nm_size`` warped
  bands, edge-eroded;
* f0/vuv — the batched YIN estimator (``ops.f0``).

Synthesis shares the harmonic-plus-noise amplitude-convention core with PML
(minimum-phase harmonic bank + aperiodicity-shaped phase-only noise): the
WORLD ``bap`` stream has the same noise-fraction semantics as PML's ``nm``,
with the harmonic bank additionally gated by the explicit vuv stream.
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
    erode5,
    harmonic_envelope,
    harmonic_noise_mask,
)
from percivaltts_tpu.ops.cheaptrick import cheaptrick_envelope
from percivaltts_tpu.ops.f0 import estimate_f0
from percivaltts_tpu.ops.morph import dilate1d, erode1d
from percivaltts_tpu.ops.warp import warp_matrix
from percivaltts_tpu.vocoders.base import (
    Vocoder,
    chunked_synthesize_batch,
    dsp_scope,
    register,
    stacked_analyze_batch,
)
from percivaltts_tpu.vocoders.pml import FRAME_MULTIPLE, pml_synthesize_amp_core

# Minimum voiced/unvoiced run length (frames) the predicted-voicing
# cleanup enforces (clean_vuv): runs shorter than this merge into their
# longer neighbor. 3 frames = 15 ms, well under any real phone.
VUV_MIN_RUN = 3


def clean_vuv(v: np.ndarray) -> np.ndarray:
    """Temporal cleanup of a (possibly model-predicted) voicing stream,
    (T,) or (B, T) → binary {0,1} float32.

    WORLD's voicing is an explicit predicted stream hard-thresholded at
    0.5 (unlike PML, whose voicing derives from the noise-mask rule); a
    prediction dithering around the threshold therefore flips frame by
    frame, which measured 2–3× PML's end-to-end VUV error in the matched
    soaks (VERDICT round-3 weak #3 / item 3; the reference's VocoderWORLD
    has the same bare threshold — ``percivaltts/vocoders.py``, file-level
    cite, mount empty). Cleanup, gated to SOFT tracks only (any value
    strictly inside (0.05, 0.95) — i.e. model output; binary analysis
    tracks pass through bit-exact, so copy-synthesis and the closed loop
    are untouched by construction, pinned in tests/test_vocoder_variants):

    * median-3 smoothing kills frame-level dither around the threshold;
    * minimum-run pruning (VUV_MIN_RUN) merges surviving sub-15 ms voicing
      islands into the longer neighbor.

    Deliberately NOT hysteresis: a state machine with a dead band latches
    its initial state on an uncertain (all-in-band) prediction — an
    early-training model then reads all-unvoiced and the objective
    measures lose their F0 component (measured on the 1-epoch e2e run).
    Median + pruning keep the 0.5 threshold's calibration and cannot
    latch. An early-training model whose only voiced evidence is scattered
    sub-min-run islands cleans to all-unvoiced — deliberate: 1–2-frame
    voicing specks are not speech voicing, and the F0 measure over
    both-voiced frames is then simply absent until the model commits
    (the e2e tests train the WORLD arm past that point).
    """
    v = np.asarray(v, np.float32)
    if v.ndim == 2:
        return np.stack([clean_vuv(row) for row in v])
    n = v.shape[0]
    if n == 0:
        return v.copy()
    if not bool(np.any((v > 0.05) & (v < 0.95))):
        return v.copy()  # binary analysis track: exact no-op
    vp = np.pad(v, 1, mode="edge")
    v = np.median(np.stack([vp[:-2], vp[1:-1], vp[2:]]), axis=0)
    b = (v > 0.5).astype(np.float32)
    # min-run pruning over the run-length encoding (few runs; host-side)
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    lengths = np.diff(np.r_[starts, n])
    runs = list(zip(starts.tolist(), lengths.tolist()))
    changed = True
    while changed and len(runs) > 1:
        changed = False
        for i, (s, ln) in enumerate(runs):
            if ln >= VUV_MIN_RUN:
                continue
            # neighbor lengths (run at an utterance edge keeps its class
            # unless the single neighbor is longer)
            left = runs[i - 1][1] if i > 0 else -1
            right = runs[i + 1][1] if i + 1 < len(runs) else -1
            if max(left, right) > ln:
                b[s : s + ln] = 1.0 - b[s]
                starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
                lengths = np.diff(np.r_[starts, n])
                runs = list(zip(starts.tolist(), lengths.tolist()))
                changed = True
                break
    return b


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
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
def world_analyze_core(
    wav: jax.Array,
    fs: int,
    hop: int,
    dftlen: int,
    spec_size: int,
    nm_size: int,
    f0_min: float,
    f0_max: float,
    envelope: str = "cheaptrick",
    env_time_smooth: int = 1,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> jax.Array:
    """waveform → (frames, 1 + 1 + spec_size + nm_size): lf0, vuv, warped
    log-amplitude envelope, warped band aperiodicity.

    ``envelope`` selects the voiced-frame spec estimator exactly as in
    ``pml.pml_analyze_core``: "cheaptrick" = f0-adaptive 3·T0 CheapTrick;
    "harmonic" = phase-insensitive peak/valley harmonic envelope (PML's
    measured win — CheapTrick's interfering mainlobe skirts make its
    envelope phase-dependent, which copy-synthesis replaces with minimum
    phase). Unvoiced frames use the 500 Hz CheapTrick convention either
    way."""
    res = estimate_f0(wav, fs, hop, f0_min, f0_max)
    f0, vuv = res.f0, res.vuv

    # unvoiced frames use WORLD's 500 Hz analysis convention — short (~6 ms)
    # windows stop loud voiced neighbors leaking into quiet boundary frames
    # (same rationale and measurements as the PML analyzer, vocoders/pml.py)
    from percivaltts_tpu.ops.cheaptrick import DEFAULT_UNVOICED_F0

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
        env_v = harmonic_envelope(
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
    W_spec = jnp.asarray(warp_matrix(spec_size, dftlen, fs))
    spec_w = env @ W_spec

    nm_raw = harmonic_noise_mask(
        wav, f0, fs, hop, nm_size, min(f0_min, 60.0),
        valley_smooth=ap.nm_valley_smooth, vuv=vuv, ap=ap,
    )
    if ap.bap_method == "d4c_gd":
        # D4C-family group-delay statistic for the bap STREAM (the
        # reference's VocoderWORLD uses pyworld's D4C here); nm_raw keeps
        # feeding the noise-band spectral smoothing gate below, which is a
        # rendering detail, not part of the feature schema
        from percivaltts_tpu.ops.aperiodicity import group_delay_aperiodicity

        bap = erode5(
            group_delay_aperiodicity(
                wav, f0, fs, hop, nm_size, min(f0_min, 60.0), vuv=vuv, ap=ap
            )
        )
    elif ap.bap_method == "peak_valley":
        bap = erode5(nm_raw)
    else:
        raise ValueError(f"unknown AnalysisParams.bap_method: {ap.bap_method}")
    bap = jnp.where(vuv[:, None] > 0.5, bap, 1.0)

    # noise-band spectral smoothing, identical to the PML analyzer
    # (pml.pml_analyze_core): noise spectra carry irreducible per-frame
    # envelope-estimator variance; a per-band aperiodicity-gated time box
    # smooth cuts it. Gate from the RAW (pre-erode) aperiodicity
    # interpolated to the spec bands, 5-band box-smoothed, floored by the
    # per-frame scalar gate, then time-eroded — the same measured-better
    # construction as PML's (see that analyzer's inline rationale).
    from percivaltts_tpu.vocoders.pml import _smooth_noiselike

    ji = np.arange(spec_size) * (nm_size - 1) / max(spec_size - 1, 1)
    j0 = np.clip(ji.astype(np.int32), 0, nm_size - 2)
    M = np.zeros((nm_size, spec_size), np.float32)
    M[j0, np.arange(spec_size)] = 1.0 - (ji - j0)
    M[j0 + 1, np.arange(spec_size)] += ji - j0
    nm_spec = nm_raw @ jnp.asarray(M)
    pad = jnp.concatenate(
        [nm_spec[:, :1], nm_spec[:, :1], nm_spec, nm_spec[:, -1:], nm_spec[:, -1:]],
        axis=-1,
    )
    nm_band = sum(pad[:, i : i + spec_size] for i in range(5)) / 5.0
    gate = jnp.maximum(nm_band, nm_raw.mean(axis=-1, keepdims=True))
    spec_w = _smooth_noiselike(spec_w, erode5(gate))

    lf0 = jnp.log(jnp.maximum(f0, 1.0))
    return jnp.concatenate([lf0[:, None], vuv[:, None], spec_w, bap], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop",
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
def _world_analyze_vmapped(wavs, **kw):
    """vmap of the analysis core over a stacked (B, n) waveform batch."""
    return jax.vmap(lambda w: world_analyze_core(w, **kw))(wavs)


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
def world_closed_loop_core(
    lf0: jax.Array,
    vuv: jax.Array,
    spec_w: jax.Array,
    bap: jax.Array,
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
    seed: int = 0,
    iters: int = 1,
    ap: AnalysisParams = DEFAULT_ANALYSIS,
) -> jax.Array:
    """Closed-loop WORLD rendering: same operator-bias cancellation as
    ``pml.pml_closed_loop_core`` (render → re-analyze with
    ``world_analyze_core`` → subtract the spec-stream roundtrip error →
    render), with WORLD's explicit vuv stream supplying the voicing gates
    instead of the noise-mask rule."""
    from percivaltts_tpu.vocoders.pml import env_halfw_for

    # voicing gates the harmonic bank through the noise mask
    nm = jnp.where(vuv[:, None] > 0.5, bap, 1.0)
    syn_kw = dict(
        fs=fs,
        hop=hop,
        frame_len=frame_len,
        dftlen=dftlen,
        f0_min=f0_min,
        f0_max=f0_max,
        seed=seed,
        # the amplitude-sharpening inverse must match the analysis window:
        # CheapTrick's 3·T0 window → half-width 1.5·T0; the harmonic
        # estimator's 4·T0 → 2·T0 (pml.env_halfw_for)
        env_halfw=env_halfw_for(envelope),
        env_tri_radius=env_time_smooth,
        ap=ap,
    )
    ana_kw = dict(
        fs=fs,
        hop=hop,
        dftlen=dftlen,
        spec_size=spec_size,
        nm_size=nm_size,
        f0_min=f0_min,
        f0_max=f0_max,
        envelope=envelope,
        env_time_smooth=env_time_smooth,
        ap=ap,
    )
    v1 = (vuv > 0.5).astype(jnp.float32)
    flip = jnp.concatenate([jnp.zeros((1,)), jnp.abs(jnp.diff(v1))])
    near = dilate1d(flip, ap.cl_boundary_radius)
    alpha = (
        ap.cl_full_alpha - (ap.cl_full_alpha - ap.cl_near_alpha) * near
    )[:, None]
    clamp = (ap.cl_clamp - (ap.cl_clamp - ap.cl_near_clamp) * near)[:, None]

    spec_c = spec_w
    for it in range(iters):
        wav = pml_synthesize_amp_core(lf0, spec_c, nm, **syn_kw)
        feats2 = world_analyze_core(wav, **ana_kw)
        spec2 = feats2[:, 2 : 2 + spec_size]
        v2 = (feats2[:, 1] > 0.5).astype(jnp.float32)
        same = (v1 == v2).astype(jnp.float32)[:, None]
        if it == 0:
            a_it, c_it = alpha, clamp
        else:
            # iterations beyond the first: interior-only, tighter clamp
            # (same rationale as pml_closed_loop_core)
            far = erode1d(1.0 - near, ap.cl_boundary_radius)
            a_it, c_it = ap.cl_full_alpha * far[:, None], 0.8
        e = jnp.clip(spec2 - spec_w, -c_it, c_it) * a_it * same
        spec_c = spec_c - e
    return pml_synthesize_amp_core(lf0, spec_c, nm, **syn_kw)


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
def _world_closed_loop_vmapped(lf0s, vuvs, specs, baps, **kw):
    """vmap of the closed-loop core over stacked (B, frames, ·) features."""
    return jax.vmap(
        lambda a, v, b, c: world_closed_loop_core(a, v, b, c, **kw)
    )(lf0s, vuvs, specs, baps)


@register
class WorldVocoder(Vocoder):
    kind = "world"

    def _decide_vuv(self, feats: np.ndarray) -> np.ndarray:
        """Voicing decision for a feature array (..., F).

        Default (``vuv_rule="stream"``): threshold the explicit vuv
        stream + ``clean_vuv`` temporal cleanup — the reference's rule.

        ``vuv_rule="bap"``: on SOFT (model-predicted) tracks, voiced
        where the mean of the lowest ``vuv_bap_bands`` bap bands is
        below ``vuv_bap_threshold`` — the nm-derived rule mirroring
        PML's. Measured on the matched soak (scripts/vuv_error_diag.py,
        scripts/vuv_boundary_calib.py): the soft vuv stream's regression
        hedges through voicing releases, its 0.5 crossing lands ~4 frames
        early (onsets unbiased, offsets mean −3.9), and the error is 100%
        boundary-localized in 3–4-frame runs that survive clean_vuv; the
        predicted bap stream carries the release tail, and this rule
        reads test VUV 4.30% → 2.02% at near-zero bias (offset −0.64).
        Binary (analysis) tracks always use the explicit stream
        bit-exactly, so copy-synthesis and the closed loop are untouched
        by construction.
        """
        c = self.cfg
        v = np.asarray(feats[..., 1], np.float32)
        if c.vuv_rule == "bap":
            soft = (v > 0.05) & (v < 0.95)
            bap = feats[..., 2 + c.spec_size : 2 + c.spec_size + c.nm_size]
            vb = (
                np.mean(bap[..., : c.vuv_bap_bands], axis=-1)
                < c.vuv_bap_threshold
            ).astype(np.float32)
            if v.ndim == 1:
                if soft.any():
                    v = vb
            else:  # per-track gating across leading dims
                softrow = soft.any(axis=-1)
                v = np.where(softrow[..., None], vb, v)
        elif c.vuv_rule != "stream":
            raise ValueError(f"unknown VocoderConfig.vuv_rule: {c.vuv_rule!r}")
        return clean_vuv(v)

    def analyze(self, wav: np.ndarray) -> np.ndarray:
        wav = self._check_wav(wav)
        c = self.cfg
        hop = c.shift_samples
        nf = int(np.ceil(len(wav) / hop))
        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE
        wav_p = np.zeros(nf_pad * hop, dtype=np.float32)
        wav_p[: len(wav)] = np.asarray(wav, np.float32)
        with dsp_scope():
            feats = world_analyze_core(
                jnp.asarray(wav_p),
                fs=c.fs,
                hop=hop,
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

    def synthesize(self, feats: np.ndarray, seed: int = 0) -> np.ndarray:
        c = self.cfg
        feats = np.asarray(feats, np.float32)
        nf = feats.shape[0]
        if nf == 0:
            return np.zeros((0,), np.float32)
        lf0 = feats[:, 0]
        # the rendered gate must follow the SAME voicing decision f0_vuv
        # measures (no-op for analysis features; see _decide_vuv)
        vuv = self._decide_vuv(feats)
        spec = feats[:, 2 : 2 + c.spec_size]
        bap = feats[:, 2 + c.spec_size :]

        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE

        def pad(a, fill):
            # replicate the last real frame: the closed loop re-analyzes the
            # padded render, and a silence-cliff tail biases the analyzer's
            # time-smoothed readings of the last ~5 real frames (see
            # pml.VocoderPML._pad_feats)
            out = np.full((nf_pad,) + a.shape[1:], fill, np.float32)
            out[:nf] = a
            if nf:
                out[nf:] = a[-1]
            return out

        if c.closed_loop > 0:
            with dsp_scope():
                wav = world_closed_loop_core(
                    jnp.asarray(pad(lf0, np.log(100.0))),
                    jnp.asarray(pad(vuv, 0.0)),
                    jnp.asarray(pad(spec, -18.0)),
                    jnp.asarray(pad(bap, 1.0)),
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
            from percivaltts_tpu.vocoders.pml import env_halfw_for

            nm = bap.copy()
            nm[vuv < 0.5] = 1.0  # voicing gates the harmonic bank
            wav = pml_synthesize_amp_core(
                jnp.asarray(pad(lf0, np.log(100.0))),
                jnp.asarray(pad(spec, -18.0)),
                jnp.asarray(pad(nm, 1.0)),
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
        return np.asarray(wav[: nf * c.shift_samples])

    def analyze_batch(self, wavs) -> list:
        """One vmapped device call for the stacked chunk (see
        ``base.stacked_analyze_batch``)."""
        c = self.cfg

        def run(stack):
            with dsp_scope():
                return _world_analyze_vmapped(
                    jnp.asarray(stack),
                    fs=c.fs,
                    hop=c.shift_samples,
                    dftlen=c.dftlen,
                    spec_size=c.spec_size,
                    nm_size=c.nm_size,
                    f0_min=c.f0_min,
                    f0_max=c.f0_max,
                    envelope=c.envelope,
                    env_time_smooth=c.env_time_smooth,
                    ap=c.analysis,
                )

        return stacked_analyze_batch(
            [self._check_wav(w) for w in wavs], FRAME_MULTIPLE, c.shift_samples, run
        )

    def synthesize_batch(self, feats_list, seed: int = 0, chunk: int = 4) -> list:
        """One vmapped synthesis call per chunk of utterances (same contract
        as PML's synthesize_batch; shares its vmapped amp core)."""
        from percivaltts_tpu.vocoders.pml import _pml_synthesize_vmapped

        c = self.cfg

        def build(batch, nf_pad):
            lf0 = np.full((chunk, nf_pad), np.log(100.0), np.float32)
            vuv = np.zeros((chunk, nf_pad), np.float32)
            spec = np.full((chunk, nf_pad, c.spec_size), -18.0, np.float32)
            bap = np.ones((chunk, nf_pad, c.nm_size), np.float32)
            for j, f in enumerate(batch):
                n = f.shape[0]
                lf0[j, :n] = f[:, 0]
                vuv[j, :n] = self._decide_vuv(f)
                spec[j, :n] = f[:, 2 : 2 + c.spec_size]
                bap[j, :n] = f[:, 2 + c.spec_size :]
                if n:  # analysis-consistent tail (see synthesize's pad)
                    lf0[j, n:] = f[-1, 0]
                    vuv[j, n:] = vuv[j, n - 1]
                    spec[j, n:] = f[-1, 2 : 2 + c.spec_size]
                    bap[j, n:] = f[-1, 2 + c.spec_size :]
            # numpy out: run() device_puts inside dsp_scope so the tunneled
            # runtime doesn't ship features host→TPU→host first
            return (lf0, vuv, spec, bap)

        def run(args):
            if c.closed_loop > 0:
                with dsp_scope():
                    args = tuple(jnp.asarray(a) for a in args)
                    return _world_closed_loop_vmapped(
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
            from percivaltts_tpu.vocoders.pml import env_halfw_for

            lf0s, vuvs, specs, baps = (jnp.asarray(a) for a in args)
            nms = jnp.where(vuvs[..., None] > 0.5, baps, 1.0)
            return _pml_synthesize_vmapped(
                lf0s,
                specs,
                nms,
                amp=True,
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

    def export_preprocess(self, feats: np.ndarray) -> np.ndarray:
        """Serving-loader hook (see base class): write the decided voicing
        track into the vuv channel — ``_decide_vuv``'s soft-track rules +
        ``clean_vuv`` are host-side numpy, so they run before the traced
        artifact, exactly as ``synthesize``/``synthesize_batch`` do."""
        out = np.array(feats, np.float32, copy=True)
        out[..., 1] = self._decide_vuv(feats)
        return out

    def synthesize_stacked(self, fp, seed: int = 0):
        """Traced core behind ``synthesize_batch`` (see base class). The
        vuv channel must already hold the DECIDED voicing track
        (``export_preprocess``)."""
        from percivaltts_tpu.vocoders.pml import (
            _pml_synthesize_vmapped,
            env_halfw_for,
        )

        c = self.cfg
        lf0 = fp[:, :, 0]
        vuv = fp[:, :, 1]
        spec = fp[:, :, 2 : 2 + c.spec_size]
        bap = fp[:, :, 2 + c.spec_size :]
        if c.closed_loop > 0:
            return _world_closed_loop_vmapped(
                lf0, vuv, spec, bap,
                fs=c.fs, hop=c.shift_samples, frame_len=c.frame_samples,
                dftlen=c.dftlen, spec_size=c.spec_size, nm_size=c.nm_size,
                f0_min=c.f0_min, f0_max=c.f0_max, envelope=c.envelope,
                env_time_smooth=c.env_time_smooth, seed=seed,
                iters=c.closed_loop, ap=c.analysis,
            )
        nm = jnp.where(vuv[..., None] > 0.5, bap, 1.0)
        return _pml_synthesize_vmapped(
            lf0, spec, nm, amp=True,
            fs=c.fs, hop=c.shift_samples, frame_len=c.frame_samples,
            dftlen=c.dftlen, f0_min=c.f0_min, f0_max=c.f0_max, seed=seed,
            env_halfw=env_halfw_for(c.envelope),
            env_tri_radius=c.env_time_smooth, ap=c.analysis,
        )

    def f0_vuv(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """f0 from the lf0 stream; voicing per the configured decision
        rule (``VocoderConfig.vuv_rule`` — see ``_decide_vuv``; exact
        explicit-stream pass-through on binary analysis tracks)."""
        return np.exp(feats[..., 0]), self._decide_vuv(feats)
