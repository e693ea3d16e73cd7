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

from percivaltts_tpu.ops.aperiodicity import (
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
        )
        env = jnp.where(vuv[:, None] > 0.5, env_v, env)
    W_spec = jnp.asarray(warp_matrix(spec_size, dftlen, fs))
    spec_w = env @ W_spec

    nm_raw = harmonic_noise_mask(wav, f0, fs, hop, nm_size, min(f0_min, 60.0))
    bap = erode5(nm_raw)
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
) -> jax.Array:
    """Closed-loop WORLD rendering: same operator-bias cancellation as
    ``pml.pml_closed_loop_core`` (render → re-analyze with
    ``world_analyze_core`` → subtract the spec-stream roundtrip error →
    render), with WORLD's explicit vuv stream supplying the voicing gates
    instead of the noise-mask rule."""
    from percivaltts_tpu.vocoders.pml import (
        CL_BOUNDARY_RADIUS,
        CL_CLAMP,
        CL_FULL_ALPHA,
        CL_NEAR_ALPHA,
        CL_NEAR_CLAMP,
        env_halfw_for,
    )

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
    )
    v1 = (vuv > 0.5).astype(jnp.float32)
    flip = jnp.concatenate([jnp.zeros((1,)), jnp.abs(jnp.diff(v1))])
    near = dilate1d(flip, CL_BOUNDARY_RADIUS)
    alpha = (CL_FULL_ALPHA - (CL_FULL_ALPHA - CL_NEAR_ALPHA) * near)[:, None]
    clamp = (CL_CLAMP - (CL_CLAMP - CL_NEAR_CLAMP) * near)[:, None]

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
            far = erode1d(1.0 - near, CL_BOUNDARY_RADIUS)
            a_it, c_it = CL_FULL_ALPHA * far[:, None], 0.8
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
            )
        return np.asarray(feats[:nf])

    def synthesize(self, feats: np.ndarray, seed: int = 0) -> np.ndarray:
        c = self.cfg
        feats = np.asarray(feats, np.float32)
        nf = feats.shape[0]
        if nf == 0:
            return np.zeros((0,), np.float32)
        lf0 = feats[:, 0]
        vuv = feats[:, 1]
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
                vuv[j, :n] = f[:, 1]
                spec[j, :n] = f[:, 2 : 2 + c.spec_size]
                bap[j, :n] = f[:, 2 + c.spec_size :]
                if n:  # analysis-consistent tail (see synthesize's pad)
                    lf0[j, n:] = f[-1, 0]
                    vuv[j, n:] = f[-1, 1]
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
            )

        return chunked_synthesize_batch(
            feats_list, chunk, FRAME_MULTIPLE, c.shift_samples, build, run
        )

    def f0_vuv(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return np.exp(feats[..., 0]), (feats[..., 1] > 0.5).astype(np.float32)
