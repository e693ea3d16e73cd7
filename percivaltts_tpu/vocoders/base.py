"""Vocoder protocol + registry.

Reference parity: the ``Vocoder`` abstract base of ``percivaltts/vocoders.py``
(SURVEY.md §2 "Vocoder layer"): per-vocoder feature sizes, analysis of a
waveform into per-frame features, synthesis of features back to a waveform,
and helpers the objective measures need (f0/vuv extraction, cepstra for MCD).

Analysis/synthesis cores are pure jitted JAX transforms (batched over
frames); the class layer only handles numpy conversion and stream slicing.
"""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Tuple, Type

import numpy as np

from percivaltts_tpu.config import VocoderConfig

# Sentinel: dsp_scope not yet resolved (None would mean "default placement")
_DSP_DEVICE_UNSET = object()
_dsp_device = _DSP_DEVICE_UNSET


def dsp_scope():
    """Device scope for the heavy vocoder DSP jits (analysis and
    closed-loop synthesis).

    The tunneled TPU runtime used in this environment (PJRT plugin
    "axon") crashes its worker process on the large fused analysis graphs
    — measured on the vmapped analyze and closed-loop-synthesis jits,
    non-deterministically across shapes, while every sub-op (YIN,
    CheapTrick, harmonic envelope/mask) runs fine in isolation. Training,
    generator predicts, and the open-loop render are unaffected. Under
    that runtime vocoder DSP routes to the in-process host CPU backend
    (same jits, same numerics); real (non-tunneled) TPU runtimes keep DSP
    on-device. Override with PERCIVAL_DSP_DEVICE=cpu|default."""
    global _dsp_device
    if _dsp_device is _DSP_DEVICE_UNSET:
        import jax

        mode = os.environ.get("PERCIVAL_DSP_DEVICE", "auto")
        if mode == "cpu":
            _dsp_device = jax.devices("cpu")[0]
        elif mode == "default":
            _dsp_device = None
        else:  # auto
            d = jax.devices()[0]
            ver = getattr(d.client, "platform_version", "") or ""
            _dsp_device = jax.devices("cpu")[0] if "axon" in ver else None
    if _dsp_device is None:
        return contextlib.nullcontext()
    import jax

    return jax.default_device(_dsp_device)


class Vocoder:
    """Base vocoder: maps waveforms ↔ per-frame feature matrices."""

    kind: str = "base"

    def __init__(self, cfg: VocoderConfig):
        if cfg.kind != self.kind:
            cfg = VocoderConfig(**{**cfg.__dict__, "kind": self.kind})
        self.cfg = cfg

    # -- schema ---------------------------------------------------------- #

    @property
    def feature_size(self) -> int:
        return self.cfg.feature_size

    @property
    def streams(self) -> Dict[str, Tuple[int, int]]:
        return self.cfg.streams

    def stream(self, feats: np.ndarray, name: str) -> np.ndarray:
        a, b = self.streams[name]
        return feats[..., a:b]

    # -- core ------------------------------------------------------------ #

    @staticmethod
    def _check_wav(wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if wav.ndim != 1 or wav.size == 0:
            raise ValueError(
                f"expected a non-empty 1-D waveform, got shape {wav.shape}"
            )
        return wav

    def analyze(self, wav: np.ndarray) -> np.ndarray:
        """waveform (n,) float32 in [-1, 1] → (frames, feature_size)."""
        raise NotImplementedError

    def analyze_batch(self, wavs) -> list:
        """Analyze several waveforms; subclasses may override with a single
        batched (vmapped) device call — one dispatch for the whole chunk
        instead of one per utterance (compose-stage hot path on TPU)."""
        return [self.analyze(w) for w in wavs]

    def synthesize(self, feats: np.ndarray, seed: int = 0) -> np.ndarray:
        """(frames, feature_size) → waveform (frames · shift_samples,).

        ``seed`` keys the stochastic (noise) component of vocoders that have
        one; deterministic vocoders ignore it."""
        raise NotImplementedError

    def synthesize_batch(self, feats_list, seed: int = 0) -> list:
        """Synthesize several utterances; subclasses may override with a
        single batched (vmapped) device call per chunk — one dispatch and
        one compile variant instead of one per distinct utterance length
        (generation-stage hot path on TPU)."""
        return [self.synthesize(f, seed=seed) for f in feats_list]

    # -- serving export hooks (eval/export.export_synthesis) -------------- #

    # pad convention for the in-graph tail of an exported synthesis
    # artifact: None = replicate the last real frame (the analysis-
    # consistent tail PML/WORLD use — see pml._pad_feats); a float =
    # constant fill (mel's floor)
    pad_fill = None

    @property
    def frame_multiple(self) -> int:
        """Static-shape granularity of the traced synthesis cores."""
        from percivaltts_tpu.vocoders.pml import FRAME_MULTIPLE

        return FRAME_MULTIPLE

    def export_preprocess(self, feats: np.ndarray) -> np.ndarray:
        """Host-side feature preparation a serving loader applies before
        calling an exported synthesis artifact. Default identity; WORLD
        overrides it to write its decided voicing track into the vuv
        channel (the soft-track decision/cleanup rule is host-side
        numpy, not part of the traced graph)."""
        return feats

    def synthesize_stacked(self, fp, seed: int = 0):
        """Traced batch synthesis: (B, nf_pad, feature_size) feature stack
        (``nf_pad`` a multiple of ``frame_multiple``, tail padded per
        ``pad_fill``) → (B, nf_pad·shift_samples) waveforms. The
        jax-traceable core behind ``synthesize_batch``, exposed so
        ``eval/export.export_synthesis`` can serialize features→waveform
        as a StableHLO serving artifact."""
        raise NotImplementedError

    # -- measure hooks ---------------------------------------------------- #

    def f0_vuv(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Extract (f0_hz, vuv) tracks for F0-RMSE / VUV-error measures."""
        raise NotImplementedError

    def f0_vuv_pred(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """``f0_vuv`` for MODEL-PREDICTED feature tracks. Defaults to the
        analysis rule; vocoders may override it with a prediction-side
        calibration (``VocoderConfig.vuv_pred_*`` for PML — the predicted
        nm stream's distribution differs from analysis tracks', so the
        analysis threshold misplaces voicing boundaries; WORLD handles the
        analogous gap inside ``f0_vuv`` via its soft-track ``vuv_rule``).
        Generation/measures call this on the predicted side only — the
        reference side always uses the analysis rule."""
        return self.f0_vuv(feats)

    def cepstra(self, feats: np.ndarray, order: int = 25) -> np.ndarray:
        """Extract MCD-ready cepstra from the spectral stream. ``order``
        defaults to the standard mel-cepstral order (c0..c24) so MCD numbers
        are comparable to the literature; pass ``order=None`` for the full
        band resolution."""
        from percivaltts_tpu.eval.measures import log_spec_to_cepstra

        key = "spec" if "spec" in self.streams else "mel"
        return np.asarray(log_spec_to_cepstra(self.stream(feats, key), order))


def chunked_synthesize_batch(feats_list, chunk, frame_multiple, hop, build, run):
    """Shared pad/chunk/crop loop behind every vocoder's ``synthesize_batch``.

    Splits ``feats_list`` into chunks of ``chunk`` utterances (the last chunk
    padded by repeating its final item so the jitted core sees one static
    batch shape), pads each chunk to its frame bound (a multiple of
    ``frame_multiple``), runs one batched device call, and crops each
    waveform back to its true length. ``build(batch, nf_pad)`` stacks a
    chunk's features into the core's argument tuple; ``run(args)`` returns
    the (chunk, nf_pad·hop) waveforms.
    """
    feats_list = [np.asarray(f, np.float32) for f in feats_list]
    out: list = []
    for c0 in range(0, len(feats_list), chunk):
        batch = list(feats_list[c0 : c0 + chunk])
        nfs = [f.shape[0] for f in batch]
        real = len(batch)
        while len(batch) < chunk:
            batch.append(batch[-1])
            nfs.append(nfs[-1])
        nf_pad = -(-max(nfs) // frame_multiple) * frame_multiple
        wavs = np.asarray(run(build(batch, nf_pad)))
        out.extend(wavs[j, : nfs[j] * hop] for j in range(real))
    return out


def stacked_analyze_batch(wavs, frame_multiple, hop, run):
    """Shared stack/pad/crop loop behind every vocoder's ``analyze_batch``:
    zero-pad all waveforms to the batch's frame bound, run one vmapped
    device call (``run(stack) -> (B, nf_pad, F)`` features), crop host-side.
    Compile variants stay bounded by ``frame_multiple`` exactly like the
    single-utterance paths."""
    if not wavs:
        return []
    nfs = [int(np.ceil(len(w) / hop)) for w in wavs]
    nf_pad = -(-max(nfs) // frame_multiple) * frame_multiple
    stack = np.zeros((len(wavs), nf_pad * hop), np.float32)
    for i, w in enumerate(wavs):
        stack[i, : len(w)] = np.asarray(w, np.float32)
    feats = np.asarray(run(stack))
    return [feats[i, :n] for i, n in enumerate(nfs)]


_REGISTRY: Dict[str, Type[Vocoder]] = {}


def register(cls: Type[Vocoder]) -> Type[Vocoder]:
    _REGISTRY[cls.kind] = cls
    return cls


def get_vocoder(cfg: VocoderConfig) -> Vocoder:
    """Factory by ``cfg.kind`` (reference: the vocoder choice in run.py)."""
    try:
        cls = _REGISTRY[cfg.kind]
    except KeyError:
        raise ValueError(
            f"unknown vocoder kind {cfg.kind!r}; known: {sorted(_REGISTRY)}"
        ) from None
    return cls(cfg)
