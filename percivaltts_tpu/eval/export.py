"""Serving export: the trained generator as a self-contained StableHLO
artifact (`jax.export`), loadable without the model code.

The reference has no serving story (SURVEY.md §2: training framework only);
this is a TPU-native addition for production deployment: the exported
function takes RAW binarized label frames and returns DENORMALIZED vocoder
features — input normalization, the generator, and output denormalization
are folded into one compiled graph with the checkpoint's parameters baked
in as constants. Downstream synthesis (our vocoders, or any third-party
vocoder consuming the feature schema) needs only the artifact + manifest.

Artifacts are exported at each configured bucket bound (static shapes: the
recurrent generators scan over time, which jax.export's symbolic shapes
cannot relax without recompilation anyway); the loader pads an utterance to
the smallest admitting bound and trims the result — the same contract the
training pipeline uses (`data/dataset.py` bucketing).

Layout under <workdir>/export/:
    manifest.json              dims, bounds, vocoder schema, versions
    gen_t<bound>.stablehlo     one serialized jax.export artifact per bound
    syn_t<bound>.stablehlo     vocoder reconstruction (features→waveform,
                               the full default path incl. closed-loop) —
                               serving is model-code-free end-to-end to
                               audio (ExportedGenerator + ExportedSynthesizer)
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from percivaltts_tpu import __version__ as _pkg_version
from percivaltts_tpu.data.normalize import NormStats


def export_generator(
    apply_fn: Callable,
    params,
    in_stats: NormStats,
    out_stats: NormStats,
    label_dim: int,
    bounds: Sequence[int],
    batch: int = 1,
) -> Dict[int, bytes]:
    """Serialize label→features inference at each bucket bound.

    Returns {bound: serialized bytes}. The function signature of each
    artifact is ((batch, bound, label_dim) f32 raw labels, n_frames) →
    (batch, bound, feat_dim) f32 denormalized features, where ``n_frames``
    is a () int32 for batch=1 (the latency-serving artifact, and the
    round-3 on-disk format) or a (batch,) int32 row-length vector for
    batch>1 (the throughput-serving artifact). ``n_frames`` masks the pad
    tail to zero IN NORMALIZED SPACE inside the graph — the exact padding
    convention training batches use (`data/dataset.py` pads normalized
    features with zero rows); normalizing a zero-padded RAW input instead
    would put (0 − shift)·scale ≠ 0 in the tail, which the recurrent
    generators' backward scan reads (caught by tests/test_export.py)."""
    from jax import export as jexport

    i_shift = jnp.asarray(in_stats.shift, jnp.float32)
    i_scale = jnp.asarray(in_stats.scale, jnp.float32)
    o_shift = jnp.asarray(out_stats.shift, jnp.float32)
    o_scale = jnp.asarray(out_stats.scale, jnp.float32)

    def infer(lab, n_frames):
        nf = n_frames if n_frames.ndim else n_frames[None]  # (batch,)
        valid = jnp.arange(lab.shape[1])[None, :, None] < nf[:, None, None]
        lab_n = (lab - i_shift) * i_scale * valid
        cmp_n = apply_fn(params, lab_n)
        return cmp_n.astype(jnp.float32) / o_scale + o_shift

    out = {}
    for bound in bounds:
        spec = jax.ShapeDtypeStruct((batch, int(bound), label_dim), jnp.float32)
        nshape = () if batch == 1 else (batch,)
        nspec = jax.ShapeDtypeStruct(nshape, jnp.int32)
        out[int(bound)] = jexport.export(jax.jit(infer))(spec, nspec).serialize()
    return out


def export_synthesis(
    voc,
    bounds: Sequence[int],
    batch: int = 1,
    platforms: Sequence[str] = ("cpu", "tpu"),
    seed: int = 0,
) -> Dict[int, bytes]:
    """Serialize the vocoder reconstruction (features → waveform) at each
    bound, completing the model-code-free serving chain to audio
    (VERDICT round-4 item 5; the reference's generation stage synthesizes
    through its vendored pulsemodel/pyworld code [mount empty] — here the
    full DEFAULT synthesis path, closed-loop included when configured, is
    one StableHLO graph).

    Signature per artifact: ((batch, bound', feature_size) f32 RAW
    (denormalized) features, n_frames) → (batch, bound'·hop) f32 samples,
    where bound' is the bound rounded UP to the vocoder's frame multiple,
    ``n_frames`` is () int32 for batch=1 else (batch,) int32, the pad
    tail is re-padded IN-GRAPH with the vocoder's own convention
    (last-frame replication / constant fill — ``Vocoder.pad_fill``), and
    output samples beyond n_frames·hop are zeroed. WORLD inputs must be
    ``export_preprocess``-ed first (decided voicing in the vuv channel);
    ``ExportedSynthesizer`` handles that.

    Exported multi-platform (cpu+tpu) by default so the same artifact
    serves on either; on jax versions that cannot cross-lower, falls back
    to the current backend's platform."""
    from jax import export as jexport

    c = voc.cfg
    hop = c.shift_samples
    fm = voc.frame_multiple
    pad_fill = voc.pad_fill

    def synth(fp, n_frames):
        nf = n_frames if n_frames.ndim else n_frames[None]  # (batch,)
        T = fp.shape[1]
        if pad_fill is None:
            # analysis-consistent tail: replicate the last real frame
            idx = jnp.minimum(
                jnp.arange(T)[None, :], jnp.maximum(nf[:, None] - 1, 0)
            )
            fpp = jnp.take_along_axis(fp, idx[..., None], axis=1)
        else:
            valid = jnp.arange(T)[None, :, None] < nf[:, None, None]
            fpp = jnp.where(valid, fp, jnp.float32(pad_fill))
        wav = voc.synthesize_stacked(fpp, seed=seed)
        samp = jnp.arange(wav.shape[1])[None, :]
        return jnp.where(samp < nf[:, None] * hop, wav, 0.0)

    out: Dict[int, bytes] = {}
    for bound in bounds:
        b = -(-int(bound) // fm) * fm
        if b in out:
            continue
        spec = jax.ShapeDtypeStruct((batch, b, voc.feature_size), jnp.float32)
        nspec = jax.ShapeDtypeStruct(() if batch == 1 else (batch,), jnp.int32)
        try:
            exp = jexport.export(jax.jit(synth), platforms=tuple(platforms))(
                spec, nspec
            )
        except Exception:
            exp = jexport.export(jax.jit(synth))(spec, nspec)
        out[b] = exp.serialize()
    return out


def write_export(
    outdir: str,
    artifacts: Dict[int, bytes],
    label_dim: int,
    feat_dim: int,
    vocoder_dict: dict,
    batch: int = 1,
    syn_artifacts: Dict[int, bytes] = None,
    hop: int = None,
) -> str:
    os.makedirs(outdir, exist_ok=True)
    for bound, data in artifacts.items():
        with open(os.path.join(outdir, f"gen_t{bound}.stablehlo"), "wb") as f:
            f.write(data)
    manifest = {
        "format": "jax.export/stablehlo",
        "package_version": _pkg_version,
        "jax_version": jax.__version__,
        "label_dim": label_dim,
        "feat_dim": feat_dim,
        "bounds": sorted(artifacts),
        "batch": batch,
        "vocoder": vocoder_dict,
    }
    if syn_artifacts:
        for bound, data in syn_artifacts.items():
            with open(os.path.join(outdir, f"syn_t{bound}.stablehlo"), "wb") as f:
                f.write(data)
        manifest["synthesis"] = {
            "bounds": sorted(syn_artifacts),
            "hop": hop,
            "batch": batch,
        }
    mpath = os.path.join(outdir, "manifest.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    return mpath


class ExportedGenerator:
    """Load an export dir and run label→feature inference, model-code-free.

    Pads each utterance to the smallest admitting bound and trims the
    output, mirroring the training bucketing contract. Raises ValueError
    for utterances longer than the largest exported bound (the producer
    chose the bounds; silently truncating would corrupt synthesis).

    Note for recurrent generators (BLSTM/BGRU tiers): the backward scan
    crosses the zero-pad tail, so outputs depend on the pad length. The
    artifact's contract is bucket-bound padding — the same padding the
    model saw in training batches (`data/dataset.py`) — which differs from
    `models.base.predict_utterance`'s own-length 64-multiple padding by a
    (train-consistent) tail; tests pin exact equality under matched
    padding (`tests/test_export.py`)."""

    def __init__(self, directory: str):
        with open(os.path.join(directory, "manifest.json")) as f:
            self.manifest = json.load(f)
        from jax import export as jexport

        self._fns = {}
        for bound in self.manifest["bounds"]:
            path = os.path.join(directory, f"gen_t{bound}.stablehlo")
            with open(path, "rb") as f:
                self._fns[bound] = jexport.deserialize(f.read())

    @property
    def bounds(self):
        return sorted(self._fns)

    @property
    def batch(self) -> int:
        """Rows per artifact call (1 = round-3 latency format)."""
        return int(self.manifest.get("batch", 1))

    def _bound_for(self, T: int) -> int:
        fit = [b for b in self.bounds if b >= T]
        if not fit:
            raise ValueError(
                f"utterance has {T} frames; largest exported bound is "
                f"{self.bounds[-1]} — re-export with a larger bucket bound"
            )
        return fit[0]

    def _call_rows(self, bound: int, padded: np.ndarray, lens) -> np.ndarray:
        if self.batch == 1:
            n = jnp.int32(int(lens[0]))
        else:
            n = jnp.asarray(np.asarray(lens, np.int32))
        return np.asarray(self._fns[bound].call(jnp.asarray(padded), n))

    def __call__(self, lab: np.ndarray) -> np.ndarray:
        """(T, label_dim) raw label frames → (T, feat_dim) features."""
        T = lab.shape[0]
        bound = self._bound_for(T)
        padded = np.zeros((self.batch, bound, lab.shape[1]), np.float32)
        padded[0, :T] = lab
        lens = np.zeros((self.batch,), np.int32)
        lens[0] = T
        return self._call_rows(bound, padded, lens)[0, :T]

    def predict_batch(self, labs) -> list:
        """Raw label matrices → feature matrices, grouped by bucket bound
        and packed ``batch`` rows per artifact call (surplus rows in the
        last group are zero-length padding). Output order matches input."""
        order = sorted(range(len(labs)), key=lambda i: self._bound_for(labs[i].shape[0]))
        out: list = [None] * len(labs)
        i = 0
        while i < len(order):
            bound = self._bound_for(labs[order[i]].shape[0])
            group = [
                j
                for j in order[i : i + self.batch]
                if self._bound_for(labs[j].shape[0]) == bound
            ]
            padded = np.zeros(
                (self.batch, bound, labs[group[0]].shape[1]), np.float32
            )
            lens = np.zeros((self.batch,), np.int32)
            for r, j in enumerate(group):
                padded[r, : labs[j].shape[0]] = labs[j]
                lens[r] = labs[j].shape[0]
            res = self._call_rows(bound, padded, lens)
            for r, j in enumerate(group):
                out[j] = res[r, : labs[j].shape[0]]
            i += len(group)
        return out


class ExportedSynthesizer:
    """Load an export dir's synthesis artifacts and run features→waveform
    reconstruction, completing the model-code-free serving chain.

    The traced DSP graph (closed-loop synthesis included, when the
    producing config used it) lives entirely in the artifact; the only
    vocoder code this loader touches is the host-side
    ``export_preprocess`` hook (WORLD's numpy voicing decision),
    reconstructed from the manifest's recorded vocoder config — no
    checkpoint, model, or analysis code is needed."""

    def __init__(self, directory: str):
        with open(os.path.join(directory, "manifest.json")) as f:
            self.manifest = json.load(f)
        syn = self.manifest.get("synthesis")
        if not syn:
            raise ValueError(
                f"{directory}: manifest has no synthesis artifacts — "
                "re-export without --no-synth"
            )
        self.hop = int(syn["hop"])
        self.batch = int(syn.get("batch", 1))
        from jax import export as jexport

        self._fns = {}
        for bound in syn["bounds"]:
            with open(os.path.join(directory, f"syn_t{bound}.stablehlo"), "rb") as f:
                self._fns[int(bound)] = jexport.deserialize(f.read())
        # host-side preprocessing per the recorded vocoder config
        from percivaltts_tpu.config import Configuration
        from percivaltts_tpu.vocoders import get_vocoder

        cfg = Configuration.from_dict({"vocoder": self.manifest["vocoder"]})
        self._voc = get_vocoder(cfg.vocoder)

    @property
    def bounds(self):
        return sorted(self._fns)

    def __call__(self, feats: np.ndarray) -> np.ndarray:
        """(T, feature_size) raw (denormalized) features → (T·hop,) f32
        samples."""
        T = feats.shape[0]
        if T == 0:
            return np.zeros((0,), np.float32)
        fit = [b for b in self.bounds if b >= T]
        if not fit:
            raise ValueError(
                f"utterance has {T} frames; largest exported synthesis "
                f"bound is {self.bounds[-1]} — re-export with a larger "
                "bucket bound"
            )
        bound = fit[0]
        fp = np.zeros((self.batch, bound, feats.shape[1]), np.float32)
        fp[0, :T] = self._voc.export_preprocess(np.asarray(feats, np.float32))
        lens = np.zeros((self.batch,), np.int32)
        lens[0] = T
        n = jnp.int32(T) if self.batch == 1 else jnp.asarray(lens)
        wav = np.asarray(self._fns[bound].call(jnp.asarray(fp), n))
        return wav[0, : T * self.hop]
