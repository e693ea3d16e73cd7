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


def write_export(
    outdir: str,
    artifacts: Dict[int, bytes],
    label_dim: int,
    feat_dim: int,
    vocoder_dict: dict,
    batch: int = 1,
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
