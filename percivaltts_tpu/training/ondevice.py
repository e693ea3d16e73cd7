"""On-device input normalization.

North-star parity (BASELINE.json): "the HTS full-context-label →
frame-feature data path (label encoding, mean/std normalization, batched
padded sequences) becomes a jit-able on-device preprocessing stage". Label
*encoding* is string processing and stays host-side (strings cannot live on
device), but normalization + masking move inside the jit region: raw
feature batches ship to the device and the affine ``(x − shift)·scale``
fuses into the first matmul of the step — zero extra HBM traffic, and the
host stops touching every float.

Masked (padded) frames are re-zeroed after normalization so a nonzero
``shift`` can never leak padding into the losses.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from percivaltts_tpu.data.normalize import NormStats


def _norm_batch(batch: Dict[str, jax.Array], in_aff, out_aff) -> Dict[str, jax.Array]:
    (si, ci), (so, co) = in_aff, out_aff
    mask = batch["mask"]
    m = mask[..., None]
    out = dict(batch)
    out["lab"] = (batch["lab"] - si) * ci * m
    out["cmp"] = (batch["cmp"] - so) * co * m
    return out


def make_normalizing_step(
    step_fn: Callable,
    in_stats: NormStats,
    out_stats: NormStats,
) -> Callable:
    """Wrap a train step ``(state, *batches) → (state, metrics)`` so every
    batch dict argument is normalized on device inside the same jit region.

    Works for both the LSE step (one batch) and the WGAN step (stacked
    critic batches + generator batch) — normalization broadcasts over any
    leading axes.
    """
    in_aff = (jnp.asarray(in_stats.shift), jnp.asarray(in_stats.scale))
    out_aff = (jnp.asarray(out_stats.shift), jnp.asarray(out_stats.scale))

    def wrapped(state, *batches):
        normed = tuple(_norm_batch(b, in_aff, out_aff) for b in batches)
        return step_fn(state, *normed)

    return wrapped
