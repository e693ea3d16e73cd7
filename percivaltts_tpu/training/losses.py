"""Masked sequence losses.

Reference parity: the masked MSE/RMSE helpers used by percivaltts's trainers
over padded batches (``percivaltts/data.py`` cost helpers +
``optimizertts.py``; SURVEY.md §2). Masks are mandatory here — every loss and
metric in the framework is mask-weighted so padding can never leak into
gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mse(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array,
    dim_weights: jax.Array | None = None,
) -> jax.Array:
    """Mean squared error over valid frames. mask: (B, T); pred/target
    (B, T, D). ``dim_weights`` (D,) weights feature dimensions (per-stream
    loss balancing, reference parity — see TrainConfig.stream_weights)."""
    m = mask[..., None]
    se = jnp.square((pred - target).astype(jnp.float32) * m)
    if dim_weights is not None:
        se = se * dim_weights
    denom = jnp.maximum(mask.sum(), 1.0) * pred.shape[-1]
    return se.sum() / denom


def stream_weight_vector(streams, stream_weights, feat_dim: int) -> jax.Array | None:
    """Expand {stream name → weight} into a (feat_dim,) per-dimension weight
    vector using the vocoder's stream slices; None when empty/uniform."""
    if not stream_weights:
        return None
    import numpy as np

    w = np.ones((feat_dim,), np.float32)
    for name, weight in dict(stream_weights).items():
        a, b = streams[name]
        w[a:b] = weight
    return jnp.asarray(w)


def masked_rmse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sqrt(masked_mse(pred, target, mask))


