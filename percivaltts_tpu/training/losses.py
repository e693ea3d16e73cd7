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


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean squared error over valid frames. mask: (B, T); pred/target (B, T, D)."""
    m = mask[..., None]
    se = jnp.square((pred - target) * m)
    denom = jnp.maximum(mask.sum(), 1.0) * pred.shape[-1]
    return se.sum() / denom


def masked_rmse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sqrt(masked_mse(pred, target, mask))


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of per-frame values (B, T) over valid frames."""
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)
