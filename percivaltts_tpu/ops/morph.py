"""1-D morphology over the frame axis (axis 0), edge-replicated.

Shared by the vocoder synthesis and closed-loop gates (``vocoders/pml.py``,
``vocoders/world.py``), which repeatedly need "within r frames of a marker"
(dilate) and "at least r frames inside a region" (erode) masks. One
implementation instead of per-site shift-concat loops — reach-budget
off-by-ones only need fixing once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dilate1d(x: jax.Array, radius: int) -> jax.Array:
    """Running max over ±``radius`` frames along axis 0, edge-replicated.

    Accepts (nf,) or (nf, k) float arrays (bools: convert first). radius 0
    returns ``x`` unchanged.
    """
    nf = x.shape[0]
    out = x
    for k in range(1, radius + 1):
        lead = jnp.concatenate([x[k:], jnp.repeat(x[-1:], k, axis=0)])[:nf]
        lag = jnp.concatenate([jnp.repeat(x[:1], k, axis=0), x[: nf - k]])
        out = jnp.maximum(out, jnp.maximum(lead, lag))
    return out


def erode1d(x: jax.Array, radius: int) -> jax.Array:
    """Running min over ±``radius`` frames along axis 0, edge-replicated."""
    nf = x.shape[0]
    out = x
    for k in range(1, radius + 1):
        lead = jnp.concatenate([x[k:], jnp.repeat(x[-1:], k, axis=0)])[:nf]
        lag = jnp.concatenate([jnp.repeat(x[:1], k, axis=0), x[: nf - k]])
        out = jnp.minimum(out, jnp.minimum(lead, lag))
    return out
