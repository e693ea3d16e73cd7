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
        # max(nf-k, 0): with radius >= nf the slice would go negative and
        # the concat length 2*nf-k != nf (trace-time crash on short inputs)
        lag = jnp.concatenate(
            [jnp.repeat(x[:1], k, axis=0), x[: max(nf - k, 0)]]
        )[:nf]
        out = jnp.maximum(out, jnp.maximum(lead, lag))
    return out


def fill_from_interior(
    x: jax.Array, interior: jax.Array, iters: int
) -> tuple[jax.Array, jax.Array]:
    """Nearest-interior fill along axis 0: propagate ``x``'s values outward
    from ``interior`` (bool mask, same leading shape as ``x``) one frame per
    iteration, earlier frame winning ties. Returns ``(filled, reached)``
    where ``reached`` marks frames within ``iters`` of an interior frame;
    frames beyond keep their original values."""
    filled, cm = x, interior
    for _ in range(iters):
        pv = jnp.concatenate([cm[:1], cm[:-1]])
        nv = jnp.concatenate([cm[1:], cm[-1:]])
        prev = jnp.concatenate([filled[:1], filled[:-1]])
        nxt = jnp.concatenate([filled[1:], filled[-1:]])
        filled = jnp.where(
            cm, filled, jnp.where(pv, prev, jnp.where(nv, nxt, filled))
        )
        cm = cm | pv | nv
    return filled, cm


def erode1d(x: jax.Array, radius: int) -> jax.Array:
    """Running min over ±``radius`` frames along axis 0, edge-replicated."""
    nf = x.shape[0]
    out = x
    for k in range(1, radius + 1):
        lead = jnp.concatenate([x[k:], jnp.repeat(x[-1:], k, axis=0)])[:nf]
        lag = jnp.concatenate(
            [jnp.repeat(x[:1], k, axis=0), x[: max(nf - k, 0)]]
        )[:nf]
        out = jnp.minimum(out, jnp.minimum(lead, lag))
    return out
