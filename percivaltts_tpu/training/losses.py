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
    frame_weights: jax.Array | None = None,
) -> jax.Array:
    """Mean squared error over valid frames. mask: (B, T); pred/target
    (B, T, D). ``dim_weights`` (D,) weights feature dimensions (per-stream
    loss balancing, reference parity — see TrainConfig.stream_weights).
    ``frame_weights`` (B, T) weights frames (expected to average 1 over
    valid frames so the loss scale is preserved — see
    ``transition_weights`` / TrainConfig.boundary_weight)."""
    m = mask[..., None]
    se = jnp.square((pred - target).astype(jnp.float32) * m)
    if dim_weights is not None:
        se = se * dim_weights
    if frame_weights is not None:
        se = se * frame_weights[..., None]
    denom = jnp.maximum(mask.sum(), 1.0) * pred.shape[-1]
    return se.sum() / denom


def transition_weights(
    target: jax.Array, mask: jax.Array, gain: float, radius: int
) -> jax.Array:
    """Per-frame loss weights (B, T) that upweight TARGET transitions.

    Motivation (round-5 prediction-path budget, BASELINE.md): after the
    f0-information and capacity terms, the largest remaining model error
    band is near voicing/phone boundaries (d0–3 frames: model 8.95 dB vs
    oracle floor 4.80). The weight is the target's local spectral flux
    ``‖x_t − x_{t−1}‖²`` — vocoder-agnostic (works on normalized features,
    no per-vocoder voicing decode in the jit) — max-pooled over ±radius so
    whole transition neighborhoods are covered, normalized to mean 1 over
    valid frames so the loss scale (and the LSE/adversarial mixing ratio)
    is unchanged. ``w = (1 + gain·flux_norm) / (1 + gain)``: gain 0 → all
    ones; large gain → weight proportional to flux. The reference has no
    such weighting (plain masked MSE, percivaltts/optimizertts.py [mount
    empty]) — this is framework-native quality tooling behind a
    default-off knob."""
    x = target.astype(jnp.float32)
    m2 = mask * jnp.pad(mask[:, :-1], ((0, 0), (1, 0)))  # both frames valid
    flux = jnp.square(x[:, 1:] - x[:, :-1]).sum(-1)
    flux = jnp.pad(flux, ((0, 0), (1, 0))) * m2
    if radius > 0:
        flux = jax.lax.reduce_window(
            flux,
            init_value=0.0,  # flux ≥ 0, so 0 is the max-identity here
            computation=jax.lax.max,
            window_dimensions=(1, 2 * radius + 1),
            window_strides=(1, 1),
            padding=((0, 0), (radius, radius)),
        )
        flux = flux * mask
    mean = flux.sum() / jnp.maximum(mask.sum(), 1.0)
    w = (1.0 + gain * flux / jnp.maximum(mean, 1e-12)) / (1.0 + gain)
    return jnp.where(mask > 0, w, 0.0)


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


