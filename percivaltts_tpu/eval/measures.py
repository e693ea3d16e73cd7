"""Objective measures: MCD, F0 RMSE, VUV error.

Reference parity: percivaltts's generation-stage objective measures
(``vocoders.py`` / ``run.py``; SURVEY.md §2 "Generation & eval", §6 — these
are also the parity gate vs the reference per BASELINE.json). All functions
are pure jnp transforms (jit-able, batchable) and accept numpy arrays too.

Definitions:
* MCD (dB) = (10/ln 10) · sqrt(2 · Σ_{d≥1} (c1_d − c2_d)²), mean over frames,
  on (mel-)cepstral coefficients, c0 (energy) excluded.
* F0 RMSE over frames voiced in BOTH tracks; Hz or cents
  (1200·log2(f1/f2)).
* VUV error %: fraction of frames whose voicing decisions disagree.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# plain float: per_frame_mcd_np must stay device-free (a jnp scalar here
# would cost one device readback per call and force backend init on import)
_MCD_K = 10.0 / math.log(10.0) * math.sqrt(2.0)


def log_spec_to_cepstra(logspec: jax.Array, order: Optional[int] = None) -> jax.Array:
    """Convert log-amplitude spectra (…, F) to cepstra via an orthonormal
    DCT-II over the (warped) frequency axis. With warped-frequency input this
    yields mel-cepstrum-like coefficients suitable for MCD.

    One (F, order) matmul per frame — MXU-shaped, fuses under jit.
    """
    F = logspec.shape[-1]
    # clamp: a DCT basis with order > F would alias low-order energy into
    # duplicated columns and silently inflate MCD for narrow-band configs
    order = F if order is None else min(order, F)
    n = jnp.arange(F, dtype=jnp.float32)
    k = jnp.arange(order, dtype=jnp.float32)
    basis = jnp.cos(jnp.pi * (n[:, None] + 0.5) * k[None, :] / F)  # (F, order)
    scale = jnp.where(k == 0, jnp.sqrt(1.0 / F), jnp.sqrt(2.0 / F))
    return jnp.matmul(logspec, basis * scale[None, :])


def per_frame_mcd_np(
    cep1: np.ndarray, cep2: np.ndarray, exclude_c0: bool = True
) -> np.ndarray:
    """Per-frame MCD in dB, pure numpy — for host-side per-utterance
    aggregation (eval loops, diagnostics) where one jnp dispatch per
    utterance would dominate. Same formula as ``mcd``."""
    d = np.asarray(cep1) - np.asarray(cep2)
    if exclude_c0:
        d = d[..., 1:]
    return _MCD_K * np.sqrt(np.sum(d * d, axis=-1))


def mcd(
    cep1: jax.Array,
    cep2: jax.Array,
    mask: Optional[jax.Array] = None,
    exclude_c0: bool = True,
) -> jax.Array:
    """Mel-cepstral distortion in dB, mean over (valid) frames.

    cep1/cep2: (..., T, D) cepstra; mask: (..., T) validity.
    """
    d = cep1 - cep2
    if exclude_c0:
        d = d[..., 1:]
    per_frame = _MCD_K * jnp.sqrt(jnp.sum(jnp.square(d), axis=-1))
    if mask is None:
        return jnp.mean(per_frame)
    return jnp.sum(per_frame * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _both_voiced(v1: jax.Array, v2: jax.Array, mask: Optional[jax.Array]):
    both = (v1 > 0.5) & (v2 > 0.5)
    if mask is not None:
        both = both & (mask > 0.5)
    return both.astype(jnp.float32)


def f0_rmse(
    f0_1: jax.Array,
    f0_2: jax.Array,
    vuv_1: jax.Array,
    vuv_2: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """F0 RMSE in Hz over frames voiced in both tracks."""
    w = _both_voiced(vuv_1, vuv_2, mask)
    se = jnp.square(f0_1 - f0_2) * w
    return jnp.sqrt(jnp.sum(se) / jnp.maximum(jnp.sum(w), 1.0))


def f0_rmse_cents(
    f0_1: jax.Array,
    f0_2: jax.Array,
    vuv_1: jax.Array,
    vuv_2: jax.Array,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """F0 RMSE in cents (1200·log2 ratio) over frames voiced in both."""
    w = _both_voiced(vuv_1, vuv_2, mask)
    cents = 1200.0 * jnp.log2(jnp.maximum(f0_1, eps) / jnp.maximum(f0_2, eps))
    se = jnp.square(cents) * w
    return jnp.sqrt(jnp.sum(se) / jnp.maximum(jnp.sum(w), 1.0))


def vuv_error(
    vuv_1: jax.Array,
    vuv_2: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Voiced/unvoiced decision disagreement, in percent."""
    diff = ((vuv_1 > 0.5) != (vuv_2 > 0.5)).astype(jnp.float32)
    if mask is None:
        return 100.0 * jnp.mean(diff)
    return 100.0 * jnp.sum(diff * mask) / jnp.maximum(jnp.sum(mask), 1.0)
