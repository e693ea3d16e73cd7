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


def global_variance(cep: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-dimension global variance of cepstra over frames, (D,).

    The classic SPSS over-smoothing diagnostic (Toda & Tokuda 2007): an LSE
    regression to the conditional mean under-disperses, so predicted
    features' per-dimension variance falls below natural speech's.
    Percival's whole thesis (reference ``optimizertts_wgan.py`` — the
    adversarial objective restores the variance the regression loss
    removes) is measured by the RATIO of predicted to natural GV — see
    ``global_variance_ratio``.

    cep: (T, D) or (B, T, D); mask: matching (T,)/(B, T) frame validity.
    With a batch, frames pool across the batch (corpus-level GV).
    """
    cep = jnp.asarray(cep)
    flat = cep.reshape(-1, cep.shape[-1])
    if mask is None:
        w = jnp.ones(flat.shape[0], jnp.float32)
    else:
        w = jnp.asarray(mask).reshape(-1).astype(jnp.float32)
    tot = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(flat * w[:, None], axis=0) / tot
    return jnp.sum(jnp.square(flat - mean[None, :]) * w[:, None], axis=0) / tot


def global_variance_ratio(
    cep_pred: jax.Array,
    cep_ref: jax.Array,
    mask_pred: Optional[jax.Array] = None,
    mask_ref: Optional[jax.Array] = None,
    exclude_c0: bool = True,
    eps: float = 1e-12,
) -> jax.Array:
    """Scalar over-smoothing measure: geometric-mean over dimensions of
    GV(pred)/GV(ref). 1.0 = the prediction carries natural spectral
    dispersion; < 1 = over-smoothed (the LSE failure mode the WGAN critic
    exists to fix); c0 (energy) excluded by default like MCD."""
    gv_p = global_variance(cep_pred, mask_pred)
    gv_r = global_variance(cep_ref, mask_ref)
    if exclude_c0:
        gv_p, gv_r = gv_p[1:], gv_r[1:]
    logr = jnp.log(jnp.maximum(gv_p, eps)) - jnp.log(jnp.maximum(gv_r, eps))
    return jnp.exp(jnp.mean(logr))


def modulation_spectrum(
    feats: jax.Array,
    mask: Optional[jax.Array] = None,
    seg: int = 128,
) -> jax.Array:
    """Modulation spectrum: mean power spectrum over TIME of each feature
    trajectory, (seg//2+1, D).

    The standard complement to GV in the SPSS over-smoothing literature
    (Takamichi et al. 2016's MS-constrained training targets exactly the
    statistic an LSE regression flattens): GV catches variance collapse
    per dimension; the MS localizes WHERE on the temporal-frequency axis
    the dispersion was lost — temporal over-smoothing attenuates the high
    modulation bands specifically. The reference's WGAN objective exists
    to restore this dispersion (``optimizertts_wgan.py``, SURVEY.md §2 —
    file-level cite, mount empty), so the measure belongs next to
    ``global_variance_ratio`` in the study tables.

    feats: (T, D) or (B, T, D); mask: (T,)/(B, T). Trajectories are
    mean-removed per utterance (valid frames only), Hann-windowed sliding
    segments of ``seg`` frames (hop seg/2) are rFFT'd over time, and
    segment power spectra average with per-segment validity weights (a
    segment that is mostly padding contributes proportionally little).
    """
    feats = jnp.asarray(feats, jnp.float32)
    if feats.ndim == 2:
        feats = feats[None]
        mask = None if mask is None else jnp.asarray(mask)[None]
    B, T, D = feats.shape
    w = (
        jnp.ones((B, T), jnp.float32)
        if mask is None
        else jnp.asarray(mask, jnp.float32)
    )
    tot = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mu = jnp.sum(feats * w[..., None], axis=1, keepdims=True) / tot[..., None]
    xc = (feats - mu) * w[..., None]  # invalid frames read 0 after centering

    hop = seg // 2
    nseg = max((max(T, seg) - seg) // hop + 1, 1)
    pad = (nseg - 1) * hop + seg - T
    if pad > 0:
        xc = jnp.pad(xc, ((0, 0), (0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    idx = jnp.arange(seg)[None, :] + hop * jnp.arange(nseg)[:, None]
    segs = xc[:, idx, :]  # (B, nseg, seg, D)
    win = jnp.hanning(seg).astype(jnp.float32)
    P = jnp.square(
        jnp.abs(jnp.fft.rfft(segs * win[None, None, :, None], axis=2))
    )  # (B, nseg, seg//2+1, D)
    wseg = jnp.mean(w[:, idx], axis=2)  # (B, nseg) validity fraction
    den = jnp.maximum(jnp.sum(wseg), 1e-6)
    return jnp.sum(P * wseg[..., None, None], axis=(0, 1)) / den


def modulation_spectrum_ratio(
    feats_pred: jax.Array,
    feats_ref: jax.Array,
    mask_pred: Optional[jax.Array] = None,
    mask_ref: Optional[jax.Array] = None,
    frame_rate: float = 200.0,
    bands: tuple = ((1.0, 4.0), (4.0, 10.0), (10.0, 25.0), (25.0, 50.0)),
    seg: int = 128,
    exclude_c0: bool = True,
    eps: float = 1e-12,
) -> jax.Array:
    """Per-modulation-band over-smoothing measure: geometric-mean over
    (bins in band, dims) of MS(pred)/MS(ref), one ratio per band —
    1.0 = natural temporal dispersion in that band, < 1 = temporally
    over-smoothed there (the LSE failure mode; high bands fall first).

    frame_rate: feature frames per second (200 for the 5 ms shift).
    Returns (len(bands),). c0 (energy) excluded by default like MCD/GV.
    """
    if exclude_c0:
        feats_pred = jnp.asarray(feats_pred)[..., 1:]
        feats_ref = jnp.asarray(feats_ref)[..., 1:]
    ms_p = modulation_spectrum(feats_pred, mask_pred, seg=seg)
    ms_r = modulation_spectrum(feats_ref, mask_ref, seg=seg)
    freqs = jnp.fft.rfftfreq(seg, d=1.0 / frame_rate)
    logr = jnp.log(jnp.maximum(ms_p, eps)) - jnp.log(jnp.maximum(ms_r, eps))
    out = []
    for lo, hi in bands:
        sel = ((freqs >= lo) & (freqs < hi)).astype(jnp.float32)[:, None]
        out.append(
            jnp.exp(jnp.sum(logr * sel) / jnp.maximum(jnp.sum(sel) * logr.shape[1], 1.0))
        )
    return jnp.stack(out)
