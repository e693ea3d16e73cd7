"""Per-harmonic aperiodicity (noise-fraction) estimation, batched.

Reference parity: the aperiodicity analyses of percivaltts's vocoders — the
noise mask of the vendored pulsemodel (PML) and pyworld's D4C band
aperiodicity for ``VocoderWORLD`` (``percivaltts/vocoders.py``; SURVEY.md §2
— file-level cites, mount empty). Clean-room TPU-first estimator shared by
both vocoder front-ends:

A 4·T0 f0-adaptive Hann window places exact spectral nulls at the
inter-harmonic valleys (k ± ½)·f0, so the valley power is a clean estimate
of the noise level per harmonic interval while the peak at k·f0 carries
harmonic + noise. The per-harmonic noise fraction
``v / (v + NM_RHO·(p − v))`` is then interpolated at each output band's
center frequency in harmonic-index space — well-defined at every band
width, unlike band-aggregated autocorrelation (which is blind inside bands
narrower than f0). Everything is batched over frames with static shapes;
there is no per-frame Python loop.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from percivaltts_tpu.ops.stft import frame_signal
from percivaltts_tpu.ops.warp import _band_centers_hz

# ratio of the harmonic mainlobe's integrated power to its peak value for
# the 4·T0 Hann window, in units of the per-f0-interval noise integral
# (analytically 3/8 = the Hann equivalent noise bandwidth ratio; calibrated
# on synthetic harmonic+noise mixtures across f0 ∈ [100, 300] Hz and noise
# fractions 0.1–0.9 — see tests/test_cheaptrick.py)
NM_RHO = 0.375


from percivaltts_tpu.ops.cheaptrick import lerp_gather as lerp_cols  # one impl


def erode5(x: jax.Array) -> jax.Array:
    """Running minimum over ±2 frames along axis 0 (edge-replicated).

    The aperiodicity analysis window spans ±2·T0 (~±2–3 frames), so at a
    voicing edge it straddles the transition and misreads the spectral
    change as aperiodicity — measured as the low-band noise fraction
    spiking from ~0.02 to ~0.4 on the last two voiced frames of every run,
    which synthesis then renders as a loud low-frequency noise burst. A
    5-frame erosion removes the edge spike; the true value cannot change
    faster than the window anyway."""
    nf = x.shape[0]
    out = x
    for k in range(1, 3):
        lead = jnp.concatenate([x[k:], jnp.repeat(x[-1:], k, axis=0)])[:nf]
        lag = jnp.concatenate([jnp.repeat(x[:1], k, axis=0), x[: nf - k]])
        out = jnp.minimum(out, jnp.minimum(lead, lag))
    return out


def harmonic_noise_mask(
    wav: jax.Array,
    f0: jax.Array,
    fs: int,
    hop: int,
    num_bands: int,
    f0_floor: float,
) -> jax.Array:
    """Per-harmonic noise fraction mapped to warped bands, (frames, bands).

    0 = fully deterministic/harmonic band, 1 = fully noise. See module
    docstring for the estimator design."""
    Lnm = int(math.ceil(4.0 * fs / f0_floor))
    fftnm = 1 << (Lnm - 1).bit_length()
    f0c = jnp.clip(f0, f0_floor, fs / 8.0)

    frames4 = frame_signal(wav, Lnm, hop)  # (nf, Lnm) centered at i·hop
    halfw = 2.0 * fs / f0c  # (nf,) half window = 2·T0
    t4 = jnp.arange(Lnm, dtype=jnp.float32) - (Lnm // 2)
    w4 = jnp.where(
        jnp.abs(t4)[None, :] <= halfw[:, None],
        0.5 + 0.5 * jnp.cos(jnp.pi * t4[None, :] / halfw[:, None]),
        0.0,
    )
    wsum2 = jnp.maximum(jnp.sum(w4 * w4, axis=-1), 1e-12)
    X4 = jnp.fft.rfft(frames4 * w4, n=fftnm, axis=-1)
    P4 = (X4.real * X4.real + X4.imag * X4.imag) / wsum2[:, None]

    K = int(fs / 2.0 / f0_floor)
    k = jnp.arange(1, K + 1, dtype=jnp.float32)
    f0bins = f0c * fftnm / fs  # (nf,)
    kpos = f0bins[:, None] * k[None, :]  # (nf, K)
    peak = lerp_cols(P4, kpos)
    valley = 0.5 * (
        lerp_cols(P4, kpos - 0.5 * f0bins[:, None])
        + lerp_cols(P4, kpos + 0.5 * f0bins[:, None])
    )
    harmpow = jnp.maximum(peak - valley, 0.0)
    nm_k = valley / jnp.maximum(valley + NM_RHO * harmpow, 1e-20)
    # harmonics at/above Nyquist carry no deterministic content
    nm_k = jnp.where((k[None, :] + 0.5) * f0c[:, None] < fs / 2.0, nm_k, 1.0)

    centers = jnp.asarray(_band_centers_hz(num_bands, fs), jnp.float32)
    hpos = centers[None, :] / f0c[:, None] - 1.0  # harmonic-index space
    return jnp.clip(lerp_cols(nm_k, hpos), 0.0, 1.0)
