"""Spectral amplitude envelope estimation (cepstral / true-envelope).

Reference parity: the per-frame spectral amplitude envelope of percivaltts's
vendored pulsemodel analysis (SURVEY.md §2 "PML vocoder") — there a Python
frame loop; here the whole utterance's spectrogram is enveloped in one
batched transform: real-cepstrum smoothing with a per-frame, f0-adaptive
lifter cutoff, plus optional true-envelope iterations (Röbel & Rodet 2005:
iteratively replace the smoothed envelope with max(log|X|, env) and
re-smooth) as a ``lax.fori_loop`` — static shapes, all FFTs batched.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("fs", "dftlen", "iterations"))
def spectral_envelope(
    log_mag: jax.Array,
    f0: jax.Array,
    fs: int,
    dftlen: int,
    iterations: int = 3,
) -> jax.Array:
    """Smooth log-amplitude envelopes of ``log_mag`` (frames, dftlen//2+1).

    Returns ``(env_smooth, env_te)``: the plain cepstrally-smoothed envelope
    and the true-envelope refinement (Röbel & Rodet). TE rides spectral
    *maxima* — exact for harmonic combs; on noise spectra it sits 2–4 dB
    above the mean magnitude. PML analysis nevertheless uses env_te on ALL
    frames: per-frame selection by voicing was tried and measured worse on
    copy-synthesis MCD, because the estimator flips wherever the voicing
    decision differs between two analyses of near-identical audio (see the
    measurement note in ``vocoders/pml.py``). A consistent estimator beats a
    per-frame-optimal one for parity metrics.

    The lifter keeps quefrencies below the per-frame pitch period (cutoff
    ``fs / (1.3 · f0)`` samples, the classic choice that removes the
    harmonic comb while keeping formant structure).
    """
    nf, bins = log_mag.shape
    assert bins == dftlen // 2 + 1

    cutoff = fs / (1.3 * jnp.maximum(f0, 1.0))  # (frames,) in samples
    q = jnp.arange(dftlen, dtype=jnp.float32)
    # symmetric lifter mask over the full cepstrum (quefrency and its mirror)
    qq = jnp.minimum(q, dftlen - q)
    lifter = (qq[None, :] <= cutoff[:, None]).astype(log_mag.dtype)

    def smooth(lm):
        # real cepstrum: irfft of the half log spectrum implies the
        # symmetric full spectrum of a real signal
        cep = jnp.fft.irfft(lm + 0j, n=dftlen, axis=-1)
        cep = cep * lifter
        env = jnp.fft.rfft(cep, n=dftlen, axis=-1).real[:, :bins]
        return env

    env = smooth(log_mag)

    def body(_, e):
        target = jnp.maximum(log_mag, e)
        return smooth(target)

    env_te = jax.lax.fori_loop(0, iterations, body, env)
    return env, env_te
