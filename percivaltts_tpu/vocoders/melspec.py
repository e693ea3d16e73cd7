"""Mel-spectrogram target variant (BASELINE config 4).

Reference parity: percivaltts supports swapping the acoustic target
representation; the mel-spectrogram variant is BASELINE.json config 4
("mel-spectrogram target variant with on-device vocoder feature
extraction"). Analysis is one batched STFT + mel matmul + log — fully
on-device; synthesis is Griffin-Lim phase reconstruction from the
pseudo-inverted mel filterbank (a ``lax.fori_loop`` of STFT/ISTFT pairs,
jit-compiled, static shapes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from percivaltts_tpu.ops.stft import hann_window, istft, stft
from percivaltts_tpu.ops.warp import mel_pinv, mel_weights
from percivaltts_tpu.vocoders.base import (
    Vocoder,
    chunked_synthesize_batch,
    register,
)
from percivaltts_tpu.vocoders.pml import FRAME_MULTIPLE


@functools.partial(
    jax.jit, static_argnames=("fs", "hop", "frame_len", "dftlen", "mel_size")
)
def mel_analyze_core(wav, fs, hop, frame_len, dftlen, mel_size):
    window = hann_window(frame_len)
    mag = jnp.abs(stft(wav, frame_len, hop, dftlen, window))
    W = jnp.asarray(mel_weights(mel_size, dftlen, fs))
    mel = mag @ W
    return jnp.log(jnp.maximum(mel, 1e-8))


@functools.partial(
    jax.jit,
    static_argnames=("fs", "hop", "frame_len", "dftlen", "mel_size", "iterations"),
)
def mel_synthesize_core(
    logmel, fs, hop, frame_len, dftlen, mel_size, iterations: int = 64, seed: int = 0
):
    """Fast Griffin–Lim (momentum 0.99) reconstruction from log-mel
    magnitudes, zero-phase init. Converges to ≈4 dB mel-MCD copy-synthesis
    at 5 ms hop — the GL floor; use a neural vocoder downstream when higher
    fidelity is needed. PML-style closed-loop pre-compensation does NOT
    transfer here (measured: α=1.0 WORSE 5.26→6.12, α=0.5 −0.06 dB):
    GL's roundtrip error is the projection onto the consistent-spectrogram
    manifold, not a repeatable linear bias, so shifting the target
    magnitude moves the projection with it."""
    nf = logmel.shape[0]
    n = nf * hop
    Winv = jnp.asarray(mel_pinv(mel_size, dftlen, fs))  # (mels, bins)
    mag = jnp.maximum(jnp.exp(logmel) @ Winv, 1e-8)  # (nf, bins)

    window = hann_window(frame_len)
    momentum = 0.99
    spec0 = mag.astype(jnp.complex64)

    def body(_, carry):
        spec, prev = carry
        x = istft(spec, frame_len, hop, n, window)
        re = stft(x, frame_len, hop, dftlen, window)[:nf]
        acc = re + momentum * (re - prev)
        ph = acc / jnp.maximum(jnp.abs(acc), 1e-12)
        return mag * ph, re

    spec, _ = jax.lax.fori_loop(0, iterations, body, (spec0, spec0))
    return istft(spec, frame_len, hop, n, window)


@functools.partial(
    jax.jit,
    static_argnames=("fs", "hop", "frame_len", "dftlen", "mel_size", "iterations"),
)
def _mel_synthesize_vmapped(logmels, **kw):
    """vmap of the Griffin-Lim core over stacked (B, frames, mels) input."""
    return jax.vmap(lambda m: mel_synthesize_core(m, **kw))(logmels)


@register
class MelSpecVocoder(Vocoder):
    kind = "melspec"

    def analyze(self, wav: np.ndarray) -> np.ndarray:
        wav = self._check_wav(wav)
        c = self.cfg
        hop = c.shift_samples
        nf = int(np.ceil(len(wav) / hop))
        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE
        wav_p = np.zeros(nf_pad * hop, dtype=np.float32)
        wav_p[: len(wav)] = np.asarray(wav, np.float32)
        mel = mel_analyze_core(
            jnp.asarray(wav_p),
            fs=c.fs,
            hop=hop,
            frame_len=c.frame_samples,
            dftlen=c.dftlen,
            mel_size=c.mel_size,
        )
        return np.asarray(mel[:nf])

    def synthesize(self, feats: np.ndarray, seed: int = 0) -> np.ndarray:
        c = self.cfg
        feats = np.asarray(feats, np.float32)
        nf = feats.shape[0]
        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE
        fp = np.full((nf_pad, feats.shape[1]), -18.0, np.float32)
        fp[:nf] = feats
        wav = mel_synthesize_core(
            jnp.asarray(fp),
            fs=c.fs,
            hop=c.shift_samples,
            frame_len=c.frame_samples,
            dftlen=c.dftlen,
            mel_size=c.mel_size,
        )
        return np.asarray(wav[: nf * c.shift_samples])

    # exported-artifact pad convention: mel pads with its log floor (the
    # Griffin-Lim reconstruction is global, so the test pins parity under
    # the same fill the host path uses), not last-frame replication
    pad_fill = -18.0

    def synthesize_stacked(self, fp, seed: int = 0):
        """Traced core behind ``synthesize_batch`` (see base class)."""
        c = self.cfg
        return _mel_synthesize_vmapped(
            fp, fs=c.fs, hop=c.shift_samples, frame_len=c.frame_samples,
            dftlen=c.dftlen, mel_size=c.mel_size,
        )

    def synthesize_batch(self, feats_list, seed: int = 0, chunk: int = 4) -> list:
        """One vmapped Griffin-Lim reconstruction per chunk of utterances
        (padded to the chunk's frame bound) — same batching contract as
        ``PMLVocoder.synthesize_batch``."""
        c = self.cfg

        def build(batch, nf_pad):
            fp = np.full((chunk, nf_pad, c.mel_size), -18.0, np.float32)
            for j, f in enumerate(batch):
                fp[j, : f.shape[0]] = f
            return (jnp.asarray(fp),)

        def run(args):
            return _mel_synthesize_vmapped(
                *args,
                fs=c.fs,
                hop=c.shift_samples,
                frame_len=c.frame_samples,
                dftlen=c.dftlen,
                mel_size=c.mel_size,
            )

        return chunked_synthesize_batch(
            feats_list, chunk, FRAME_MULTIPLE, c.shift_samples, build, run
        )

    def f0_vuv(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError(
            "mel-spectrogram features carry no explicit f0/vuv; use MCD on "
            "the mel cepstra for this vocoder"
        )
