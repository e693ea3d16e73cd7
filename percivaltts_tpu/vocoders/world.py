"""WORLD-style vocoder: f0 + vuv + spectral envelope + band aperiodicity.

Reference parity: percivaltts's ``VocoderWORLD`` (``percivaltts/vocoders.py``,
via pyworld in the reference; SURVEY.md §2 "Vocoder layer"). Feature schema:
explicit voicing stream (unlike PML, where voicing lives in the noise mask),
warped log spectral envelope, and coarse band aperiodicities.

Clean-room rebuild sharing the PML analysis core (SURVEY.md forbids porting;
pyworld is CHEAPTRICK/D4C — here the same YIN + true-envelope + band
harmonicity machinery provides the equivalent information): ``bap`` is the
warped noise mask at ``nm_size`` bands, ``vuv`` the YIN voicing decision,
``f0`` the continuous log-f0. Synthesis is harmonic-plus-noise with the
harmonic bank additionally gated by vuv.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from percivaltts_tpu.vocoders.base import Vocoder, register
from percivaltts_tpu.vocoders.pml import (
    FRAME_MULTIPLE,
    pml_analyze_core,
    pml_synthesize_core,
)


@register
class WorldVocoder(Vocoder):
    kind = "world"

    def analyze(self, wav: np.ndarray) -> np.ndarray:
        wav = self._check_wav(wav)
        c = self.cfg
        hop = c.shift_samples
        nf = int(np.ceil(len(wav) / hop))
        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE
        wav_p = np.zeros(nf_pad * hop, dtype=np.float32)
        wav_p[: len(wav)] = np.asarray(wav, np.float32)
        feats, vuv = pml_analyze_core(
            jnp.asarray(wav_p),
            fs=c.fs,
            hop=hop,
            frame_len=c.frame_samples,
            dftlen=c.dftlen,
            spec_size=c.spec_size,
            nm_size=c.nm_size,
            f0_min=c.f0_min,
            f0_max=c.f0_max,
        )
        feats = np.asarray(feats[:nf])
        vuv = np.asarray(vuv[:nf])
        lf0 = feats[:, :1]
        spec = feats[:, 1 : 1 + c.spec_size]
        bap = feats[:, 1 + c.spec_size :]
        return np.concatenate([lf0, vuv[:, None], spec, bap], axis=-1)

    def synthesize(self, feats: np.ndarray, seed: int = 0) -> np.ndarray:
        c = self.cfg
        feats = np.asarray(feats, np.float32)
        nf = feats.shape[0]
        lf0 = feats[:, 0]
        vuv = feats[:, 1]
        spec = feats[:, 2 : 2 + c.spec_size]
        bap = feats[:, 2 + c.spec_size :].copy()
        # voicing gates the harmonic bank through the noise mask
        bap[vuv < 0.5] = 1.0

        nf_pad = -(-nf // FRAME_MULTIPLE) * FRAME_MULTIPLE
        def pad(a, fill):
            out = np.full((nf_pad,) + a.shape[1:], fill, np.float32)
            out[:nf] = a
            return out

        wav = pml_synthesize_core(
            jnp.asarray(pad(lf0, np.log(100.0))),
            jnp.asarray(pad(spec, -18.0)),
            jnp.asarray(pad(bap, 1.0)),
            fs=c.fs,
            hop=c.shift_samples,
            frame_len=c.frame_samples,
            dftlen=c.dftlen,
            f0_min=c.f0_min,
            f0_max=c.f0_max,
            seed=seed,
        )
        return np.asarray(wav[: nf * c.shift_samples])

    def f0_vuv(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return np.exp(feats[..., 0]), (feats[..., 1] > 0.5).astype(np.float32)
