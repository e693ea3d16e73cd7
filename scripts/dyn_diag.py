"""Attribute the steady-state voiced copy-synthesis error to signal dynamics.

Synthesizes controlled 1 s fully-voiced signals — stationary / f0-vibrato /
amplitude-modulated / formant-moving — and prints the per-band-group
roundtrip |log-env err| for each, isolating which dynamic the
analyze→synthesize→analyze loop fails to track.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/dyn_diag.py
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.vocoders import get_vocoder

import os as _os
CFG = VocoderConfig(kind="pml", fs=16000, spec_size=65, nm_size=33, envelope=_os.environ.get("ENV_MODE", "cheaptrick"))
FS = CFG.fs


def make(kind, f0_base=160.0, dur=1.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(dur * FS)
    t = np.arange(n) / FS
    f0 = np.full(n, f0_base)
    if kind in ("vibrato", "all"):
        f0 = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 3.0 * t))
    if kind in ("declination", "all"):
        f0 = f0 * (1.0 - 0.15 * t / dur)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    formants = np.array([730.0, 1090.0, 2440.0])
    x = np.zeros(n)
    K = int(FS / 2 / f0.max()) - 1
    for k in range(1, K + 1):
        fk = k * f0  # (n,) instantaneous harmonic freq
        if kind in ("formant", "all"):
            fmts = formants[None, :] * (1.0 + 0.12 * np.sin(2 * np.pi * 1.7 * t))[:, None]
        else:
            fmts = np.broadcast_to(formants, (n, 3))
        env = -6.0 - fk / 3000.0 + (
            3.5 * np.exp(-0.5 * ((fk[:, None] - fmts) / 160.0) ** 2)
        ).sum(-1)
        a = np.exp(env)
        if kind in ("ampmod", "all"):
            a = a * (1.0 + 0.4 * np.sin(2 * np.pi * 2.3 * t))
        x += a * np.cos(k * phase)
    x += 0.003 * rng.normal(size=n)
    return (x / np.abs(x).max() * 0.6).astype(np.float32)


def main():
    voc = get_vocoder(CFG)
    for kind in ("stationary", "vibrato", "declination", "ampmod", "formant", "all"):
        x = make(kind)
        f1 = voc.analyze(x)
        y = voc.synthesize(f1)
        f2 = voc.analyze(y)
        nf = min(len(f1), len(f2))
        core = slice(8, nf - 8)
        sp1 = voc.stream(f1[:nf], "spec")[core]
        sp2 = voc.stream(f2[:nf], "spec")[core]
        be = np.abs(sp1 - sp2)
        gs = np.array_split(np.arange(be.shape[1]), 8)
        from percivaltts_tpu.eval.measures import per_frame_mcd_np

        pf = per_frame_mcd_np(voc.cepstra(f1[:nf])[core], voc.cepstra(f2[:nf])[core])
        print(
            f"{kind:>12}: mcd mean {pf.mean():5.2f} med {np.median(pf):5.2f} | "
            + " ".join(f"g{i}:{be[:, g].mean():.3f}" for i, g in enumerate(gs))
        )


if __name__ == "__main__":
    main()
