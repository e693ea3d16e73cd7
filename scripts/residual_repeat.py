"""How repeatable is the REMAINING closed-loop copy-synthesis error?

For each utterance: analyze -> closed-loop synthesize with two different
noise seeds -> re-analyze both. The per-frame/band spec errors e_s = R_s(f)-f
for seeds s=0,1 share the operator but not the noise realization, so
corr(e_0, e_1) over steady frames = the repeatable fraction of the residual
(what a further correction pass could still cancel); 1 - corr is fresh
reading/realization variance (irreducible by iteration).

Run: PYTHONPATH=.:$PYTHONPATH python scripts/residual_repeat.py [n_utts] [seed]
"""

import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.data.compose import load_wav
from percivaltts_tpu.data.demo import generate_demo_corpus
from percivaltts_tpu.vocoders import get_vocoder

sys.path.insert(0, os.path.dirname(__file__))
from boundary_diag import boundary_distance  # noqa: E402


def main(n_utts: int = 8, seed: int = 1234):
    cfg = VocoderConfig(kind="pml", fs=16000, spec_size=65, nm_size=33)
    voc = get_vocoder(cfg)
    root = os.environ.get("BDIAG_ROOT", f"/tmp/bdiag_{n_utts}_{seed}")
    if os.path.isdir(os.path.join(root, "wav")):
        with open(os.path.join(root, "fileids.scp")) as f:
            ids = [l.strip() for l in f if l.strip()]
    else:
        ids = generate_demo_corpus(root, num_utterances=n_utts, fs=cfg.fs, seed=seed)

    e0v, e1v, e0u, e1u = [], [], [], []
    for uid in ids[:n_utts]:
        fs, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        f1 = voc.analyze(wav)
        es = []
        vs = []
        for s in (0, 1):
            y = voc.synthesize(f1, seed=s)
            f2 = voc.analyze(y)
            n = min(len(f1), len(f2))
            es.append(voc.stream(f2[:n], "spec") - voc.stream(f1[:n], "spec"))
            _, v2 = voc.f0_vuv(f2[:n])
            vs.append(v2)
        n = min(map(len, es))
        _, v1 = voc.f0_vuv(f1[:n])
        d = boundary_distance(v1)
        steady = (
            (d[:n] >= 10) & (vs[0][:n] == v1[:n]) & (vs[1][:n] == v1[:n])
        )
        voiced = steady & (v1[:n] > 0.5)
        unv = steady & (v1[:n] <= 0.5)
        e0v.append(es[0][:n][voiced])
        e1v.append(es[1][:n][voiced])
        e0u.append(es[0][:n][unv])
        e1u.append(es[1][:n][unv])

    for name, a, b in (
        ("steady VOICED", np.concatenate(e0v), np.concatenate(e1v)),
        ("steady UNVOICED", np.concatenate(e0u), np.concatenate(e1u)),
    ):
        a, b = a.ravel(), b.ravel()
        corr = float(np.corrcoef(a, b)[0, 1])
        print(
            f"{name}: n={len(a)} corr={corr:+.3f} "
            f"rms e0={np.sqrt((a**2).mean()):.4f} e1={np.sqrt((b**2).mean()):.4f} "
            f"rms(e0-e1)/sqrt2={np.sqrt(((a - b) ** 2).mean() / 2):.4f} "
            f"rms mean-err={np.sqrt((((a + b) / 2) ** 2).mean()):.4f}"
        )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
