"""Is the copy-synthesis steady-state error a consistent operator bias?

Let R = Read∘Render (analyze(synthesize(.))) on the feature space. Measure
e1 = R(f1) - f1 and e2 = R(R(f1)) - R(f1) on steady voiced / steady
unvoiced frames. If corr(e2, e1) ~ +1 with slope ~1, R(x) = x + b with a
near-constant bias b -> pre-compensate by rendering f1 - b. If corr ~ 0,
the error is reading variance; if corr ~ -1, R is oscillating around a
fixed point (render from (f1+f2)/2-ish or damp).

Run: PYTHONPATH=.:$PYTHONPATH python scripts/double_roundtrip.py [n_utts] [seed]
"""

import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.data.demo import generate_demo_corpus
from percivaltts_tpu.data.compose import load_wav
from percivaltts_tpu.eval.measures import per_frame_mcd_np

sys.path.insert(0, os.path.dirname(__file__))
from boundary_diag import boundary_distance  # noqa: E402

from percivaltts_tpu.vocoders import get_vocoder  # noqa: E402


def main(n_utts: int = 8, seed: int = 1234):
    cfg = VocoderConfig(kind="pml", fs=16000, spec_size=65, nm_size=33)
    voc = get_vocoder(cfg)
    root = os.environ.get("BDIAG_ROOT", f"/tmp/bdiag_{n_utts}_{seed}")
    if os.path.isdir(os.path.join(root, "wav")):
        with open(os.path.join(root, "fileids.scp")) as f:
            ids = [l.strip() for l in f if l.strip()]
    else:
        ids = generate_demo_corpus(root, num_utterances=n_utts, fs=cfg.fs, seed=seed)

    E1, E2, VV, DD = [], [], [], []
    mcd12, mcd23, mcd13 = [], [], []
    for uid in ids[:n_utts]:
        fs, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        f1 = voc.analyze(wav)
        y2 = voc.synthesize(f1, seed=0)
        f2 = voc.analyze(y2)
        y3 = voc.synthesize(f2, seed=0)
        f3 = voc.analyze(y3)
        n = min(len(f1), len(f2), len(f3))
        f1, f2, f3 = f1[:n], f2[:n], f3[:n]
        _, v1 = voc.f0_vuv(f1)
        _, v2 = voc.f0_vuv(f2)
        _, v3 = voc.f0_vuv(f3)
        d1 = boundary_distance(v1)
        d2 = boundary_distance(v2)
        stable = (v1 == v2) & (v2 == v3) & (np.minimum(d1, d2) >= 10)
        sp1 = voc.stream(f1, "spec")
        sp2 = voc.stream(f2, "spec")
        sp3 = voc.stream(f3, "spec")
        E1.append((sp2 - sp1)[stable])
        E2.append((sp3 - sp2)[stable])
        VV.append(v1[stable])
        DD.append(np.minimum(d1, d2)[stable])
        mcd12.append(per_frame_mcd_np(voc.cepstra(f1), voc.cepstra(f2))[stable])
        mcd23.append(per_frame_mcd_np(voc.cepstra(f2), voc.cepstra(f3))[stable])
        mcd13.append(per_frame_mcd_np(voc.cepstra(f1), voc.cepstra(f3))[stable])

    e1 = np.concatenate(E1)
    e2 = np.concatenate(E2)
    vv = np.concatenate(VV) > 0.5
    m12 = np.concatenate(mcd12)
    m23 = np.concatenate(mcd23)
    m13 = np.concatenate(mcd13)

    for name, m in [("voiced", vv), ("unvoiced", ~vv)]:
        a, b = e1[m].ravel(), e2[m].ravel()
        r = float(np.corrcoef(a, b)[0, 1])
        slope = float((a * b).sum() / np.maximum((a * a).sum(), 1e-9))
        print(
            f"{name:>9}: n={m.sum():5d}  rms(e1)={a.std():.3f} rms(e2)={b.std():.3f}"
            f"  corr(e1,e2)={r:+.3f}  slope={slope:+.3f}"
        )
        print(
            f"{'':>9}  MCD f1~f2 {m12[m].mean():.2f}  f2~f3 {m23[m].mean():.2f}"
            f"  f1~f3 {m13[m].mean():.2f}"
        )
        # band-group structure of the means (is the bias band-consistent?)
        mb1 = e1[m].mean(0)
        mb2 = e2[m].mean(0)
        print(f"{'':>9}  mean-bias corr across bands: "
              f"{np.corrcoef(mb1, mb2)[0, 1]:+.3f}  |mb1| {np.abs(mb1).mean():.3f}"
              f"  |mb2| {np.abs(mb2).mean():.3f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    main(n, s)
