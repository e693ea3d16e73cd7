"""Deep-dive one voicing boundary: print per-frame spec bands, nm, f0 of
feats1 (original analysis) vs feats2 (copy-synthesis re-analysis) around
each edge of one utterance, to attribute the near-boundary envelope error.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/edge_deepdive.py [utt_index]
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.data.demo import generate_demo_corpus
from percivaltts_tpu.eval.measures import per_frame_mcd_np
from percivaltts_tpu.vocoders import get_vocoder


def main(utt: int = 0):
    cfg = VocoderConfig(kind="pml", fs=16000, spec_size=65, nm_size=33)
    voc = get_vocoder(cfg)
    root = os.environ.get("BDIAG_ROOT", "/tmp/bdiag_12_1234")
    if not os.path.isdir(os.path.join(root, "wav")):
        generate_demo_corpus(root, num_utterances=12, fs=cfg.fs, seed=1234)
    with open(os.path.join(root, "fileids.scp")) as f:
        ids = [l.strip() for l in f if l.strip()]
    uid = ids[utt]

    from percivaltts_tpu.data.compose import load_wav

    _, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
    f1 = voc.analyze(wav)
    y = voc.synthesize(f1)
    f2 = voc.analyze(y)
    n = min(len(f1), len(f2))
    f1, f2 = f1[:n], f2[:n]
    pf = per_frame_mcd_np(voc.cepstra(f1), voc.cepstra(f2))
    f0a, va = voc.f0_vuv(f1)
    f0b, vb = voc.f0_vuv(f2)
    sp1, sp2 = voc.stream(f1, "spec"), voc.stream(f2, "spec")
    nm1, nm2 = voc.stream(f1, "nm"), voc.stream(f2, "nm")

    edges = np.flatnonzero(np.diff(va.astype(np.int8)) != 0)
    print(f"utt {uid}: {n} frames, edges at {edges}")
    for e in edges:
        kind = "U->V" if va[e] < 0.5 else "V->U"
        print(f"\n=== edge {kind} at {e}|{e + 1} ===")
        print(
            " t  v1 v2   f0a   f0b    mcd | sp1[0:12:3]          sp2[0:12:3]"
            "          | d(g0) d(g1) d(hi) | nm1lo nm2lo"
        )
        for t in range(max(e - 3, 0), min(e + 5, n)):
            d = np.abs(sp1[t] - sp2[t])
            print(
                f"{t:3d}  {int(va[t])}  {int(vb[t])} {f0a[t]:5.0f} {f0b[t]:5.0f}"
                f" {pf[t]:6.1f} | "
                + " ".join(f"{v:5.1f}" for v in sp1[t, 0:12:3])
                + " | "
                + " ".join(f"{v:5.1f}" for v in sp2[t, 0:12:3])
                + f" | {d[0:9].mean():5.2f} {d[9:17].mean():5.2f} "
                f"{d[17:].mean():5.2f} | {nm1[t, :8].mean():5.2f} "
                f"{nm2[t, :8].mean():5.2f}"
            )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
