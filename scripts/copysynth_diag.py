"""Copy-synthesis fidelity diagnostic: where does the MCD come from?

Analyze -> synthesize -> re-analyze the demo corpus, then break the MCD down
by voicing class and frame energy so vocoder-fidelity work targets the right
frames. Run on CPU (small workload): PYTHONPATH=.:$PYTHONPATH python scripts/copysynth_diag.py
"""

import os
import sys
import tempfile

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.data.demo import generate_demo_corpus
from percivaltts_tpu.eval.measures import per_frame_mcd_np
from percivaltts_tpu.vocoders import get_vocoder


def main(n_utts: int = 12, seed: int = 1234):
    cfg = VocoderConfig(kind="pml", fs=16000, spec_size=65, nm_size=33)
    voc = get_vocoder(cfg)
    root = tempfile.mkdtemp(prefix="csdiag_")
    ids = generate_demo_corpus(root, num_utterances=n_utts, fs=cfg.fs, seed=seed)

    from percivaltts_tpu.data.compose import load_wav

    per_frame_all = []
    tags = []  # (voiced_orig, voiced_resyn, log_energy)
    f0_pairs = []
    for uid in ids:
        fs, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        feats = voc.analyze(wav)
        y = voc.synthesize(feats)
        feats2 = voc.analyze(y)
        n = min(len(feats), len(feats2))
        pf = per_frame_mcd_np(voc.cepstra(feats[:n]), voc.cepstra(feats2[:n]))
        per_frame_all.append(pf)
        f0a, va = voc.f0_vuv(feats[:n])
        f0b, vb = voc.f0_vuv(feats2[:n])
        f0_pairs.append((f0a, f0b, va, vb))
        # frame energy proxy: mean warped log envelope
        en = voc.stream(feats[:n], "spec").mean(axis=-1)
        tags.append(np.stack([va, vb, en], axis=-1))

    pf = np.concatenate(per_frame_all)
    tg = np.concatenate(tags)
    va, vb, en = tg[:, 0] > 0.5, tg[:, 1] > 0.5, tg[:, 2]

    def report(name, m):
        if m.sum() == 0:
            print(f"{name::>28}: (no frames)")
            return
        print(
            f"{name:>28}: n={int(m.sum()):5d}  mean={pf[m].mean():6.2f}  "
            f"median={np.median(pf[m]):6.2f}  p90={np.percentile(pf[m], 90):6.2f}  "
            f"p99={np.percentile(pf[m], 99):7.2f}"
        )

    print(f"\n=== copy-synthesis MCD breakdown ({len(pf)} frames) ===")
    report("ALL", np.ones_like(va))
    report("voiced both", va & vb)
    report("unvoiced both", ~va & ~vb)
    report("voicing flipped", va != vb)
    qs = np.quantile(en, [0.25, 0.5, 0.75])
    report(f"energy Q1 (<{qs[0]:.1f})", en < qs[0])
    report("energy Q2", (en >= qs[0]) & (en < qs[1]))
    report("energy Q3", (en >= qs[1]) & (en < qs[2]))
    report(f"energy Q4 (>{qs[2]:.1f})", en >= qs[2])

    f0a = np.concatenate([p[0] for p in f0_pairs])
    f0b = np.concatenate([p[1] for p in f0_pairs])
    both = va & vb
    rel = np.abs(f0a - f0b)[both] / f0a[both]
    print(
        f"\nf0 rel err (both voiced): median={np.median(rel) * 100:.2f}%  "
        f"p90={np.percentile(rel, 90) * 100:.2f}%  "
        f"octave-ish (>30%): {(rel > 0.3).mean() * 100:.2f}%"
    )
    print(f"vuv flip rate: {(va != vb).mean() * 100:.2f}%")
    print(f"\nheadline all-frame MCD: {pf.mean():.2f} dB")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
