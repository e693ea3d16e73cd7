"""Response slope of the roundtrip operator to spec corrections.

With closed_loop disabled, measure e1 = R(f) - f, then render from
f_c = f - g*e1 for several gains g and measure the residual r(g) =
R(f_c) - f. If R responds identity-like to corrections, r(g) ~ (1-g)*e1 + b
and the best gain is ~1; a sub-identity response shows up as the residual
shrinking slower than (1-g). Reported separately for steady voiced /
unvoiced frames (dist >= 10 from any voicing edge, no flips).

Run: PYTHONPATH=.:$PYTHONPATH python scripts/response_slope.py [n_utts] [seed]
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
    cfg = VocoderConfig(
        kind="pml", fs=16000, spec_size=65, nm_size=33, closed_loop=0
    )
    voc = get_vocoder(cfg)
    root = os.environ.get("BDIAG_ROOT", f"/tmp/bdiag_{n_utts}_{seed}")
    if os.path.isdir(os.path.join(root, "wav")):
        with open(os.path.join(root, "fileids.scp")) as f:
            ids = [l.strip() for l in f if l.strip()]
    else:
        ids = generate_demo_corpus(root, num_utterances=n_utts, fs=cfg.fs, seed=seed)

    gains = [0.0, 0.5, 1.0, 1.5, 2.0]
    acc = {g: {"v": [], "u": []} for g in gains}
    s0, s1 = 1, 1 + cfg.spec_size
    for uid in ids[:n_utts]:
        fs, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        f1 = np.asarray(voc.analyze(wav))
        y = voc.synthesize(f1, seed=0)
        f2 = np.asarray(voc.analyze(y))
        n = min(len(f1), len(f2))
        e1 = f2[:n, s0:s1] - f1[:n, s0:s1]
        _, v1 = voc.f0_vuv(f1[:n])
        _, v2 = voc.f0_vuv(f2[:n])
        d = boundary_distance(v1)
        steady = (d[:n] >= 10) & (v1[:n] == v2[:n])
        for g in gains:
            fc = f1.copy()
            fc[:n, s0:s1] -= g * np.clip(e1, -1.5, 1.5)
            yc = voc.synthesize(fc, seed=0)
            f3 = np.asarray(voc.analyze(yc))
            m = min(n, len(f3))
            r = f3[:m, s0:s1] - f1[:m, s0:s1]
            _, v3 = voc.f0_vuv(f3[:m])
            ok = steady[:m] & (v3[:m] == v1[:m])
            acc[g]["v"].append(r[ok & (v1[:m] > 0.5)])
            acc[g]["u"].append(r[ok & (v1[:m] <= 0.5)])

    print("gain | steady-V rms | steady-U rms")
    for g in gains:
        rv = np.concatenate(acc[g]["v"]).ravel()
        ru = np.concatenate(acc[g]["u"]).ravel()
        print(
            f"{g:4.1f} | {np.sqrt((rv**2).mean()):.4f} (n={len(rv)}) "
            f"| {np.sqrt((ru**2).mean()):.4f} (n={len(ru)})"
        )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
