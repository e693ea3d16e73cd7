"""Closed-loop synthesis prototype: render, re-analyze, pre-compensate.

R = analyze(synthesize(.)) has a repeating per-frame/band bias component
(scripts/double_roundtrip.py: voiced slope ~0.5, band-bias corr 0.87).
Correct the SPEC stream by f_c = f1 - alpha*(R(f1) - f1) and render again;
measure MCD(f1, analyze(render(f_c))) vs the open-loop MCD(f1, R(f1)).

Run: PYTHONPATH=.:$PYTHONPATH python scripts/closed_loop_proto.py [n_utts] [seed]
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

    s0, s1 = 1, 1 + cfg.spec_size  # spec slice in the feature matrix
    alphas = [0.0, 0.5, 0.8, 1.0]
    rows = {a: {"pf": [], "d": [], "flip": []} for a in alphas}
    # also try correcting spec+nm
    rows["1.0+nm"] = {"pf": [], "d": [], "flip": []}
    for uid in ids[:n_utts]:
        fs, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        f1 = voc.analyze(wav)
        y2 = voc.synthesize(f1, seed=0)
        f2 = voc.analyze(y2)
        n = min(len(f1), len(f2))
        _, v1 = voc.f0_vuv(f1[:n])
        d = boundary_distance(v1)
        for a in alphas:
            fc = f1.copy()
            if a > 0:
                fc[:n, s0:s1] = f1[:n, s0:s1] - a * (f2[:n, s0:s1] - f1[:n, s0:s1])
            yc = voc.synthesize(fc, seed=0)
            f2c = voc.analyze(yc)
            m = min(n, len(f2c))
            pf = per_frame_mcd_np(voc.cepstra(f1[:m]), voc.cepstra(f2c[:m]))
            _, v2 = voc.f0_vuv(f2c[:m])
            rows[a]["pf"].append(pf)
            rows[a]["d"].append(d[:m])
            rows[a]["flip"].append(v1[:m] != v2[:m])
        # spec+nm correction at alpha=1
        fc = f1.copy()
        fc[:n, s0:s1] = 2 * f1[:n, s0:s1] - f2[:n, s0:s1]
        nm1 = f1[:n, s1:]
        nm2 = f2[:n, s1:]
        fc[:n, s1:] = np.clip(2 * nm1 - nm2, 0.0, 1.0)
        yc = voc.synthesize(fc, seed=0)
        f2c = voc.analyze(yc)
        m = min(n, len(f2c))
        pf = per_frame_mcd_np(voc.cepstra(f1[:m]), voc.cepstra(f2c[:m]))
        _, v2 = voc.f0_vuv(f2c[:m])
        rows["1.0+nm"]["pf"].append(pf)
        rows["1.0+nm"]["d"].append(d[:m])
        rows["1.0+nm"]["flip"].append(v1[:m] != v2[:m])

    for a, r in rows.items():
        pf = np.concatenate(r["pf"])
        d = np.concatenate(r["d"])
        fl = np.concatenate(r["flip"])
        steady = ~fl & (d >= 10)
        print(
            f"alpha={a}: ALL mean={pf.mean():5.2f} med={np.median(pf):5.2f} "
            f"steady mean={pf[steady].mean():5.2f} med={np.median(pf[steady]):5.2f} "
            f"flip%={fl.mean()*100:.2f}"
        )


if __name__ == "__main__" and not os.environ.get("VARIANTS"):
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    main(n, s)


def variants(n_utts: int = 8, seed: int = 1234):
    cfg = VocoderConfig(kind="pml", fs=16000, spec_size=65, nm_size=33)
    voc = get_vocoder(cfg)
    root = os.environ.get("BDIAG_ROOT", f"/tmp/bdiag_{n_utts}_{seed}")
    with open(os.path.join(root, "fileids.scp")) as f:
        ids = [l.strip() for l in f if l.strip()]
    s0, s1 = 1, 1 + cfg.spec_size

    def run_variant(name, correct_fn, iters=1):
        pfs, ds, fls = [], [], []
        for uid in ids[:n_utts]:
            fs, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
            f1 = voc.analyze(wav)
            _, v1 = voc.f0_vuv(f1)
            d = boundary_distance(v1)
            fc = f1.copy()
            for _ in range(iters):
                y = voc.synthesize(fc, seed=0)
                f2 = voc.analyze(y)
                n = min(len(f1), len(f2))
                fc = correct_fn(f1[:n].copy(), fc[:n], f2[:n], v1[:n])
            yc = voc.synthesize(fc, seed=0)
            f2c = voc.analyze(yc)
            m = min(len(f1), len(f2c))
            pf = per_frame_mcd_np(voc.cepstra(f1[:m]), voc.cepstra(f2c[:m]))
            _, v2 = voc.f0_vuv(f2c[:m])
            pfs.append(pf); ds.append(d[:m]); fls.append(v1[:m] != v2[:m])
        pf = np.concatenate(pfs); d = np.concatenate(ds); fl = np.concatenate(fls)
        steady = ~fl & (d >= 10)
        print(f"{name:>28}: ALL mean={pf.mean():5.2f} med={np.median(pf):5.2f} "
              f"steady mean={pf[steady].mean():5.2f} med={np.median(pf[steady]):5.2f} "
              f"flip%={fl.mean()*100:.2f}")

    def corr_gated(f1, fc, f2, v1):
        _, v2 = voc.f0_vuv(f2)
        same = (v1 > 0.5) == (v2 > 0.5)
        e = np.clip(f2[:, s0:s1] - f1[:, s0:s1], -1.5, 1.5)
        e[~same] = 0.0
        out = fc.copy(); out[:, s0:s1] = fc[:, s0:s1] - e
        return out

    def corr_plain(f1, fc, f2, v1):
        e = f2[:, s0:s1] - f1[:, s0:s1]
        out = fc.copy(); out[:, s0:s1] = fc[:, s0:s1] - e
        return out

    def make_dist_gated(mind):
        def corr(f1, fc, f2, v1):
            _, v2 = voc.f0_vuv(f2)
            same = (v1 > 0.5) == (v2 > 0.5)
            d1 = boundary_distance(v1)
            e = np.clip(f2[:, s0:s1] - f1[:, s0:s1], -1.5, 1.5)
            e[~same | (d1 < mind)] = 0.0
            out = fc.copy(); out[:, s0:s1] = fc[:, s0:s1] - e
            return out
        return corr

    def make_profile(prof, clamp_near=0.75):
        # prof: dict dist->alpha; default alpha 1.0 at d>=4
        def corr(f1, fc, f2, v1):
            _, v2 = voc.f0_vuv(f2)
            same = (v1 > 0.5) == (v2 > 0.5)
            d1 = boundary_distance(v1)
            alpha = np.ones(len(f1), np.float32)
            clamp = np.full(len(f1), 1.5, np.float32)
            for dd, aa in prof.items():
                m = d1 == dd
                alpha[m] = aa
                clamp[m] = clamp_near
            e = np.clip(f2[:, s0:s1] - f1[:, s0:s1], -clamp[:, None], clamp[:, None])
            e *= alpha[:, None]
            e[~same] = 0.0
            out = fc.copy(); out[:, s0:s1] = fc[:, s0:s1] - e
            return out
        return corr

    run_variant("P4 a=.5 d0123", make_profile({0: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}), 1)
    run_variant("P5 a=.7 d0123", make_profile({0: 0.7, 1: 0.7, 2: 0.7, 3: 0.7}), 1)
    run_variant("P6 a=.5 clamp1.2", make_profile({0: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}, 1.2), 1)
    run_variant("P7 P4 2iters", make_profile({0: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}), 2)


if __name__ == "__main__" and os.environ.get("VARIANTS"):
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    variants(n, s)
