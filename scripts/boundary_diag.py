"""Voicing-boundary copy-synthesis diagnostic.

Round-2 measurement: copy-synthesis MCD concentrates within ±5 frames of a
voicing transition (14-20 dB there vs 6.6-7.9 beyond 10 frames). This tool
breaks the per-frame MCD down by distance-to-boundary, boundary side, and
warped band, so the boundary fix can be measured directly.

Run on CPU: PYTHONPATH=.:$PYTHONPATH python scripts/boundary_diag.py [n_utts] [seed]
"""

import os
import sys
import tempfile

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import AnalysisParams, VocoderConfig
from percivaltts_tpu.data.demo import generate_demo_corpus
from percivaltts_tpu.eval.measures import per_frame_mcd_np
from percivaltts_tpu.vocoders import get_vocoder


def analysis_from_env() -> AnalysisParams:
    """Estimator experiment knobs from env vars → a proper AnalysisParams
    (no module mutation: the params are a static jit argument, so each
    configuration gets its own trace and the config system records it)."""
    import dataclasses

    kw = {}
    for f in dataclasses.fields(AnalysisParams):
        v = os.environ.get(f.name.upper())
        if v is None:
            continue
        if f.type in ("bool", bool):
            kw[f.name] = v not in ("0", "")
        elif f.type in ("int", int):
            kw[f.name] = int(v)
        elif f.type in ("str", str):
            kw[f.name] = v
        else:
            kw[f.name] = float(v)
    return AnalysisParams(**kw)


def boundary_distance(vuv: np.ndarray) -> np.ndarray:
    """Per-frame distance (frames) to the nearest voicing transition; the
    transition sits between frame t and t+1, both get distance 0."""
    flips = np.flatnonzero(np.diff(vuv.astype(np.int8)) != 0)
    if flips.size == 0:
        return np.full(len(vuv), 10**6)
    idx = np.arange(len(vuv))
    d = np.min(
        np.abs(idx[:, None] - flips[None, :] - 0.5), axis=1
    )  # distance to the inter-frame boundary
    return d - 0.5  # frames adjacent to the flip read 0


def main(n_utts: int = 12, seed: int = 1234, hard: int = 0):
    cfg = VocoderConfig(
        kind=os.environ.get("VOC_KIND", "pml"),
        fs=16000,
        spec_size=65,
        nm_size=33,
        closed_loop=int(os.environ.get("CL_ITERS", "1")),
        analysis=analysis_from_env(),
    )
    voc = get_vocoder(cfg)
    # reuse the corpus across experiment runs (same n_utts/seed); set
    # BDIAG_ROOT to pin a location, delete it to force regeneration
    root = os.environ.get(
        "BDIAG_ROOT", f"/tmp/bdiag_{n_utts}_{seed}" + ("_hard" if hard else "")
    )
    if os.path.isdir(os.path.join(root, "wav")):
        with open(os.path.join(root, "fileids.scp")) as f:
            ids = [l.strip() for l in f if l.strip()]
    else:
        ids = generate_demo_corpus(
            root, num_utterances=n_utts, fs=cfg.fs, seed=seed, hard=bool(hard)
        )

    from percivaltts_tpu.data.compose import load_wav

    pf_all, dist_all, side_all, flip_all = [], [], [], []
    band_err = []  # per-frame |spec diff| per warped band for boundary frames
    f0_all = []
    shifts = []  # signed resynth boundary offset (frames), per matched edge
    for uid in ids:
        fs, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        feats = voc.analyze(wav)
        y = voc.synthesize(feats)
        feats2 = voc.analyze(y)
        n = min(len(feats), len(feats2))
        pf = per_frame_mcd_np(voc.cepstra(feats[:n]), voc.cepstra(feats2[:n]))
        f0a, va = voc.f0_vuv(feats[:n])
        _, vb = voc.f0_vuv(feats2[:n])
        d = boundary_distance(va)
        pf_all.append(pf)
        dist_all.append(d)
        side_all.append(va)
        flip_all.append(va != vb)
        f0_all.append(f0a)
        sp1 = voc.stream(feats[:n], "spec")
        sp2 = voc.stream(feats2[:n], "spec")
        band_err.append(np.abs(sp1 - sp2))
        # boundary shift: for each edge in va, the signed offset of the
        # nearest same-direction edge in vb (clipped at ±5, nan if none)
        ea = np.flatnonzero(np.diff(va.astype(np.int8)) != 0)
        eb = np.flatnonzero(np.diff(vb.astype(np.int8)) != 0)
        for e in ea:
            if eb.size:
                off = eb[np.argmin(np.abs(eb - e))] - e
                kind = "U->V" if va[e] < 0.5 else "V->U"
                shifts.append((kind, float(np.clip(off, -6, 6))))

    pf = np.concatenate(pf_all)
    d = np.concatenate(dist_all)
    side = np.concatenate(side_all) > 0.5
    flip = np.concatenate(flip_all)
    be = np.concatenate(band_err)

    def rep(name, m):
        if m.sum() == 0:
            print(f"{name:>26}: (none)")
            return
        print(
            f"{name:>26}: n={int(m.sum()):5d} mean={pf[m].mean():6.2f} "
            f"med={np.median(pf[m]):6.2f} p90={np.percentile(pf[m], 90):6.2f}"
        )

    print(f"=== boundary breakdown ({len(pf)} frames, flips excluded) ===")
    ok = ~flip
    rep("ALL (incl flips)", np.ones_like(ok))
    rep("ALL (no flips)", ok)
    for lo, hi in [(0, 0), (1, 1), (2, 2), (3, 3), (4, 5), (6, 9)]:
        m = ok & (d >= lo) & (d <= hi)
        rep(f"dist {lo}-{hi}", m)
        rep(f"  voiced side", m & side)
        rep(f"  unvoiced side", m & ~side)
    rep("dist >= 10", ok & (d >= 10))
    rep("flipped", flip)
    for lo, hi in [(0, 1), (2, 3), (4, 9)]:
        rep(f"flipped dist {lo}-{hi}", flip & (d >= lo) & (d <= hi))
    rep("flipped dist >= 10", flip & (d >= 10))
    print(f"vuv flip rate: {flip.mean() * 100:.2f}%")
    for kind in ("U->V", "V->U"):
        sh = np.asarray([s for k, s in shifts if k == kind])
        if sh.size:
            vals, cnts = np.unique(sh, return_counts=True)
            print(
                f"boundary shifts {kind} (frames): "
                + " ".join(f"{int(v):+d}:{c}" for v, c in zip(vals, cnts))
            )
    print(f"headline: mean={pf.mean():.2f} median={np.median(pf):.2f}")

    # band profile of the boundary error (nats, warped bands, 8 groups)
    nb = be.shape[1]
    groups = np.array_split(np.arange(nb), 8)
    print("\nband |log-env err| (nats), dist<=3 vs dist>=10, voiced side:")
    m_nearv = ok & (d <= 3) & side
    m_farv = ok & (d >= 10) & side
    m_nearu = ok & (d <= 3) & ~side
    m_faru = ok & (d >= 10) & ~side
    for gi, g in enumerate(groups):
        print(
            f"  g{gi} (bands {g[0]:2d}-{g[-1]:2d}): "
            f"V near {be[m_nearv][:, g].mean():.3f} far {be[m_farv][:, g].mean():.3f}   "
            f"U near {be[m_nearu][:, g].mean():.3f} far {be[m_faru][:, g].mean():.3f}"
        )

    # sub-f0 attribution of the far-voiced low-band error: is the error
    # below the fundamental (mirror-fill region) or at/above the harmonics?
    from percivaltts_tpu.ops.warp import _band_centers_hz

    centers = np.asarray(_band_centers_hz(be.shape[1], cfg.fs))
    f0 = np.concatenate(f0_all)
    sub = centers[None, :] < 0.8 * f0[:, None]
    first = (centers[None, :] >= 0.8 * f0[:, None]) & (
        centers[None, :] < 2.5 * f0[:, None]
    )
    rest = centers[None, :] >= 2.5 * f0[:, None]
    for nm_, msk in (("sub-f0", sub), ("h1-h2", first), ("above", rest)):
        sel = be[m_farv] * msk[m_farv]
        cnt = msk[m_farv].sum()
        print(f"  far-V {nm_:>6}: mean|err| {sel.sum() / max(cnt, 1):.3f} (n={cnt})")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
