#!/usr/bin/env python
"""Part 2 of the WORLD VUV diagnosis (scripts/vuv_error_diag.py found the
error is 100% boundary-localized, runs of 3-4 frames): measure the SIGNED
displacement of predicted voicing boundaries vs reference, split by
transition direction (onset U->V, offset V->U), and sweep the decision
threshold on the soft predicted track over the VALIDATION split. If the
prediction's hedged ramp crosses 0.5 systematically off the true boundary,
a calibrated threshold (possibly per direction) moves it back; report the
resulting TEST error for the validation-chosen threshold(s).

Run: PYTHONPATH=. python scripts/vuv_boundary_calib.py [workdir]
"""

import json
import os
import sys

import numpy as np


def boundaries(v: np.ndarray):
    """(onsets, offsets) frame indices (position of the first changed frame)."""
    d = np.diff(np.asarray(v, np.int8))
    return np.flatnonzero(d == 1) + 1, np.flatnonzero(d == -1) + 1


def vuv_with_thresholds(soft: np.ndarray, th_on: float, th_off: float):
    """Hysteresis-style dual-threshold decision evaluated causally is
    order-dependent; for a calibration of boundary PLACEMENT we instead
    use direction-split thresholds on the ramp: voiced where soft > th_on
    OR (voiced-region continuation where soft > th_off). Implemented as:
    binary at th_on, then extend each voiced run forward/backward while
    soft > th_off."""
    v = soft > th_on
    if th_off >= th_on:
        return v
    keep = soft > th_off
    # extend runs into adjacent keep-frames
    changed = True
    while changed:
        grown = v | (np.roll(v, 1) & keep) | (np.roll(v, -1) & keep)
        grown[0] = v[0] or (v[1] and keep[0]) if len(v) > 1 else v[0]
        changed = bool((grown != v).any())
        v = grown
    return v


def collect(workdir, split):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from percivaltts_tpu.config import Configuration
    from percivaltts_tpu.data.compose import compose
    from percivaltts_tpu.models.base import predict_batch
    from percivaltts_tpu.training.checkpoints import CheckpointManager
    from percivaltts_tpu.training.state import abstract_gan_state, eval_params
    from percivaltts_tpu.vocoders import get_vocoder

    with open(os.path.join(workdir, "config.json")) as f:
        cfg = Configuration.from_dict(json.load(f))
    cfg = cfg.replace(workdir=workdir)
    corpus = compose(cfg)
    voc = get_vocoder(cfg.vocoder)
    state = abstract_gan_state(cfg, corpus.train.label_dim)
    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    state = ckpt.restore(state, ckpt.best_step())
    ds = corpus.valid if split == "valid" else corpus.test
    preds_n = predict_batch(state.gen.apply_fn, eval_params(state), ds.labs)
    pairs = []
    for i in range(len(ds.ids)):
        pred = corpus.out_stats.denormalize(preds_n[i]).astype(np.float32)
        ref = corpus.out_stats.denormalize(ds.cmps[i]).astype(np.float32)
        n = min(pred.shape[0], ref.shape[0])
        _, vr = voc.f0_vuv(ref[:n])
        pairs.append((pred[:n, 1], vr > 0.5))
    return pairs


def signed_displacements(pairs, th=0.5):
    on_d, off_d = [], []
    for soft, vr in pairs:
        vp = soft > th
        for kind, (pb, rb) in (
            ("on", (boundaries(vp)[0], boundaries(vr)[0])),
            ("off", (boundaries(vp)[1], boundaries(vr)[1])),
        ):
            for r in rb:
                if len(pb):
                    d = pb[np.argmin(np.abs(pb - r))] - r
                    if abs(d) <= 8:
                        (on_d if kind == "on" else off_d).append(int(d))
    return np.array(on_d), np.array(off_d)


def err_pct(pairs, th_on, th_off):
    e = t = 0
    for soft, vr in pairs:
        vp = vuv_with_thresholds(soft, th_on, th_off)
        e += int((vp != vr).sum())
        t += len(vr)
    return 100.0 * e / t


def main(workdir="/tmp/soak_world_r4/exp"):
    val = collect(workdir, "valid")
    tst = collect(workdir, "test")

    on_d, off_d = signed_displacements(tst)
    print(
        f"test onset displacement  (pred-ref): mean {on_d.mean():+.2f} "
        f"median {np.median(on_d):+.1f} n={len(on_d)}"
    )
    print(
        f"test offset displacement (pred-ref): mean {off_d.mean():+.2f} "
        f"median {np.median(off_d):+.1f} n={len(off_d)}"
    )

    # symmetric threshold sweep on validation
    ths = np.round(np.arange(0.05, 0.96, 0.05), 2)
    errs = [(err_pct(val, t, t), t) for t in ths]
    base = err_pct(val, 0.5, 0.5)
    best_e, best_t = min(errs)
    print(f"valid err at th=0.5: {base:.2f}%; best symmetric th={best_t}: {best_e:.2f}%")

    # dual-threshold sweep (th_on >= th_off: high bar to start voicing,
    # lower bar to extend it — moves onsets later and offsets later)
    best = (base, 0.5, 0.5)
    for t_on in ths:
        for t_off in ths[ths <= t_on]:
            e = err_pct(val, t_on, t_off)
            if e < best[0]:
                best = (e, t_on, t_off)
    print(f"valid best dual (th_on={best[1]}, th_off={best[2]}): {best[0]:.2f}%")

    print(f"TEST err at 0.5/0.5:        {err_pct(tst, 0.5, 0.5):.2f}%")
    print(f"TEST err at best symmetric: {err_pct(tst, best_t, best_t):.2f}%")
    print(f"TEST err at best dual:      {err_pct(tst, best[1], best[2]):.2f}%")


def tail_extend(v: np.ndarray, k: int):
    """Extend each voiced run's END by k frames (targets the measured
    offset-early bias; onsets untouched — shifts only push voicing
    FORWARD in time, and interior frames are already voiced)."""
    v = np.asarray(v, bool)
    out = v.copy()
    for j in range(1, k + 1):
        out[j:] |= v[:-j]
    return out


def sweep_tail(workdir="/tmp/soak_world_r4/exp"):
    val = collect(workdir, "valid")
    tst = collect(workdir, "test")

    def err_tail(pairs, th, k):
        e = t = 0
        for soft, vr in pairs:
            vp = tail_extend(soft > th, k)
            e += int((vp != vr).sum())
            t += len(vr)
        return 100.0 * e / t

    best = (1e9, None, None)
    for th in (0.3, 0.4, 0.5, 0.6):
        for k in range(0, 7):
            e = err_tail(val, th, k)
            print(f"valid th={th} tail+{k}: {e:.2f}%")
            if e < best[0]:
                best = (e, th, k)
    print(f"best on valid: th={best[1]} tail+{best[2]} ({best[0]:.2f}%)")
    print(f"TEST at that setting: {err_tail(tst, best[1], best[2]):.2f}%")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tail":
        sweep_tail(*sys.argv[2:])
    else:
        main(*sys.argv[1:])
