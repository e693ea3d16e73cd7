#!/usr/bin/env python
"""Calibrate the PML prediction-path voicing rule on a finished soak
workdir: sweep (lowest-k nm bands < theta) on the VALIDATION split's
predicted tracks, report the TEST error at the valid-chosen rule.

Motivation (round 4): the analysis rule (AnalysisParams.vuv_low_frac /
vuv_threshold = 0.25/0.75) is calibrated on ANALYSIS nm tracks; the
model's PREDICTED d4c_gd nm stream sits lower through voicing releases,
so the analysis threshold over-voices release tails — on the matched
soak this sweep reads test VUV 2.69% → 0.95% at the valid-chosen rule
(lowest 65% of bands < 0.60; the surface is flat in the band count,
threshold dominates). The chosen rule ships as the production preset's
``VocoderConfig.vuv_pred_low_frac/vuv_pred_threshold`` (decision-path
only — analysis, copy-synthesis and the in-jit synthesis gates are
untouched). Mirrors the WORLD ``vuv_rule="bap"`` calibration
(scripts/vuv_boundary_calib.py).

Run: PYTHONPATH=. python scripts/pml_vuv_calib.py [workdir]
"""

import json
import os
import sys

import numpy as np


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
        pairs.append((voc.stream(pred[:n], "nm"), vr > 0.5))
    return pairs


def err_pct(pairs, k, th):
    e = t = 0
    for nm, vr in pairs:
        vp = np.mean(nm[:, :k], axis=-1) < th
        e += int((vp != vr).sum())
        t += len(vr)
    return 100.0 * e / t


def main(workdir="/tmp/soak_pml_d4c/exp"):
    val = collect(workdir, "valid")
    tst = collect(workdir, "test")
    nm_size = val[0][0].shape[-1]
    cur_k = max(int(nm_size * 0.25), 1)
    print(f"nm_size={nm_size}; analysis rule k={cur_k} th=0.75")
    print(
        f"  valid {err_pct(val, cur_k, 0.75):.2f}%"
        f"  test {err_pct(tst, cur_k, 0.75):.2f}%"
    )
    best = (1e9, None, None)
    for k in range(1, max(nm_size // 4 * 3, 2)):
        row = []
        for th in np.round(np.arange(0.20, 0.91, 0.05), 2):
            e = err_pct(val, k, float(th))
            row.append(f"{th:.2f}:{e:.2f}")
            if e < best[0]:
                best = (e, k, float(th))
        print(f"k={k:2d}  " + " ".join(row))
    print(f"valid best: k={best[1]} th={best[2]} ({best[0]:.2f}%)")
    print(f"TEST at valid-best: {err_pct(tst, best[1], best[2]):.2f}%")


if __name__ == "__main__":
    main(*sys.argv[1:])
