#!/usr/bin/env python
"""Diagnose the STRUCTURE of WORLD's end-to-end VUV error (VERDICT round-3
item 3): after clean_vuv (median-3 + min-run pruning) the matched soak still
reads ~4.3%, i.e. the model's voicing errors are NOT frame-level dither.
This script restores a finished soak's best checkpoint, predicts the test
split, and characterizes every disagreeing frame:

* raw-threshold vs clean_vuv error (does the cleanup fire at all?)
* error run-length histogram (dither = runs of 1; misalignment = runs 2+)
* distance of each error frame to the nearest REFERENCE voicing boundary
* tolerance curve: error remaining if ±k frames around reference
  boundaries are forgiven (boundary-position noise vs genuine misvoicing)

Run: PYTHONPATH=. python scripts/vuv_error_diag.py [workdir=/tmp/soak_world_r4/exp]
"""

import json
import os
import sys

import numpy as np


def runs_of(x: np.ndarray):
    """Start indices and lengths of True runs."""
    x = np.asarray(x, bool)
    d = np.diff(np.concatenate([[0], x.astype(np.int8), [0]]))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return starts, ends - starts


def main(workdir="/tmp/soak_world_r4/exp"):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from percivaltts_tpu.config import Configuration
    from percivaltts_tpu.data.compose import compose
    from percivaltts_tpu.models.base import predict_batch
    from percivaltts_tpu.training.checkpoints import CheckpointManager
    from percivaltts_tpu.training.state import abstract_gan_state, eval_params
    from percivaltts_tpu.vocoders import get_vocoder
    from percivaltts_tpu.vocoders.world import clean_vuv

    with open(os.path.join(workdir, "config.json")) as f:
        cfg = Configuration.from_dict(json.load(f))
    cfg = cfg.replace(workdir=workdir)
    corpus = compose(cfg)
    voc = get_vocoder(cfg.vocoder)

    state = abstract_gan_state(cfg, corpus.train.label_dim)
    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    state = ckpt.restore(state, ckpt.best_step())
    ds = corpus.test
    preds_n = predict_batch(state.gen.apply_fn, eval_params(state), ds.labs)

    tot = raw_err = cln_err = 0
    run_hist = np.zeros(8, np.int64)  # run lengths 1..7, 8+ pooled
    dist_hist = np.zeros(9, np.int64)  # dist 0..7 to ref boundary, 8+ pooled
    tol_err = np.zeros(5, np.int64)  # errors remaining at tolerance 0..4
    for i in range(len(ds.ids)):
        pred = corpus.out_stats.denormalize(preds_n[i]).astype(np.float32)
        ref = corpus.out_stats.denormalize(ds.cmps[i]).astype(np.float32)
        n = min(pred.shape[0], ref.shape[0])
        vp_raw = (pred[:n, 1] > 0.5).astype(np.float32)
        _, vp_cln = voc.f0_vuv(pred[:n])
        _, vr = voc.f0_vuv(ref[:n])
        vr = vr > 0.5
        tot += n
        raw_err += int(np.sum(vp_raw != vr))
        err = np.asarray(vp_cln > 0.5) != vr
        cln_err += int(err.sum())

        starts, lens = runs_of(err)
        for ln in lens:
            run_hist[min(ln, 8) - 1] += 1
        # distance to nearest reference boundary
        bidx = np.flatnonzero(np.diff(vr.astype(np.int8)) != 0) + 0.5
        if len(bidx):
            for t in np.flatnonzero(err):
                d = int(np.min(np.abs(bidx - t)))
                dist_hist[min(d, 8)] += 1
            for k in range(5):
                far = np.array(
                    [np.min(np.abs(bidx - t)) > k for t in np.flatnonzero(err)]
                )
                tol_err[k] += int(far.sum()) if len(far) else 0
        else:
            dist_hist[8] += int(err.sum())
            tol_err += int(err.sum())

    print(f"frames {tot}")
    print(f"raw-threshold VUV error: {100*raw_err/tot:.2f}%")
    print(f"clean_vuv     VUV error: {100*cln_err/tot:.2f}%")
    print("error run-length hist (1..7, 8+):", run_hist.tolist())
    print("error dist-to-ref-boundary hist (0..7, 8+):", dist_hist.tolist())
    for k in range(5):
        print(f"  error beyond ±{k} frames of a ref boundary: {100*tol_err[k]/tot:.2f}%")


if __name__ == "__main__":
    main(*sys.argv[1:])
