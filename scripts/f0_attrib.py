"""Attribute a trained run's F0 RMSE: voicing-edge frames vs interior.

BASELINE.md's f0 audit pinned the ESTIMATOR at 0.34 Hz voiced RMSE, leaving
the soak-level 30–34 Hz as "model error + frame misalignment at voicing
edges". This splits the two: restore the run's best checkpoint, predict the
test split, and report the both-voiced F0 RMSE overall vs with frames
within K frames of a voicing flip (in either track) excluded.

Run (CPU, after a soak/study):
    PYTHONPATH=.:$PYTHONPATH python scripts/f0_attrib.py /tmp/soak_r3b/exp
"""

import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def edge_dist(v: np.ndarray) -> np.ndarray:
    """Per-frame distance to the nearest voicing flip (inf if none)."""
    flips = np.flatnonzero(np.diff(v.astype(np.int8)) != 0)
    if flips.size == 0:
        return np.full(len(v), np.inf)
    idx = np.arange(len(v))
    return np.min(np.abs(idx[:, None] - flips[None, :] - 0.5), axis=1)


def main(workdir: str) -> int:
    from percivaltts_tpu.config import Configuration
    from percivaltts_tpu.data.compose import compose
    from percivaltts_tpu.models.base import predict_batch
    from percivaltts_tpu.training.checkpoints import CheckpointManager
    from percivaltts_tpu.training.state import abstract_gan_state
    from percivaltts_tpu.vocoders import get_vocoder

    with open(os.path.join(workdir, "config.json")) as f:
        cfg = Configuration.from_dict(json.load(f))
    corpus = compose(cfg)
    voc = get_vocoder(cfg.vocoder)

    state = abstract_gan_state(cfg, corpus.train.label_dim)
    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    step = ckpt.best_step()
    state = ckpt.restore(state, step)
    print(f"checkpoint step {step}, test utts {len(corpus.test.ids)}")

    ds = corpus.test
    preds_n = predict_batch(state.gen.apply_fn, state.gen.params, ds.labs)

    errs = {}  # K -> list of squared errors
    KS = (0, 2, 5)
    n_both = n_edge2 = 0
    refs_f0 = []
    for i in range(len(ds.ids)):
        pred = corpus.out_stats.denormalize(preds_n[i]).astype(np.float32)
        ref = corpus.out_stats.denormalize(ds.cmps[i]).astype(np.float32)
        n = min(pred.shape[0], ref.shape[0])
        f0p, vp = voc.f0_vuv(pred[:n])
        f0r, vr = voc.f0_vuv(ref[:n])
        both = (vp > 0.5) & (vr > 0.5)
        if not both.any():
            continue
        refs_f0.append(f0r[vr > 0.5])
        d = np.minimum(edge_dist(vp > 0.5), edge_dist(vr > 0.5))
        e2 = (f0p - f0r) ** 2
        n_both += int(both.sum())
        n_edge2 += int((both & (d <= 2)).sum())
        for K in KS:
            sel = both & (d > K) if K else both
            if sel.any():
                errs.setdefault(K, []).append(e2[sel])

    for K in KS:
        e = np.concatenate(errs[K])
        label = "all both-voiced" if K == 0 else f"dist > {K} from any flip"
        ae = np.sqrt(e)
        print(
            f"F0 RMSE ({label:>24}): {np.sqrt(e.mean()):7.2f} Hz  "
            f"|err| med {np.median(ae):5.2f} p90 {np.percentile(ae, 90):6.2f} "
            f"p99 {np.percentile(ae, 99):7.2f}  (n={len(e)})"
        )
    print(f"both-voiced frames within 2 of a flip: {100.0 * n_edge2 / n_both:.1f}%")
    # Irreducibility ceiling (the reference's cost_0pred_rmse idea, data.py):
    # the demo corpus draws each utterance's f0_base ~ uniform and does NOT
    # encode it in the labels, so the best label-conditioned predictor can
    # at most capture the within-utterance contour — the pooled std of the
    # reference f0 around the corpus mean is the RMSE of the best CONSTANT
    # predictor, and the model cannot beat (std of per-utterance means).
    allref = np.concatenate(refs_f0)
    per_utt_means = np.array([r.mean() for r in refs_f0])
    print(
        f"corpus-mean-predictor RMSE (pooled ref f0 std): {allref.std():.2f} Hz; "
        f"across-utterance f0-mean std (irreducible from labels): "
        f"{per_utt_means.std():.2f} Hz"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_r3b/exp"))
