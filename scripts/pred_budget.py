"""Prediction-path MCD error budget (VERDICT round-4 item 1).

Decomposes a trained run's held-out test MCD into terms, mirroring the
methodology that drove copy-synthesis 19.9 -> 4.3 dB:

  * ORACLE FLOOR — the corpus's label-conditional irreducible error,
    measured directly with a Monte-Carlo oracle: for each test utterance,
    re-render K ALTERNATE realizations of the exact same utterance plan
    (same phones/durations/f0 — everything the labels could ever encode)
    with fresh synthesis noise draws, analyze each, and average the
    features.  That mean is the best possible label-informed LSE predictor
    (the conditional mean in the model's own target domain); its per-frame
    MCD against the canonical analysis features is the floor NO model can
    beat on this corpus/analyzer, by construction.  The test MCD measures
    predicted features against ONE realization's analysis, so realization
    noise (unvoiced excitation draws, estimator variance under noise
    excitation) is irreducibly priced in.
  * MODEL GAP — per-frame MCD of the prediction against the ORACLE mean
    (model error with the irreducible term removed).
  * Splits of all three terms by voicing (ref) and by distance to the
    nearest voicing boundary (0-3 / 4-9 / >=10 frames) — the same bands
    the copy-synthesis budget used (BASELINE.md round-3).
  * Per-stream secondary rows (f0 / nm RMSE for model and oracle).

Run AFTER a soak (feature cache + checkpoint in place), on CPU:

  PYTHONPATH=. python scripts/pred_budget.py /tmp/soak_prod_r5/exp \
      [K] [corpus_seed] [n_utts]

corpus_seed/n_utts must match the generate_demo_corpus() call that built
the soak corpus (scripts/final_soak.py: seed 777, 400 utts); jitter /
speaker_f0 / hard are read from env like final_soak reads them.  The
replay is RNG-exact (tests/test_data.py::test_demo_replay_corpus_plans),
so uid alignment is asserted, not assumed.

Reference parity note: the reference has no such decomposition — its
generation stage prints aggregate MCD only (percivaltts run.py objective
measures [mount empty]); this is the framework's own quality tooling.
"""

import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import Configuration
from percivaltts_tpu.data.compose import compose
from percivaltts_tpu.data.demo import _synthesize_utterance, replay_corpus_plans
from percivaltts_tpu.eval.measures import per_frame_mcd_np
from percivaltts_tpu.models.base import predict_batch
from percivaltts_tpu.training.checkpoints import CheckpointManager
from percivaltts_tpu.training.state import abstract_gan_state, eval_params
from percivaltts_tpu.utils.logging import print_log
from percivaltts_tpu.vocoders import get_vocoder


def boundary_distance(vuv: np.ndarray) -> np.ndarray:
    """Per-frame distance (frames) to the nearest voicing flip of a
    boolean track; frames in an utterance with no flip read len(vuv)."""
    v = vuv > 0.5
    flips = np.flatnonzero(v[1:] != v[:-1]) + 1  # index of first frame after flip
    n = len(v)
    if len(flips) == 0:
        return np.full(n, n, dtype=np.int32)
    idx = np.arange(n)[:, None]
    # distance to the boundary BETWEEN frames flips-1 | flips: min of the
    # two frame distances, matching boundary_diag's convention (frame at
    # the flip has distance 0)
    d = np.minimum(np.abs(idx - flips[None, :]), np.abs(idx - (flips[None, :] - 1)))
    return d.min(axis=1).astype(np.int32)


def agg(per_utt_vals):
    """Equal weight per utterance over non-empty entries (the measures
    convention), plus the pooled frame count."""
    vals = [v for v in per_utt_vals if v[1] > 0]
    if not vals:
        return float("nan"), 0
    return float(np.mean([v[0] for v in vals])), int(sum(v[1] for v in vals))


def main(exp: str, K: int = 8, seed: int = 777, n_utts: int = 400):
    cfg = Configuration.load(os.path.join(exp, "config.json"))
    voc = get_vocoder(cfg.vocoder)
    cache = os.path.join(exp, "feature_cache")
    corpus = compose(cfg, cache_dir=cache if os.path.isdir(cache) else None)
    test = corpus.test
    stats = corpus.out_stats
    fs = cfg.vocoder.fs

    # ---- model predictions on the test split (the measures path) ----
    state = abstract_gan_state(cfg, corpus.train.label_dim)
    ckpt = CheckpointManager(os.path.join(cfg.workdir, "checkpoints"))
    step = ckpt.best_step()
    print_log(f"restoring best checkpoint step {step}")
    state = ckpt.restore(state, step)
    preds_n = predict_batch(state.gen.apply_fn, eval_params(state), test.labs)
    preds = [np.asarray(stats.denormalize(p), np.float32) for p in preds_n]
    refs = [np.asarray(stats.denormalize(c), np.float32) for c in test.cmps]

    # ---- Monte-Carlo oracle over alternate realizations ----
    jitter = float(os.environ.get("JITTER", "0"))
    spk = float(os.environ.get("SPK_F0", "0"))
    hard = bool(int(os.environ.get("HARD", "0")))
    test_ids = set(test.ids)
    oracle: dict = {}
    alt0: dict = {}
    plans = replay_corpus_plans(
        n_utts, fs=fs, seed=seed, hard=hard, jitter=jitter, speaker_f0=spk
    )
    todo = [(uid, seq, durs, f0b) for uid, seq, durs, f0b, _ in plans if uid in test_ids]
    assert {t[0] for t in todo} == test_ids, "corpus replay does not match the soak corpus (seed/n_utts/mode?)"
    oracle_lab: dict = {}
    f0_lo, f0_hi = (75.0, 285.0) if hard else (110.0, 220.0)
    for uid, seq, durs, f0b in todo:
        alts = []
        alts_lab = []
        for k in range(K):
            rng = np.random.default_rng([4242, seed, int(uid[4:]), k])
            wav, _, _ = _synthesize_utterance(
                seq, durs, fs, f0b, rng, hard=hard, jitter=jitter
            )
            # disk-faithful int16 roundtrip (compose analyzes saved wavs)
            wav = (np.clip(wav, -1, 1) * 32767.0).astype(np.int16).astype(np.float32) / 32768.0
            alts.append(wav)
            # LABEL-ONLY oracle arm: the default corpus does not encode
            # f0_base in the labels, so the best label-informed predictor
            # must also marginalize over the f0 prior — fresh f0 draw per
            # alternate (pinned-speaker corpora have no such term). The
            # plan-oracle − label-oracle gap is the f0-INFORMATION term of
            # the spec stream, the part encode_f0 removes.
            rng2 = np.random.default_rng([515151, seed, int(uid[4:]), k])
            f0_draw = f0b if spk > 0 else float(rng2.uniform(f0_lo, f0_hi))
            wav2, _, _ = _synthesize_utterance(
                seq, durs, fs, f0_draw, rng2, hard=hard, jitter=jitter
            )
            wav2 = (np.clip(wav2, -1, 1) * 32767.0).astype(np.int16).astype(np.float32) / 32768.0
            alts_lab.append(wav2)
        feats = voc.analyze_batch(alts + alts_lab)
        oracle[uid] = np.mean(np.stack([np.asarray(f) for f in feats[:K]]), axis=0)
        alt0[uid] = np.asarray(feats[0])
        oracle_lab[uid] = np.mean(np.stack([np.asarray(f) for f in feats[K:]]), axis=0)
        print_log(f"oracle {uid}: K={K}×2 alternates analyzed")

    # ---- per-frame cepstra + masks, then the budget ----
    BANDS = (("d0_3", 0, 3), ("d4_9", 4, 9), ("d10", 10, 10**9))
    terms = {  # term -> per-utt (mean, nframes) lists keyed by mask name
        name: {m: [] for m in
               ("all", "voiced", "unvoiced", "d0_3", "d4_9", "d10")}
        for name in ("model_ref", "oracle_ref", "model_oracle", "alt_ref", "floor_extrap", "oracle_lab_ref")
    }
    stream_rows: dict = {}
    for i, uid in enumerate(test.ids):
        n = min(preds[i].shape[0], refs[i].shape[0], oracle[uid].shape[0])
        p, r, o, a1 = preds[i][:n], refs[i][:n], oracle[uid][:n], alt0[uid][:n]
        ol = oracle_lab[uid][:n]
        ceps = voc.cepstra(np.stack([p, r, o, a1, ol]))
        cp, cr, co, ca, col = (np.asarray(c) for c in ceps)
        pf = {
            "model_ref": per_frame_mcd_np(cp, cr),
            "oracle_ref": per_frame_mcd_np(co, cr),
            "model_oracle": per_frame_mcd_np(cp, co),
            "alt_ref": per_frame_mcd_np(ca, cr),
            "oracle_lab_ref": per_frame_mcd_np(col, cr),
        }
        # K→∞ extrapolation of the oracle floor: with per-frame
        # realization variance σ², E d(alt,ref)² = 2σ² and
        # E d(mean_K,ref)² = σ²(1+1/K), so the finite-K oracle overshoots
        # the true floor σ by the sampling term σ²/K — subtract it
        # per frame (clamped at 0) for the floor an UNLIMITED-K oracle
        # (i.e. the exact conditional mean) would score
        pf["floor_extrap"] = np.sqrt(
            np.maximum(
                pf["oracle_ref"] ** 2 - (pf["alt_ref"] ** 2) / (2.0 * K), 0.0
            )
        )
        _, vr = voc.f0_vuv(r)
        dist = boundary_distance(vr)
        masks = {
            "all": np.ones(n, bool),
            "voiced": vr > 0.5,
            "unvoiced": vr <= 0.5,
        }
        for bn, lo, hi in BANDS:
            masks[bn] = (dist >= lo) & (dist <= hi)
        for t, v in pf.items():
            for m, mk in masks.items():
                terms[t][m].append((float(np.mean(v[mk])) if mk.any() else 0.0,
                                    int(mk.sum())))
        # secondary per-stream rows (voiced-frame f0 RMSE, nm/bap RMSE)
        f0p, vp = voc.f0_vuv_pred(p)
        f0r, _ = voc.f0_vuv(r)
        f0o, _ = voc.f0_vuv(o)
        both = (vp > 0.5) & (vr > 0.5)
        for nm_, (x, y) in (("f0_model", (f0p, f0r)), ("f0_oracle", (f0o, f0r))):
            if both.any():
                stream_rows.setdefault(nm_, []).append(
                    (float(np.sqrt(np.mean((x - y)[both] ** 2))), int(both.sum())))
        for sname in ("nm", "bap"):
            if sname in voc.streams:
                s0, s1 = voc.streams[sname]
                for nm_, x in ((f"{sname}_model", p), (f"{sname}_oracle", o)):
                    stream_rows.setdefault(nm_, []).append(
                        (float(np.sqrt(np.mean((x[:, s0:s1] - r[:, s0:s1]) ** 2))), n))

    out = {"checkpoint_step": int(step), "K": K, "seed": seed,
           "n_test": len(test.ids), "terms": {}, "streams": {}}
    frac = {}
    tot = sum(v[1] for v in terms["model_ref"]["all"])
    for t, by_mask in terms.items():
        out["terms"][t] = {}
        for m, vals in by_mask.items():
            mean, nfr = agg(vals)
            out["terms"][t][m] = {"mcd_db": round(mean, 3), "frames": nfr}
            frac[m] = nfr / tot
    for nm_, vals in stream_rows.items():
        mean, nfr = agg(vals)
        out["streams"][nm_] = round(mean, 3)

    print_log("==== prediction-path error budget ====")
    hdr = f"{'term':<14}" + "".join(f"{m:>10}" for m in ("all", "voiced", "unvoiced", "d0_3", "d4_9", "d10"))
    print_log(hdr)
    print_log(f"{'frame frac':<14}" + "".join(f"{frac[m]:>10.2f}" for m in ("all", "voiced", "unvoiced", "d0_3", "d4_9", "d10")))
    for t in ("model_ref", "oracle_ref", "model_oracle", "alt_ref", "floor_extrap", "oracle_lab_ref"):
        print_log(f"{t:<14}" + "".join(
            f"{out['terms'][t][m]['mcd_db']:>10.2f}"
            for m in ("all", "voiced", "unvoiced", "d0_3", "d4_9", "d10")))
    print_log(f"streams: {out['streams']}")
    path = os.path.join(exp, "pred_budget.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print_log(f"budget written to {path}")
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if a else "/tmp/soak_prod_r5/exp",
        int(a[1]) if len(a) > 1 else 8,
        int(a[2]) if len(a) > 2 else 777,
        int(a[3]) if len(a) > 3 else 400,
    )
