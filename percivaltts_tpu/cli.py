"""Command-line entry points: demo / compose / train / generate.

Reference parity: percivaltts's experiment driver (``percivaltts/run.py`` +
``clone.sh``/``setenv.sh``; SURVEY.md §2 "Experiment driver", §5 "Config/flag
system"). The reference's edit-the-python-file workflow becomes a JSON config
consumed by subcommands; reproducibility comes from the config dump into the
workdir (plus checkpoints + stats) instead of code cloning.

Usage:
    python -m percivaltts_tpu.cli demo --out corpus/ [--num 20]
    python -m percivaltts_tpu.cli compose --config cfg.json
    python -m percivaltts_tpu.cli train --config cfg.json
        [--resume] [--mesh] [--on-device-norm] [--device-corpus]
    python -m percivaltts_tpu.cli generate --config cfg.json
        [--checkpoint N | --latest] [--split test|valid] [--no-wav]
    python -m percivaltts_tpu.cli synth --config cfg.json labels/*.lab
    python -m percivaltts_tpu.cli measures --config cfg.json --ref D1 --pred D2
    python -m percivaltts_tpu.cli plot --config cfg.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

from percivaltts_tpu.config import Configuration
from percivaltts_tpu.utils.logging import print_log


def _load_config(path: str) -> Configuration:
    return Configuration.load(path)


def cmd_demo(args) -> int:
    from percivaltts_tpu.data.demo import generate_demo_corpus

    generate_demo_corpus(
        args.out,
        num_utterances=args.num,
        seed=args.seed,
        hard=getattr(args, "hard", False),
        jitter=getattr(args, "jitter", 0.0),
        speaker_f0=getattr(args, "speaker_f0", 0.0),
        encode_f0=getattr(args, "encode_f0", False),
        noise_snr_db=getattr(args, "noise_snr_db", 0.0),
        reverb_ms=getattr(args, "reverb_ms", 0.0),
    )
    # drop a ready-to-edit config SIZED FOR the miniature corpus (small
    # model, few epochs, f32 so it also runs quickly on CPU); production
    # configs should start from Configuration() defaults instead
    cfg = Configuration(workdir=os.path.join(args.out, "exp"))
    d = cfg.to_dict()
    d["data"].update(
        corpus_dir=args.out,
        fileids=os.path.join(args.out, "fileids.scp"),
        question_file=os.path.join(args.out, "questions.hed"),
        batch_size=4,
        bucket_bounds=[256],
        num_valid=max(args.num // 8, 1),
        num_test=max(args.num // 8, 1),
    )
    d["vocoder"].update(spec_size=33, nm_size=17)
    d["model"].update(generator="cnn", hidden_size=64, cnn_blocks=2,
                      critic_hidden=64, compute_dtype="float32")
    d["train"].update(trainer="lse", epochs=30, lr_gen=2e-3, patience=10,
                      checkpoint_every=5)
    cfg_path = os.path.join(args.out, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(d, f, indent=2, sort_keys=True)
    print_log(f"wrote {cfg_path}")
    return 0


def _compose(cfg: Configuration):
    import jax

    from percivaltts_tpu.data.compose import compose

    cache = os.path.join(cfg.workdir, "feature_cache")
    os.makedirs(cache, exist_ok=True)
    corpus = compose(cfg, cache_dir=cache)
    if jax.process_index() == 0:  # multi-host: one writer on shared workdirs
        corpus.save_stats(cfg.workdir)
    return corpus


def cmd_compose(args) -> int:
    cfg = _load_config(args.config)
    corpus = _compose(cfg)
    print_log(
        f"train/valid/test: {len(corpus.train)}/{len(corpus.valid)}/"
        f"{len(corpus.test)} utterances, label_dim={corpus.train.label_dim}, "
        f"feat_dim={corpus.train.feat_dim}"
    )
    return 0


def apply_preset(cfg: Configuration, name: str) -> Configuration:
    """Overlay a measured-best settings bundle on a config (sweep
    provenance in BASELINE.md): EMA'd generator weights for eval/export
    (test MCD 7.52 → 7.01 at equal budget), HBM-resident corpus, GV-aware
    best-checkpoint selection for measured WGAN runs (pure MCD
    anti-selects the adversarial objective), for WORLD runs the
    nm-derived voicing rule (matched soak test VUV 4.30% → 1.99% at
    identical MCD/GV), and for PML runs the prediction-path voicing
    calibration for the d4c_gd nm stream (test VUV 2.69% → 0.95% on the
    same checkpoint). Analysis defaults (psync-4, closed_loop=2) and
    critic_norm="none" are already the config defaults."""
    if name != "production":
        raise ValueError(f"unknown preset: {name!r}")
    import dataclasses

    tr = dict(ema_decay=0.995, device_corpus=True)
    if cfg.train.trainer == "wgan" and cfg.train.measures_every > 0:
        tr["best_metric"] = "mcd_gv"
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, **tr))
    if cfg.vocoder.kind == "world" and cfg.vocoder.vuv_rule == "stream":
        cfg = cfg.replace(
            vocoder=dataclasses.replace(cfg.vocoder, vuv_rule="bap")
        )
        tr["vocoder.vuv_rule"] = "bap"
    if cfg.vocoder.kind == "pml" and cfg.vocoder.vuv_pred_threshold is None:
        # prediction-path voicing calibrated for the d4c_gd nm stream
        # (matched soak test VUV 2.69% → 0.95%; see VocoderConfig)
        cfg = cfg.replace(
            vocoder=dataclasses.replace(
                cfg.vocoder, vuv_pred_low_frac=0.65, vuv_pred_threshold=0.60
            )
        )
        tr["vocoder.vuv_pred"] = "0.65/0.60"
    print_log(f"preset {name!r}: {tr}")
    return cfg


def cmd_train(args) -> int:
    if getattr(args, "distributed", False):
        from percivaltts_tpu.parallel import distributed as dist

        dist.initialize()
        print_log(f"distributed runtime: {dist.process_info()}")
        args.mesh = True
    cfg = _load_config(args.config)
    if getattr(args, "preset", None):
        cfg = apply_preset(cfg, args.preset)
    if getattr(args, "device_corpus", False):
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, device_corpus=True))
    on_device = getattr(args, "on_device_norm", False)
    from percivaltts_tpu.data.compose import compose

    cache = os.path.join(cfg.workdir, "feature_cache")
    os.makedirs(cache, exist_ok=True)
    corpus = compose(cfg, cache_dir=cache, normalize=not on_device)
    corpus.save_stats(cfg.workdir)
    from percivaltts_tpu.parallel import make_mesh
    from percivaltts_tpu.training import Trainer

    mesh = None
    if args.mesh:
        mesh = make_mesh(data_parallel=cfg.train.data_parallel)
        print_log(f"training on mesh {mesh}")
    if on_device and cfg.train.measures_every > 0:
        print_log(
            "WARNING: --on-device-norm disables objective-measure "
            "validation (measures_every) — the measures path needs "
            "host-normalized features"
        )
    trainer = Trainer(
        cfg,
        corpus.train,
        corpus.valid,
        mesh=mesh,
        in_stats=corpus.in_stats if on_device else None,
        out_stats=corpus.out_stats if on_device else None,
        # objective-measure validation (TrainConfig.measures_every) needs
        # the output stats to denormalize predictions; only meaningful for
        # the pre-normalized pipeline
        measures_stats=corpus.out_stats if not on_device else None,
    )
    if args.resume:
        trainer.resume()
    trainer.train()
    trainer.close()
    return 0


def cmd_generate(args) -> int:
    """Generation + objective measures from a checkpoint.

    Runs single-device by design (no ``--mesh``): the batched predict +
    vmapped synthesis path finishes the 25-utterance demo split in ~30 s on
    one chip, so the measures stage of a multi-chip training run simply
    falls back to one device — sharding it would save seconds and cost a
    second set of compile variants."""
    cfg = _load_config(args.config)
    corpus = _compose(cfg)
    from percivaltts_tpu.eval.generate import generate
    from percivaltts_tpu.training.checkpoints import CheckpointManager
    from percivaltts_tpu.training.state import abstract_gan_state

    state = abstract_gan_state(cfg, corpus.train.label_dim)
    ckpt = CheckpointManager(os.path.join(cfg.workdir, "checkpoints"))

    step = args.checkpoint
    if step is None:
        step = ckpt.latest_step() if args.latest else ckpt.best_step()
    print_log(f"generating from checkpoint step {step}")
    state = ckpt.restore(state, step)
    measures = generate(
        cfg,
        state,
        corpus.test if args.split == "test" else corpus.valid,
        corpus.out_stats,
        synthesize=not args.no_wav,
        save_features=args.save_features,
    )
    with open(os.path.join(cfg.workdir, "measures.json"), "w") as f:
        json.dump(measures, f, indent=2)
    return 0


def cmd_synth(args) -> int:
    """Pure inference: HTS label file(s) → synthesized wav, no acoustic
    targets needed (the reference's generation path applied to unseen
    labels). Uses the workdir's stats + best checkpoint."""
    cfg = _load_config(args.config)
    import glob as _glob

    import numpy as np

    from percivaltts_tpu.data.compose import save_wav
    from percivaltts_tpu.data.hts_labels import QuestionSet, binarize_label_file
    from percivaltts_tpu.data.normalize import NormStats
    from percivaltts_tpu.models.base import predict_batch
    from percivaltts_tpu.training.checkpoints import CheckpointManager
    from percivaltts_tpu.training.state import abstract_gan_state
    from percivaltts_tpu.vocoders import get_vocoder

    in_stats = NormStats.load(os.path.join(cfg.workdir, "in_stats.npz"))
    out_stats = NormStats.load(os.path.join(cfg.workdir, "out_stats.npz"))
    questions = QuestionSet.from_hed(cfg.data.question_file)
    voc = get_vocoder(cfg.vocoder)

    state = abstract_gan_state(cfg, in_stats.shift.shape[0])
    ckpt = CheckpointManager(os.path.join(cfg.workdir, "checkpoints"))

    step = ckpt.best_step()
    state = ckpt.restore(state, step)
    print_log(f"synthesizing from checkpoint step {step}")

    outdir = args.out or os.path.join(cfg.workdir, "synth")
    os.makedirs(outdir, exist_ok=True)
    paths = []
    for pattern in args.labels:
        paths.extend(sorted(_glob.glob(pattern)))
    if not paths:
        raise FileNotFoundError(f"no label files match {args.labels}")
    shift_sec = cfg.vocoder.shift_ms / 1000.0
    labs_n = [
        in_stats.normalize(binarize_label_file(p, questions, shift_sec)).astype(
            np.float32
        )
        for p in paths
    ]
    from percivaltts_tpu.training.state import eval_params

    preds_n = predict_batch(state.gen.apply_fn, eval_params(state), labs_n)
    preds = [out_stats.denormalize(p).astype(np.float32) for p in preds_n]
    wavs = voc.synthesize_batch(preds)
    for p, wav in zip(paths, wavs):
        uid = os.path.splitext(os.path.basename(p))[0]
        out_path = os.path.join(outdir, uid + ".wav")
        save_wav(out_path, cfg.vocoder.fs, wav)
        print_log(f"{p} → {out_path} ({len(wav) / cfg.vocoder.fs:.2f} s)")
    return 0


def cmd_export(args) -> int:
    """Export the trained generator as self-contained StableHLO serving
    artifacts (``jax.export``): raw-label frames in, denormalized vocoder
    features out, normalization + params folded into the graph. One
    artifact per bucket bound + a manifest; loadable model-code-free via
    ``eval.export.ExportedGenerator``. A TPU-native addition — the
    reference has no serving path (SURVEY.md §2)."""
    import numpy as np  # noqa: F401  (parity with sibling commands)

    from percivaltts_tpu.data.normalize import NormStats
    from percivaltts_tpu.eval.export import export_generator, write_export
    from percivaltts_tpu.training.checkpoints import CheckpointManager
    from percivaltts_tpu.training.state import abstract_gan_state, eval_params

    cfg = _load_config(args.config)
    in_stats = NormStats.load(os.path.join(cfg.workdir, "in_stats.npz"))
    out_stats = NormStats.load(os.path.join(cfg.workdir, "out_stats.npz"))
    label_dim = int(in_stats.shift.shape[0])

    state = abstract_gan_state(cfg, label_dim)
    ckpt = CheckpointManager(os.path.join(cfg.workdir, "checkpoints"))
    step = args.checkpoint if args.checkpoint is not None else ckpt.best_step()
    state = ckpt.restore(state, step)
    print_log(f"exporting generator from checkpoint step {step}")

    artifacts = export_generator(
        state.gen.apply_fn,
        eval_params(state),  # the EMA copy when the run carries one
        in_stats,
        out_stats,
        label_dim,
        cfg.data.bucket_bounds,
        batch=args.batch,
    )
    syn_artifacts = None
    if not getattr(args, "no_synth", False):
        from percivaltts_tpu.eval.export import export_synthesis
        from percivaltts_tpu.vocoders import get_vocoder

        voc = get_vocoder(cfg.vocoder)
        try:
            syn_artifacts = export_synthesis(
                voc, cfg.data.bucket_bounds, batch=args.batch
            )
            print_log(
                f"exported synthesis path ({cfg.vocoder.kind}, "
                f"closed_loop={cfg.vocoder.closed_loop}) at bounds "
                f"{sorted(syn_artifacts)}"
            )
        except NotImplementedError:
            print_log(
                f"vocoder {cfg.vocoder.kind!r} has no traced synthesis "
                "core; skipping synthesis artifacts"
            )
    outdir = args.out or os.path.join(cfg.workdir, "export")
    mpath = write_export(
        outdir,
        artifacts,
        label_dim,
        int(out_stats.shift.shape[0]),
        dataclasses.asdict(cfg.vocoder),
        batch=args.batch,
        syn_artifacts=syn_artifacts,
        hop=cfg.vocoder.shift_samples,
    )
    sizes = {b: len(d) for b, d in artifacts.items()}
    print_log(f"wrote {len(artifacts)} artifacts to {outdir} (bytes per bound: {sizes}); manifest {mpath}")
    return 0


def cmd_measures(args) -> int:
    """Objective measures between two directories of per-utterance feature
    files (headerless float32, reference-bit-compatible) — the parity gate
    tool: point --ref at features produced by the Keras reference and --pred
    at this framework's (BASELINE.md)."""
    import glob as _glob

    import numpy as np

    from percivaltts_tpu.eval.measures import f0_rmse, mcd, vuv_error
    from percivaltts_tpu.utils.fileio import load_binary_file
    from percivaltts_tpu.vocoders import get_vocoder

    cfg = _load_config(args.config)
    voc = get_vocoder(cfg.vocoder)
    dim = voc.feature_size
    ref_files = {
        os.path.basename(p): p
        for p in _glob.glob(os.path.join(args.ref, "*" + args.ext))
    }
    if not ref_files:
        raise FileNotFoundError(f"no {args.ext} files in {args.ref}")
    mcds, f0s, vuvs, matched = [], [], [], 0
    for name, rp in sorted(ref_files.items()):
        pp = os.path.join(args.pred, name)
        if not os.path.exists(pp):
            continue
        matched += 1
        ref = load_binary_file(rp, dim)
        pred = load_binary_file(pp, dim)
        n = min(len(ref), len(pred))
        mcds.append(float(mcd(voc.cepstra(pred[:n]), voc.cepstra(ref[:n]))))
        try:
            f0p, vp = voc.f0_vuv_pred(pred[:n])
            f0r, vr = voc.f0_vuv(ref[:n])
            f0s.append(float(f0_rmse(f0p, f0r, vp, vr)))
            vuvs.append(float(vuv_error(vp, vr)))
        except NotImplementedError:
            pass
    if not matched:
        raise FileNotFoundError(
            f"no files in {args.pred} match the names in {args.ref}"
        )
    out = {"files": matched, "mcd_db": float(np.mean(mcds))}
    if f0s:
        out["f0_rmse_hz"] = float(np.mean(f0s))
        out["vuv_error_pct"] = float(np.mean(vuvs))
    print(json.dumps(out, indent=2))
    return 0


def cmd_plot(args) -> int:
    from percivaltts_tpu.utils.curves import plot_curves

    cfg = _load_config(args.config)
    out = plot_curves(os.path.join(cfg.workdir, "metrics.jsonl"))
    print_log(f"wrote {out}")
    return 0


def main(argv=None) -> int:
    from percivaltts_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="percivaltts-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pd = sub.add_parser("demo", help="generate the synthetic demo corpus")
    pd.add_argument("--out", required=True)
    pd.add_argument("--num", type=int, default=20)
    pd.add_argument("--seed", type=int, default=1234)
    pd.add_argument(
        "--hard",
        action="store_true",
        help="stress corpus: plosive bursts, silence clicks, wide f0, "
        "amplitude dynamics",
    )
    pd.add_argument(
        "--jitter",
        type=float,
        default=0.0,
        help="one-to-many corpus: per-phone-instance formant jitter "
        "(e.g. 0.12 = ±12%% unlabeled formant shifts), the regime where "
        "LSE must over-smooth and a critic has variance to restore",
    )
    pd.add_argument(
        "--speaker-f0",
        type=float,
        default=0.0,
        dest="speaker_f0",
        help="single-speaker corpus: pin every utterance's base f0 (Hz), "
        "making the f0 contour label-predictable (the default draws an "
        "unlabeled per-utterance f0, leaving ~30 Hz of F0 RMSE "
        "irreducible — see BASELINE.md)",
    )
    pd.add_argument(
        "--encode-f0",
        action="store_true",
        dest="encode_f0",
        help="write each utterance's base f0 into the labels (&<hz>! "
        "context suffix + CQS F0_Base question) — the corpus-realism "
        "equivalent of speaker/prosody features; makes F0 RMSE "
        "model-limited instead of corpus-limited",
    )
    pd.add_argument(
        "--noise-snr-db",
        type=float,
        default=0.0,
        dest="noise_snr_db",
        help="acoustic stressor: additive background noise at this SNR (dB)",
    )
    pd.add_argument(
        "--reverb-ms",
        type=float,
        default=0.0,
        dest="reverb_ms",
        help="acoustic stressor: synthetic room reverb tail of this length",
    )
    pd.set_defaults(fn=cmd_demo)

    pc = sub.add_parser("compose", help="compose corpus features + stats")
    pc.add_argument("--config", required=True)
    pc.set_defaults(fn=cmd_compose)

    pt = sub.add_parser("train", help="train (compose first if needed)")
    pt.add_argument("--config", required=True)
    pt.add_argument("--resume", action="store_true")
    pt.add_argument("--mesh", action="store_true", help="train data-parallel over all devices")
    pt.add_argument(
        "--distributed", action="store_true",
        help="join the JAX distributed runtime for multi-host training "
        "(coordinator/process args from JAX_COORDINATOR_ADDRESS / "
        "JAX_NUM_PROCESSES / JAX_PROCESS_ID, or auto-discovered on TPU "
        "pods); implies --mesh over the global device set",
    )
    pt.add_argument(
        "--on-device-norm", action="store_true", dest="on_device_norm",
        help="apply normalization on device inside the jitted step (raw features ship to HBM)",
    )
    pt.add_argument(
        "--device-corpus", action="store_true", dest="device_corpus",
        help="keep the padded training corpus resident in HBM and gather "
        "batches on device (overrides TrainConfig.device_corpus)",
    )
    pt.add_argument(
        "--preset", choices=("production",), default=None,
        help="overlay a measured-best settings bundle on the config "
        "(production: generator EMA 0.995, HBM-resident corpus, GV-aware "
        "best-checkpoint selection for WGAN runs — see README 'Recommended "
        "recipe'); explicit config values for these fields are overridden, "
        "and the full effective config is dumped to the workdir as always",
    )
    pt.set_defaults(fn=cmd_train)

    pm = sub.add_parser(
        "measures",
        help="objective measures between two feature-file directories (parity gate)",
    )
    pm.add_argument("--config", required=True)
    pm.add_argument("--ref", required=True, help="reference feature dir")
    pm.add_argument("--pred", required=True, help="predicted feature dir")
    pm.add_argument("--ext", default=".cmp", help="feature file extension")
    pm.set_defaults(fn=cmd_measures)

    ps = sub.add_parser("synth", help="synthesize wavs from HTS label files (pure inference)")
    ps.add_argument("--config", required=True)
    ps.add_argument("--out", default=None)
    ps.add_argument("labels", nargs="+", help="label file paths or globs")
    ps.set_defaults(fn=cmd_synth)

    px = sub.add_parser(
        "export",
        help="export the generator as StableHLO serving artifacts (jax.export)",
    )
    px.add_argument("--config", required=True)
    px.add_argument("--out", default=None, help="output dir (default <workdir>/export)")
    px.add_argument("--checkpoint", type=int, default=None)
    px.add_argument(
        "--batch", type=int, default=1,
        help="rows per artifact call (1 = latency serving; >1 = throughput "
        "serving — utterances are packed batch rows per call)",
    )
    px.add_argument(
        "--no-synth", action="store_true", dest="no_synth",
        help="skip the vocoder-reconstruction (features→waveform) "
        "artifacts — export only labels→features",
    )
    px.set_defaults(fn=cmd_export)

    pp = sub.add_parser("plot", help="plot training curves from metrics.jsonl")
    pp.add_argument("--config", required=True)
    pp.set_defaults(fn=cmd_plot)

    pg = sub.add_parser("generate", help="generate features/wavs + measures")
    pg.add_argument("--config", required=True)
    pg.add_argument("--checkpoint", type=int, default=None)
    pg.add_argument(
        "--latest", action="store_true",
        help="generate from the latest checkpoint instead of the best-validation one",
    )
    pg.add_argument("--split", choices=("test", "valid"), default="test")
    pg.add_argument("--no-wav", action="store_true")
    pg.add_argument("--save-features", action="store_true")
    pg.set_defaults(fn=cmd_generate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
