"""One-command reference-parity readiness (VERDICT round-4 item 4).

Chains the whole parity pass:

  1. ``scripts/ref_checklist.py`` against ``REF_ROOT`` (skipped with a
     note while the mount is empty — every round so far),
  2. archive → Merlin-layout normalization (``data/fetch.py``; the
     download leg is unusable in this zero-egress environment, so the
     archive comes from ``--archive`` or ``--fabricate``),
  3. compose (CPU subprocess, same rationale as scripts/final_soak.py),
  4. config-3 training (CNN+BLSTM + WGAN-GP, production preset),
  5. generation + objective measures on the held-out test split,
  6. a filled parity table written to ``<root>/parity_report.md`` with
     this framework's rows, the reference rows left as the documented
     fill-in procedure (``cli measures --ref <dir-of-reference-.cmp>``)
     until the reference itself can run somewhere,

with per-stage wall-clock and peak-RSS pinned in the report (the
dry-run's purpose: know the cost of the real run before it exists).

Fabricated full-scale dry run (no reference archive needed):

  PYTHONPATH=. python scripts/parity.py --fabricate 1100 --root /tmp/parity

builds an archive shaped like slt_arctic_merlin_full — ≈1100 utterances,
nested Merlin directory layout, state-aligned labels, and a 416-question
``.hed`` (416 questions + 9 frame features = the reference's label
dim 425) padded with never-matching Merlin-style questions — then runs
the full chain on it.

Real-archive run: scripts/parity.py --archive /path/to/corpus.tar.gz
Make target: ``make parity [ARCHIVE=...] [FABRICATE=N] [EPOCHS=N]``
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import tarfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(f"[parity] {msg}", flush=True)


def fabricate_archive(root: str, n_utts: int, seed: int = 424) -> str:
    """Build a full-scale stand-in for slt_arctic_merlin_full: demo
    corpus at scale (single speaker f0=160 + realization jitter — the
    most slt-like regime, BASELINE.md study rows), questions padded to
    the Merlin question count (416), nested directory layout to exercise
    fetch.py's discovery."""
    from percivaltts_tpu.data.demo import generate_demo_corpus

    stage = os.path.join(root, "fab_stage")
    inner = os.path.join(
        stage, "slt_arctic_full_data", "merlin_baseline_practice", "acoustic_data"
    )
    os.makedirs(inner, exist_ok=True)
    generate_demo_corpus(
        inner, num_utterances=n_utts, fs=16000, seed=seed,
        speaker_f0=160.0, jitter=0.12,
    )
    # pad the question set to the Merlin count with never-matching
    # questions of the real set's flavor (dim 416 + 9 frame feats = 425)
    qf = os.path.join(inner, "questions.hed")
    with open(qf) as f:
        base = [line for line in f.read().splitlines() if line.strip()]
    pad = []
    i = 0
    while len(base) + len(pad) < 416:
        pad.append(f'QS "C-Merlin_Pad{i}" {{*-padphone{i}+*}}')
        i += 1
    with open(qf, "w") as f:
        f.write("\n".join(base + pad) + "\n")
    archive = os.path.join(root, "slt_arctic_fabricated.tar.gz")
    log(f"packing {n_utts}-utt fabricated archive (416-question .hed) ...")
    with tarfile.open(archive, "w:gz", compresslevel=1) as tar:
        tar.add(stage, arcname="slt_arctic_full_data")
    import shutil

    shutil.rmtree(stage)
    return archive


def run_stage(name, argv, timings, env=None):
    t0 = time.time()
    r = subprocess.run(argv, env=env or os.environ.copy())
    if r.returncode != 0:
        log(f"stage {name!r} FAILED (exit {r.returncode})")
        sys.exit(r.returncode)
    timings[name] = round(time.time() - t0, 1)
    log(f"stage {name}: {timings[name]} s")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root", default="/tmp/parity")
    p.add_argument("--archive", default=None, help="reference corpus .tar.gz")
    p.add_argument(
        "--fabricate", type=int, default=0,
        help="build an N-utterance fabricated full-scale archive instead",
    )
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument(
        "--steps", type=int, default=50,
        help="steps per epoch (lower for a CPU mechanics dry run)",
    )
    p.add_argument("--num-valid", type=int, default=50)
    p.add_argument("--num-test", type=int, default=50)
    p.add_argument(
        "--ref-feats", default=None,
        help="directory of reference-produced .cmp feature files — fills "
        "the reference rows via `cli measures`",
    )
    a = p.parse_args()
    os.makedirs(a.root, exist_ok=True)
    timings: dict = {}
    report_rows: dict = {}

    # 1. checklist (informational; mount empty -> prints and moves on)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ref_checklist.py")]
    )
    timings["ref_checklist"] = round(time.time() - t0, 1)
    report_rows["ref_mount"] = "populated" if r.returncode == 0 else "ABSENT (checklist skipped)"

    # 2. archive -> corpus
    archive = a.archive
    if a.fabricate:
        archive = fabricate_archive(a.root, a.fabricate)
    if archive is None:
        log("no --archive and no --fabricate: nothing to run on. "
            "For the dry run: --fabricate 1100")
        return 2
    corpus = os.path.join(a.root, "corpus")
    env_cpu = {**os.environ, "JAX_PLATFORMS": "cpu"}
    run_stage(
        "fetch_normalize",
        [sys.executable, "-m", "percivaltts_tpu.data.fetch", corpus,
         "--archive", archive],
        timings, env=env_cpu,
    )

    # 3. config 3 (BASELINE.json benchmark config: CNN+BLSTM generator,
    # WGAN-GP with LSE mixing, PML features at full resolution)
    with open(os.path.join(corpus, "fileids.scp")) as f:
        n_utts = sum(1 for line in f if line.strip())
    label_dir = next(
        d for d in ("label_state_align", "label_phone_align", "labels")
        if os.path.isdir(os.path.join(corpus, d))
    )
    cfg = {
        "workdir": os.path.join(a.root, "exp"),
        "data": {
            "corpus_dir": corpus,
            "label_dir": label_dir,
            "question_file": os.path.join(corpus, "questions.hed"),
            "fileids": os.path.join(corpus, "fileids.scp"),
            "num_valid": a.num_valid,
            "num_test": a.num_test,
            "batch_size": 16,
            "bucket_bounds": [256],
        },
        "vocoder": {"kind": "pml", "fs": 16000, "spec_size": 65, "nm_size": 33},
        "model": {
            "generator": "cnn_blstm", "hidden_size": 256, "blstm_size": 256,
            "cnn_blocks": 3, "critic_channels": 32, "critic_blocks": 4,
            "critic_hidden": 256,
        },
        "train": {
            "trainer": "wgan", "epochs": a.epochs, "steps_per_epoch": a.steps,
            "lse_weight": 0.25,
            "stream_weights": [["f0", 8.0], ["spec", 1.0], ["nm", 1.0]],
            "checkpoint_every": 5, "keep_checkpoints": 2,
            "measures_every": 5, "best_metric": "mcd",
            "patience": 1000000, "seed": 321,
        },
    }
    os.makedirs(cfg["workdir"], exist_ok=True)
    cfgpath = os.path.join(cfg["workdir"], "config.json")
    with open(cfgpath, "w") as f:
        json.dump(cfg, f, indent=2)

    cli = [sys.executable, "-m", "percivaltts_tpu.cli"]
    run_stage("compose", cli + ["compose", "--config", cfgpath], timings, env=env_cpu)
    run_stage(
        "train_config3",
        cli + ["train", "--config", cfgpath, "--preset", "production"],
        timings,
    )
    run_stage("generate", cli + ["generate", "--config", cfgpath], timings)

    with open(os.path.join(cfg["workdir"], "measures.json")) as f:
        m = json.load(f)

    # 5. reference rows, if reference features exist
    ref_rows = "not measurable: reference mount empty and no --ref-feats"
    if a.ref_feats:
        run_stage(
            "measures_vs_reference",
            cli + ["measures", "--config", cfgpath, "--ref", a.ref_feats,
                   "--pred", os.path.join(cfg["workdir"], "generated")],
            timings,
        )
        ref_rows = "see measures stage output above"

    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    child_rss_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024
    report = os.path.join(a.root, "parity_report.md")
    with open(report, "w") as f:
        f.write(f"""# Parity run report

corpus: {archive} ({n_utts} utterances; label_dir={label_dir})
reference mount: {report_rows['ref_mount']}

| metric | percivaltts_tpu | reference | target |
|---|---|---|---|
| MCD (dB, test) | {m.get('mcd_db', float('nan')):.3f} | {ref_rows} | within 0.1 dB |
| F0 RMSE (Hz) | {m.get('f0_rmse_hz', float('nan')):.2f} | — | parity |
| VUV error (%) | {m.get('vuv_error_pct', float('nan')):.2f} | — | parity |
| GV ratio | {m.get('gv_ratio', float('nan')):.3f} | — | ≈1 |
| ms_ratio_hi | {m.get('ms_ratio_hi', float('nan')):.3f} | — | ≈1 |

Stage wall-clock (s): {json.dumps(timings)}
Peak RSS: driver {peak_rss_mb:.0f} MB, largest child {child_rss_mb:.0f} MB

To fill the reference column once the reference can run anywhere:
1. run its generation stage on the same corpus/test split; keep the
   predicted feature files (float32 .cmp, dim {65 + 33 + 1})
2. rerun with --ref-feats <that dir> (or directly:
   `cli measures --config {cfgpath} --ref <dir> --pred {os.path.join(cfg['workdir'], 'generated')}`)
""")
    log(f"report written to {report}")
    print(open(report).read())
    return 0


if __name__ == "__main__":
    sys.exit(main())
