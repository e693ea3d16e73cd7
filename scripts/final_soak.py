"""Round-3 final integration soak: WGAN-GP on the demo corpus at
production-ish scale, MCD-selected checkpoint, generation + objective
measures through the closed-loop vocoder.

Run (TPU): PYTHONPATH=.:$PYTHONPATH python scripts/final_soak.py [root] [epochs] [n_utts] [hard]
"""

import json
import os
import subprocess
import sys

from percivaltts_tpu.config import (
    Configuration,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)
from percivaltts_tpu.utils.logging import print_log


def main(
    root: str = "/tmp/soak_r3",
    epochs: int = 40,
    n_utts: int = 400,
    hard: int = 0,
):
    from percivaltts_tpu.data.demo import generate_demo_corpus

    corpus = os.path.join(root, "corpus")
    if not os.path.isdir(os.path.join(corpus, "wav")):
        generate_demo_corpus(
            corpus,
            num_utterances=n_utts,
            fs=16000,
            seed=777,
            hard=bool(hard),
            # the most slt-arctic-like regime (speaker f0 + realization
            # jitter) for production-recipe demonstrations; 0/0 = the
            # classic friendly soak corpus
            jitter=float(os.environ.get("JITTER", "0")),
            speaker_f0=float(os.environ.get("SPK_F0", "0")),
            # ENC_F0=1: write each utterance's base-f0 draw into the labels
            # (CQS F0_Base) — the round-5 corpus-realism axis that removes
            # the measured ~30 Hz label-unencoded F0 floor (BASELINE.md
            # "attribution CLOSED"); F0 RMSE becomes model-limited
            encode_f0=bool(int(os.environ.get("ENC_F0", "0"))),
            noise_snr_db=float(os.environ.get("NOISE_SNR", "0")),
            reverb_ms=float(os.environ.get("REVERB_MS", "0")),
        )

    cfg = Configuration(
        workdir=os.path.join(root, "exp"),
        data=DataConfig(
            corpus_dir=corpus,
            question_file=os.path.join(corpus, "questions.hed"),
            fileids=os.path.join(corpus, "fileids.scp"),
            num_valid=25,
            num_test=25,
            batch_size=16,
            bucket_bounds=(256,),
            label_dim=0,
        ),
        vocoder=VocoderConfig(
            kind=os.environ.get("VOC_KIND", "pml"),
            fs=16000,
            spec_size=33,
            nm_size=17,
        ),
        model=ModelConfig(
            generator="cnn_blstm",
            # GEN_HIDDEN: capacity-attack knob for the pred-budget's
            # exposed model term (round 5) — generator width only, critic
            # fixed (widening the critic measured as a step-time loss,
            # BASELINE.md critic_arch_probe row)
            hidden_size=int(os.environ.get("GEN_HIDDEN", "256")),
            blstm_size=int(os.environ.get("GEN_HIDDEN", "256")),
            cnn_blocks=3,
            critic_channels=32,
            critic_blocks=4,
            critic_hidden=256,
            critic_norm=os.environ.get("CRITIC_NORM", "layer"),
        ),
        train=TrainConfig(
            # TRAINER=lse: matched LSE arm for the pred-budget attribution
            # (same corpus/recipe/selection; isolates the WGAN dispersion
            # premium from model capability vs the label-oracle floor)
            trainer=os.environ.get("TRAINER", "wgan"),
            epochs=epochs,
            steps_per_epoch=50,
            lse_weight=0.25,
            stream_weights=(
                (("f0", 8.0), ("vuv", 4.0), ("spec", 1.0), ("bap", 1.0))
                if os.environ.get("VOC_KIND", "pml") == "world"
                else (("f0", 8.0), ("spec", 1.0), ("nm", 1.0))
            ),
            checkpoint_every=5,
            keep_checkpoints=2,
            measures_every=5,
            best_metric="mcd",
            patience=10**6,
            device_corpus=True,
            ema_decay=float(os.environ.get("EMA_DECAY", "0")),
            # lazy-GP qualification knob (scripts/lazy_gp_probe.py measures
            # the step-time side; this soak measures the quality side)
            gp_every=int(os.environ.get("GP_EVERY", "1")),
            # TTUR-style arm: fewer critic updates per outer step with the
            # critic LR scaled up (Heusel et al. 2017 two-timescale rule) —
            # 1.44x wall-clock per outer step at n_critic=3 if quality holds
            # (measured: the n_critic sweep's fused wall at nc=1/3/5 =
            # 10.1/16.9/24.4 ms, BASELINE.md "In-schedule critic update
            # cost" row — 24.4/16.9 = 1.44x)
            n_critic=int(os.environ.get("N_CRITIC", "5")),
            # BOUNDARY_W: transition-weighted LSE probe of the budget's
            # near-boundary term (TrainConfig.boundary_weight)
            boundary_weight=float(os.environ.get("BOUNDARY_W", "0")),
            lr_critic=float(os.environ.get("LR_CRITIC", "1e-4")),
            seed=321,
        ),
    )

    from percivaltts_tpu.cli import cmd_generate, cmd_train

    class A:
        config = None
        resume = False
        mesh = False
        distributed = False
        on_device_norm = False
        device_corpus = True
        checkpoint = None
        latest = False
        split = "test"
        no_wav = False
        save_features = False
        # PRESET=production drives the documented recommended recipe
        # (cli train --preset production) end-to-end at soak scale
        preset = os.environ.get("PRESET") or None

    os.makedirs(cfg.workdir, exist_ok=True)
    cfgpath = os.path.join(cfg.workdir, "config.json")
    with open(cfgpath, "w") as f:
        json.dump(cfg.to_dict(), f)
    A.config = cfgpath
    # analysis on CPU in a subprocess (see scripts/gan_study.py rationale)
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys; from percivaltts_tpu.cli import main;"
            f"sys.exit(main(['compose', '--config', {cfgpath!r}]))",
        ],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        check=True,
    )
    cmd_train(A)
    import time

    t0 = time.time()
    cmd_generate(A)
    print_log(f"generation stage (incl. closed-loop synthesis): {time.time()-t0:.1f} s")
    with open(os.path.join(cfg.workdir, "measures.json")) as f:
        m = json.load(f)
    print_log(f"final soak measures: {m}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if len(a) > 0 else "/tmp/soak_r3",
        int(a[1]) if len(a) > 1 else 40,
        int(a[2]) if len(a) > 2 else 400,
        int(a[3]) if len(a) > 3 else 0,
    )
