"""End-to-end trainer throughput at the headline shape: the FULL Trainer
(input pipeline, device corpus, metrics, checkpoint plumbing) rather than
bench.py's hard-synced bare step — the number that shows epoch-level
dispatch pipelining overlapping host work with device steps.

Run (TPU): PYTHONPATH=.:$PYTHONPATH python scripts/e2e_throughput.py [n_utts] [epochs]
"""

import json
import sys
import tempfile

import numpy as np


def main(n_utts: int = 800, epochs: int = 5):
    from percivaltts_tpu.config import (
        Configuration,
        DataConfig,
        ModelConfig,
        TrainConfig,
        VocoderConfig,
    )
    from percivaltts_tpu.data.dataset import Dataset
    from percivaltts_tpu.training import Trainer

    L, B, T, NC = 425, 32, 512, 5  # bench.py headline shape
    rng = np.random.default_rng(0)
    lens = rng.integers(T // 2, T, size=n_utts)
    labs = [rng.normal(size=(n, L)).astype(np.float32) for n in lens]
    F = 1 + 65 + 33
    cmps = [rng.normal(size=(n, F)).astype(np.float32) for n in lens]
    train = Dataset(labs[: n_utts - 32], cmps[: n_utts - 32])
    valid = Dataset(labs[n_utts - 32 :], cmps[n_utts - 32 :])

    workdir = tempfile.mkdtemp(prefix="e2e_tp_")
    cfg = Configuration(
        workdir=workdir,
        data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
        vocoder=VocoderConfig(spec_size=65, nm_size=33),
        model=ModelConfig(generator="cnn_blstm"),
        train=TrainConfig(
            trainer="wgan",
            n_critic=NC,
            epochs=epochs,
            steps_per_epoch=48,
            device_corpus=True,
            checkpoint_every=10**6,
            measures_every=0,
            patience=10**6,
        ),
    )
    t = Trainer(cfg, train, valid)
    t.train()
    t.close()
    fps = [
        json.loads(l)["frames_per_sec"]
        for l in open(f"{workdir}/metrics.jsonl")
        if '"epoch"' in l and "frames_per_sec" in l
    ]
    # first epoch pays compile; report the rest
    rest = fps[1:] or fps
    print(
        f"end-to-end frames/sec over {len(rest)} post-compile epochs: "
        f"median {np.median(rest)/1e6:.2f} M  min {min(rest)/1e6:.2f} M  "
        f"max {max(rest)/1e6:.2f} M"
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 800, int(a[1]) if len(a) > 1 else 5)
