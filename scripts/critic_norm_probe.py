#!/usr/bin/env python
"""A/B the critic normalization on the fused headline step.

The round-3 step breakdown (scripts/step_breakdown.py) shows one critic
forward at 3.2% MFU — deep/skinny and bandwidth-bound — and the layer
norms are pure HBM-bound elementwise passes. ``critic_norm="none"``
already exists in ModelConfig (the reference's critic is plain convs per
WGAN-GP practice); this times the fused outer step under both settings.
Speed alone doesn't decide the default: layer norm is the WGAN-GP paper's
recommended critic normalization, so any switch also needs a stability
soak (see BASELINE.md for the recorded outcome).

Run on TPU: PYTHONPATH=.:$PYTHONPATH python scripts/critic_norm_probe.py
"""

import dataclasses
import time

import numpy as np

B, T, L, NC = 32, 512, 425, 5


def bench_step(critic_norm: str) -> float:
    import jax

    from percivaltts_tpu.config import (
        Configuration,
        DataConfig,
        ModelConfig,
        TrainConfig,
        VocoderConfig,
    )
    from percivaltts_tpu.training.state import make_gan_state
    from percivaltts_tpu.training.wgan import make_wgan_step

    cfg = Configuration(
        data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
        vocoder=VocoderConfig(spec_size=65, nm_size=33),
        model=ModelConfig(generator="cnn_blstm", critic_norm=critic_norm),
        train=TrainConfig(trainer="wgan", n_critic=NC),
    )
    F = cfg.vocoder.feature_size
    state = make_gan_state(cfg, L)
    rng = np.random.default_rng(0)

    def batch(lead=()):
        return {
            "lab": jax.numpy.asarray(
                rng.normal(size=lead + (B, T, L)).astype(np.float32)
            ),
            "cmp": jax.numpy.asarray(
                rng.normal(size=lead + (B, T, F)).astype(np.float32)
            ),
            "mask": jax.numpy.asarray(np.ones(lead + (B, T), np.float32)),
            "lengths": jax.numpy.asarray(np.full(lead + (B,), T, np.int32)),
        }

    step_args = (batch((NC,)), batch())
    step = jax.jit(make_wgan_step(cfg.train), donate_argnums=(0,))

    def hard_sync(s):
        return float(jax.tree.leaves(s.gen.params)[0].sum())

    state, m = step(state, *step_args)
    hard_sync(state)
    for _ in range(3):
        state, m = step(state, *step_args)
    hard_sync(state)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = step(state, *step_args)
        hard_sync(state)
        times.append((time.perf_counter() - t0) / 20)
    return float(np.median(times))


def main():
    for norm in ("layer", "none"):
        ms = bench_step(norm) * 1e3
        fps = NC * B * T / (ms / 1e3) + B * T / (ms / 1e3) * 0  # frames/outer
        fps = (NC + 1) * B * T / (ms / 1e3)
        print(f"critic_norm={norm:5s}: {ms:.2f} ms/step, {fps/1e6:.2f} M frames/s")


if __name__ == "__main__":
    main()
