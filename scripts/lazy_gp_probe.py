#!/usr/bin/env python
"""Lazy-GP probe: fused WGAN-GP step time vs TrainConfig.gp_every.

StyleGAN2-style lazy regularization transplanted to the WGAN-GP critic
loop: the GP double-backprop runs only on every K-th of the n_critic
unrolled critic updates, with lambda scaled by K (training/wgan.py). This
measures the STEP-TIME side only; a quality soak (scripts/final_soak.py
with PRESET/gp_every) must qualify any winner before adoption.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/lazy_gp_probe.py [K ...]
"""

import sys
import time

import numpy as np

L, B, T, NC = 425, 32, 512, 5


def bench_one(gp_every: int) -> dict:
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
        model=ModelConfig(generator="cnn_blstm"),
        train=TrainConfig(trainer="wgan", n_critic=NC, gp_every=gp_every),
    )
    F = cfg.vocoder.feature_size
    state = make_gan_state(cfg, L)
    rng = np.random.default_rng(0)

    def batch(lead=()):
        return {
            "lab": jax.numpy.asarray(rng.normal(size=lead + (B, T, L)).astype(np.float32)),
            "cmp": jax.numpy.asarray(rng.normal(size=lead + (B, T, F)).astype(np.float32)),
            "mask": jax.numpy.asarray(np.ones(lead + (B, T), np.float32)),
            "lengths": jax.numpy.asarray(np.full(lead + (B,), T, np.int32)),
        }

    step = jax.jit(make_wgan_step(cfg.train), donate_argnums=(0,))
    args = (batch((NC,)), batch())

    def hard_sync(s):
        return float(jax.tree.leaves(s.gen.params)[0].sum())

    state, m = step(state, *args)
    hard_sync(state)
    for _ in range(3):
        state, m = step(state, *args)
    hard_sync(state)

    chunk_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        n = 40
        for _ in range(n):
            state, m = step(state, *args)
        hard_sync(state)
        chunk_times.append((time.perf_counter() - t0) / n)
    dt = float(np.median(chunk_times))

    try:
        ca = step.lower(state, *args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    gp_metric = float(m["gp"])
    return {
        "gp_every": gp_every,
        "ms_per_step": round(dt * 1e3, 2),
        "frames_per_sec": round(B * T * (NC + 1) / dt, 1),
        "gflops_per_step": round(flops / 1e9, 1),
        "mfu_pct": round(100.0 * flops / dt / 197e12, 2),
        "gp_metric": round(gp_metric, 4),
    }


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 5]
    from percivaltts_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    for k in ks:
        print(bench_one(k), flush=True)


if __name__ == "__main__":
    main()
