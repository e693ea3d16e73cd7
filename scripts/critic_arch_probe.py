#!/usr/bin/env python
"""Critic-architecture probe (VERDICT round-3 weak #4 / item 5): the
headline step's critic forward is deep/skinny and bandwidth-bound
(3.01 ms at 3.2% MFU, BASELINE.md breakdown). A/B the fused WGAN-GP
step time across iso-parameter critic shapes at the same total time
stride (2^((blocks+1)//2) = 4 for blocks in {3,4}):

  base        blocks=4 hidden=256   (the headline critic)
  wide3       blocks=3 hidden=296   (one fewer conv, ~iso conv params)
  wide3k7     blocks=3 hidden=280 k=7 (iso-params via wider taps)

Run: python scripts/critic_arch_probe.py [B] [T] [arms]
Quality is judged separately by a 2000-step soak of any step-time winner
(scripts/final_soak.py with CRITIC_BLOCKS/CRITIC_HIDDEN env).
"""
import sys
import time

import numpy as np


def main(B=32, T=512, arms="base,wide3,wide3k7"):
    import jax

    from percivaltts_tpu.config import (
        Configuration, DataConfig, ModelConfig, TrainConfig, VocoderConfig,
    )
    from percivaltts_tpu.training.state import make_gan_state
    from percivaltts_tpu.training.wgan import make_wgan_step
    from percivaltts_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    L, NC = 425, 5
    SHAPES = {
        "base": dict(critic_blocks=4, critic_hidden=256),
        "wide3": dict(critic_blocks=3, critic_hidden=296),
        "wide3k7": dict(critic_blocks=3, critic_hidden=280, critic_kernel=7),
        "wide2": dict(critic_blocks=2, critic_hidden=360),
    }
    rng = np.random.default_rng(0)
    out = {}
    for arm in arms.split(","):
        kw = dict(SHAPES[arm])
        kernel = kw.pop("critic_kernel", 5)
        cfg = Configuration(
            data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
            vocoder=VocoderConfig(spec_size=65, nm_size=33),
            model=ModelConfig(generator="cnn_blstm", critic_kernel=kernel, **kw),
            train=TrainConfig(trainer="wgan", n_critic=NC),
        )
        F = cfg.vocoder.feature_size
        state = make_gan_state(cfg, L)
        n_par = sum(x.size for x in jax.tree.leaves(state.critic.params))

        def batch(lead=()):
            return {
                "lab": jax.numpy.asarray(rng.normal(size=lead + (B, T, L)).astype(np.float32)),
                "cmp": jax.numpy.asarray(rng.normal(size=lead + (B, T, F)).astype(np.float32)),
                "mask": jax.numpy.asarray(np.ones(lead + (B, T), np.float32)),
                "lengths": jax.numpy.asarray(np.full(lead + (B,), T, np.int32)),
            }

        step_args = (batch((NC,)), batch())
        step = jax.jit(make_wgan_step(cfg.train), donate_argnums=(0,))
        state, m = step(state, *step_args)
        float(jax.tree.leaves(state.gen.params)[0].sum())
        for _ in range(3):
            state, m = step(state, *step_args)
        float(jax.tree.leaves(state.gen.params)[0].sum())
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(40):
                state, m = step(state, *step_args)
            float(jax.tree.leaves(state.gen.params)[0].sum())
            times.append((time.perf_counter() - t0) / 40)
        dt = float(np.median(times))
        fps = B * T * (NC + 1) / dt
        out[arm] = (dt, fps, n_par)
        print(
            f"{arm:>8}: {dt*1e3:6.2f} ms/step, {fps/1e6:5.2f} M frames/s, "
            f"critic params {n_par/1e6:.3f} M",
            flush=True,
        )
    base = out.get("base")
    if base:
        for arm, (dt, fps, n) in out.items():
            print(f"{arm:>8}: {100*(base[0]-dt)/base[0]:+.1f}% step time vs base", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 32, int(a[1]) if len(a) > 1 else 512,
         a[2] if len(a) > 2 else "base,wide3,wide3k7")
