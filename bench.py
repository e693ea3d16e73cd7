#!/usr/bin/env python
"""Headline benchmark: WGAN-GP training throughput, frames/sec/chip.

Runs the full Percival-default configuration (BASELINE.md config 3: CNN+BLSTM
generator, convolutional critic, WGAN-GP with LSE mixing, PML feature dims —
label_dim 425, cmp 99 = 1 lf0 + 65 spec + 33 nm, 5 ms frames) as the single
fused jitted step on whatever accelerator JAX exposes (the driver runs this
on one real TPU chip).

Throughput definition: one outer step consumes ``n_critic`` critic batches +
1 generator batch; frames/sec = B·T·(n_critic+1) / median step time, divided
by the number of chips used (1 here).

``vs_baseline``: the reference (Keras percivaltts) publishes no numbers and
its mount was empty (BASELINE.md); the recorded baseline is this framework's
own fused step executed on the host CPU (the reference's native hardware
class), measured once on this machine — see CPU_BASELINE_* below. The
north-star target is ≥10× CPU (BASELINE.json).
"""

import json
import time

import numpy as np

# CPU anchor: the same WGAN-GP step (same layer sizes) implemented in torch
# eager f32 on the host CPU — the reference's hardware class and execution
# style. Measured by scripts/cpu_reference_bench.py on this machine
# (2026-08-16, 1-core VM): 838.5 frames/s at B=8 T=128 (scale-invariant in
# B·T: 777–838 across shapes). See BASELINE.md.
CPU_BASELINE_FRAMES_PER_SEC = 838.5
CPU_BASELINE_NOTE = "torch eager f32 fused step, 1-core host CPU (scripts/cpu_reference_bench.py)"

L, B, T, NC = 425, 32, 512, 5


def main() -> None:
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
        train=TrainConfig(trainer="wgan", n_critic=NC),
    )
    F = cfg.vocoder.feature_size
    n_chips = 1  # single-chip bench; DP scaling validated via dryrun_multichip

    state = make_gan_state(cfg, L)
    rng = np.random.default_rng(0)

    def batch(lead=()):
        return {
            "lab": jax.numpy.asarray(rng.normal(size=lead + (B, T, L)).astype(np.float32)),
            "cmp": jax.numpy.asarray(rng.normal(size=lead + (B, T, F)).astype(np.float32)),
            "mask": jax.numpy.asarray(np.ones(lead + (B, T), np.float32)),
            "lengths": jax.numpy.asarray(np.full(lead + (B,), T, np.int32)),
        }

    cb, gb = batch((NC,)), batch()
    step = jax.jit(make_wgan_step(cfg.train), donate_argnums=(0,))

    # compile + warmup. NOTE: hard-sync by reading a value back to the host —
    # on the tunneled TPU runtime, block_until_ready returns long before the
    # dispatched chain has executed and under-measures by orders of
    # magnitude; a device→host readback of the final state cannot lie.
    def hard_sync(s):
        return float(jax.tree.leaves(s.gen.params)[0].sum())

    state, m = step(state, cb, gb)
    hard_sync(state)
    for _ in range(3):
        state, m = step(state, cb, gb)
    hard_sync(state)

    # timed chunks (dependent steps; one readback per chunk amortizes the
    # ~30 ms tunnel round-trip); median is robust to tunnel jitter
    chunk_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, m = step(state, cb, gb)
        hard_sync(state)
        chunk_times.append((time.perf_counter() - t0) / n)
    dt = float(np.median(chunk_times))

    frames_per_sec = B * T * (NC + 1) / dt / n_chips
    out = {
        "metric": "wgan_gp_train_throughput",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / CPU_BASELINE_FRAMES_PER_SEC, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
