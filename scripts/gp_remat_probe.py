#!/usr/bin/env python
"""A/B probe: rematerialization policies on the WGAN-GP critic loss.

The GP double-backprop is ~33% of the headline step (BASELINE.md step-time
breakdown). Reverse-over-reverse through the critic stores every conv
intermediate of the interpolates pass twice (once for the inner grad wrt
input, once for the outer grad wrt params). If that path is HBM-bound,
``jax.checkpoint`` (remat) on the critic apply can trade recompute flops
for bandwidth.

Variants measured (each the FULL fused outer step, only critic_loss_fn
differs):
  base        current training/wgan.py step (control)
  remat_gp    jax.checkpoint around the critic apply inside d_sum only
  remat_all   jax.checkpoint around every critic apply in the critic loss
  f32eps      control + interpolates computed in bf16 (one less f32 pass)

Usage: python scripts/gp_remat_probe.py [steps_per_chunk=40] [chunks=5]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from percivaltts_tpu.config import (
    Configuration,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)
from percivaltts_tpu.training.losses import masked_mse
from percivaltts_tpu.training.state import make_gan_state
from percivaltts_tpu.utils.compilation_cache import enable_compilation_cache

L, B, T, NC = 425, 32, 512, 5


def make_step(cfg: TrainConfig, variant: str):
    n_critic = cfg.n_critic
    gp_lambda = cfg.gp_lambda
    lse_weight = cfg.lse_weight

    def critic_loss_fn(critic_params, batch, fake, eps_key, state):
        lab, real, mask = batch["lab"], batch["cmp"], batch["mask"]

        apply = state.critic.apply_fn
        if variant == "remat_all":
            apply = jax.checkpoint(apply, static_argnums=())

        d_real = apply(critic_params, real, lab, mask)
        d_fake = apply(critic_params, fake, lab, mask)

        eps = jax.random.uniform(eps_key, (real.shape[0], 1, 1))
        interp = eps * real + (1.0 - eps) * fake
        if variant == "bf16interp":
            interp = interp.astype(jnp.bfloat16)

        gp_apply = state.critic.apply_fn
        if variant in ("remat_gp", "remat_all"):
            gp_apply = jax.checkpoint(state.critic.apply_fn)

        def d_sum(x):
            return gp_apply(critic_params, x, lab, mask).sum()

        g = jax.grad(d_sum)(interp) * mask[..., None]
        gnorm = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2)) + 1e-12)
        gp = jnp.mean(jnp.square(gnorm - 1.0))

        w_dist = jnp.mean(d_real) - jnp.mean(d_fake)
        return -w_dist + gp_lambda * gp, (w_dist, gp)

    def gen_loss_fn(gen_params, critic_params, batch, state):
        lab, real, mask = batch["lab"], batch["cmp"], batch["mask"]
        fake = state.gen.apply_fn(gen_params, lab)
        adv = -jnp.mean(state.critic.apply_fn(critic_params, fake, lab, mask))
        lse = masked_mse(fake, real, mask, None)
        return adv + lse_weight * lse, (adv, lse)

    def step(state, critic_batches, gen_batch):
        key, *eps_keys = jax.random.split(state.key, n_critic + 1)
        eps_keys = jnp.stack(eps_keys)
        lab_all = critic_batches["lab"]
        nc, Bb = lab_all.shape[0], lab_all.shape[1]
        fakes = state.gen.apply_fn(
            state.gen.params, lab_all.reshape((nc * Bb,) + lab_all.shape[2:])
        )
        fakes = jax.lax.stop_gradient(fakes.reshape((nc, Bb) + fakes.shape[1:]))

        carry = (state.critic, jnp.float32(0), jnp.float32(0))
        for i in range(n_critic):
            critic_ts, w_acc, gp_acc = carry
            batch = jax.tree.map(lambda x: x[i], critic_batches)
            (loss, (w, gp)), grads = jax.value_and_grad(
                critic_loss_fn, has_aux=True
            )(critic_ts.params, batch, fakes[i], eps_keys[i], state)
            critic_ts = critic_ts.apply_gradients(grads=grads)
            carry = (critic_ts, w_acc + w, gp_acc + gp)
        critic_ts, w_sum, gp_sum = carry

        (gen_loss, (adv, lse)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen.params, critic_ts.params, gen_batch, state)
        gen_ts = state.gen.apply_gradients(grads=gen_grads)
        return state.replace(gen=gen_ts, critic=critic_ts, key=key), gen_loss

    return step


def main():
    steps_per_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    enable_compilation_cache()

    cfg = Configuration(
        data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
        vocoder=VocoderConfig(spec_size=65, nm_size=33),
        model=ModelConfig(generator="cnn_blstm"),
        train=TrainConfig(trainer="wgan", n_critic=NC),
    )
    F = cfg.vocoder.feature_size
    rng = np.random.default_rng(0)

    def batch(lead=()):
        return {
            "lab": jnp.asarray(rng.normal(size=lead + (B, T, L)).astype(np.float32)),
            "cmp": jnp.asarray(rng.normal(size=lead + (B, T, F)).astype(np.float32)),
            "mask": jnp.asarray(np.ones(lead + (B, T), np.float32)),
            "lengths": jnp.asarray(np.full(lead + (B,), T, np.int32)),
        }

    cb, gb = batch((NC,)), batch()

    for variant in ("base", "remat_gp", "remat_all", "bf16interp"):
        state = make_gan_state(cfg, L)
        step = jax.jit(make_step(cfg.train, variant), donate_argnums=(0,))
        state, _ = step(state, cb, gb)
        float(jax.tree.leaves(state.gen.params)[0].sum())  # hard sync
        for _ in range(3):
            state, _ = step(state, cb, gb)
        float(jax.tree.leaves(state.gen.params)[0].sum())

        times = []
        for _ in range(chunks):
            t0 = time.perf_counter()
            for _ in range(steps_per_chunk):
                state, _ = step(state, cb, gb)
            float(jax.tree.leaves(state.gen.params)[0].sum())
            times.append((time.perf_counter() - t0) / steps_per_chunk)
        dt = float(np.median(times))
        fps = B * T * (NC + 1) / dt
        print(f"{variant:12s}  {dt * 1e3:7.2f} ms/step  {fps / 1e6:6.2f} M frames/s")


if __name__ == "__main__":
    main()
