#!/usr/bin/env python
"""Step-time decomposition of the headline WGAN-GP outer step (VERDICT
round-2 item 6: publish the breakdown so the next perf move is guided).

Times each component of the fused step as its own jitted function at the
bench shape (B=32, T=512, L=425, F=99, n_critic=5), with the tunnel-honest
hard-sync (tiny scalar readback) used by bench.py. Components overlap in
the fused step (XLA schedules across them), so the parts sum to >= the
fused step time; the ranking is what matters.

  gen_fakes      one batched generator pass over (n_critic*B) labels
  critic_fwd     one critic forward (B)
  critic_gp      GP double-backprop alone: grad wrt params of
                 ||grad_x D(interp)|| penalty (the grad-of-grad term)
  critic_update  full critic loss fwd+bwd+adam, one iteration
  gen_update     generator fwd+bwd through critic + LSE + adam
  fused_outer    the real outer step (5 critic updates + 1 gen update)

Prints a JSON table with ms, HLO flops, and achieved TFLOP/s per part.
"""

import json
import time

import numpy as np


def _time(fn, args, sync, n=10, chunks=5):
    fn(*args)  # compile
    sync()
    ts = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / n)
    return float(np.median(ts))


def _flops(fn, *args):
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def main():
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
    from percivaltts_tpu.training.wgan import make_wgan_step
    from percivaltts_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    L, B, T, NC = 425, 32, 512, 5
    cfg = Configuration(
        data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
        vocoder=VocoderConfig(spec_size=65, nm_size=33),
        model=ModelConfig(generator="cnn_blstm"),
        train=TrainConfig(trainer="wgan", n_critic=NC),
    )
    F = cfg.vocoder.feature_size
    state = make_gan_state(cfg, L)
    rng = np.random.default_rng(0)

    def batch(lead=()):
        return {
            "lab": jnp.asarray(rng.normal(size=lead + (B, T, L)).astype(np.float32)),
            "cmp": jnp.asarray(rng.normal(size=lead + (B, T, F)).astype(np.float32)),
            "mask": jnp.asarray(np.ones(lead + (B, T), np.float32)),
            "lengths": jnp.asarray(np.full(lead + (B,), T, np.int32)),
        }

    cb, gb = batch((NC,)), batch()
    one = jax.tree.map(lambda x: x[0], cb)
    key = jax.random.PRNGKey(0)

    gen_apply, critic_apply = state.gen.apply_fn, state.critic.apply_fn

    # -- components ------------------------------------------------------
    @jax.jit
    def gen_fakes(gp_, lab_all):
        nc = lab_all.shape[0]
        out = gen_apply(gp_, lab_all.reshape((nc * B,) + lab_all.shape[2:]))
        return out.reshape((nc, B) + out.shape[1:])

    @jax.jit
    def critic_fwd(cp_, b):
        return critic_apply(cp_, b["cmp"], b["lab"], b["mask"])

    def _gp_loss(cp_, b, fake, k):
        eps = jax.random.uniform(k, (B, 1, 1))
        interp = eps * b["cmp"] + (1.0 - eps) * fake

        def d_sum(x):
            return critic_apply(cp_, x, b["lab"], b["mask"]).sum()

        g = jax.grad(d_sum)(interp) * b["mask"][..., None]
        gn = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2)) + 1e-12)
        return jnp.mean(jnp.square(gn - 1.0))

    @jax.jit
    def critic_gp(cp_, b, fake, k):
        return jax.grad(_gp_loss)(cp_, b, fake, k)

    def _critic_loss(cp_, b, fake, k):
        d_real = critic_apply(cp_, b["cmp"], b["lab"], b["mask"])
        d_fake = critic_apply(cp_, fake, b["lab"], b["mask"])
        return -(jnp.mean(d_real) - jnp.mean(d_fake)) + cfg.train.gp_lambda * _gp_loss(
            cp_, b, fake, k
        )

    @jax.jit
    def critic_update(cts, b, fake, k):
        grads = jax.grad(_critic_loss)(cts.params, b, fake, k)
        return cts.apply_gradients(grads=grads)

    def _gen_loss(gp_, cp_, b):
        fake = gen_apply(gp_, b["lab"])
        adv = -jnp.mean(critic_apply(cp_, fake, b["lab"], b["mask"]))
        return adv + cfg.train.lse_weight * masked_mse(fake, b["cmp"], b["mask"], None)

    @jax.jit
    def gen_update(gts, cp_, b):
        grads = jax.grad(_gen_loss)(gts.params, cp_, b)
        return gts.apply_gradients(grads=grads)

    fused = jax.jit(make_wgan_step(cfg.train))

    fake1 = gen_fakes(state.gen.params, cb["lab"])[0]

    def sync_scalar(x=None):
        if x is None:
            x = state.gen.params
        leaves = jax.tree.leaves(x)
        return float(jnp.asarray(leaves[0]).reshape(-1)[0])

    parts = {}
    specs = [
        ("gen_fakes", gen_fakes, (state.gen.params, cb["lab"])),
        ("critic_fwd", critic_fwd, (state.critic.params, one)),
        ("critic_gp", critic_gp, (state.critic.params, one, fake1, key)),
        ("critic_update", critic_update, (state.critic, one, fake1, key)),
        ("gen_update", gen_update, (state.gen, state.critic.params, gb)),
        ("fused_outer", fused, (state, cb, gb)),
    ]
    peak = 197e12  # v5e bf16
    for name, fn, args in specs:
        dt = _time(fn, args, sync_scalar)
        fl = _flops(fn, *args)
        row = {"ms": round(dt * 1e3, 3)}
        if fl:
            row["gflops"] = round(fl / 1e9, 2)
            row["achieved_tflops"] = round(fl / dt / 1e12, 1)
            row["mfu_pct"] = round(100 * fl / dt / peak, 1)
        parts[name] = row
        print(name, json.dumps(row), flush=True)
    # derived: what the outer step spends where (5 critic updates + 1 gen
    # update + 1 batched fakes pass)
    est = (
        5 * parts["critic_update"]["ms"]
        + parts["gen_update"]["ms"]
        + parts["gen_fakes"]["ms"]
    )
    parts["sum_of_parts_ms"] = round(est, 2)
    print(json.dumps(parts))


if __name__ == "__main__":
    main()
