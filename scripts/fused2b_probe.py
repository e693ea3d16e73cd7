#!/usr/bin/env python
"""Fused D(real)+D(fake) 2B-pass probe + critic roofline (VERDICT r4 item 3).

Two measurements in one harness:

1. Headline fused-step A/B of ``TrainConfig.critic_fused_pass`` — the
   round-2 rejection of the 2B fusion predates the pool-before-dense and
   critic_norm="none" critic, so the frontier question is whether the
   verdict flips under the current stack.

2. The ROOFLINE arithmetic for the step's components: for the critic
   forward, the GP double-backprop, and the whole fused step, collect
   XLA's compiled cost analysis (flops, bytes accessed) and measured
   wall, and print each against the v5e compute bound (197 TFLOP/s bf16)
   and HBM bound (819 GB/s) — i.e. WHAT the non-MFU time is bound by.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/fused2b_probe.py
"""

import time

import numpy as np

L, B, T, NC = 425, 32, 512, 5
PEAK_FLOPS = 197e12  # v5e bf16
HBM_BW = 819e9  # v5e HBM GB/s


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _bench(fn, args, n=40, chunks=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n)
    return float(np.median(ts))


def _roofline_row(name, dt, flops, bytes_):
    t_mxu = flops / PEAK_FLOPS
    t_hbm = bytes_ / HBM_BW
    bound = "compute" if t_mxu > t_hbm else "HBM"
    return {
        "component": name,
        "ms": round(dt * 1e3, 3),
        "gflops": round(flops / 1e9, 1),
        "mbytes": round(bytes_ / 1e6, 1),
        "mfu_pct": round(100 * flops / dt / PEAK_FLOPS, 1),
        "t_mxu_ms": round(t_mxu * 1e3, 3),
        "t_hbm_ms": round(t_hbm * 1e3, 3),
        "bound": bound,
        "x_over_bound": round(dt / max(t_mxu, t_hbm), 1),
    }


def step_ab():
    import jax

    from percivaltts_tpu.config import (
        Configuration, DataConfig, ModelConfig, TrainConfig, VocoderConfig,
    )
    from percivaltts_tpu.training.state import make_gan_state
    from percivaltts_tpu.training.wgan import make_wgan_step

    rows = []
    for fused in (False, True):
        cfg = Configuration(
            data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
            vocoder=VocoderConfig(spec_size=65, nm_size=33),
            model=ModelConfig(generator="cnn_blstm"),
            train=TrainConfig(
                trainer="wgan", n_critic=NC, critic_fused_pass=fused
            ),
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
        state, m = step(state, *args)
        float(jax.tree.leaves(state.gen.params)[0].sum())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(40):
                state, m = step(state, *args)
            float(jax.tree.leaves(state.gen.params)[0].sum())
            ts.append((time.perf_counter() - t0) / 40)
        dt = float(np.median(ts))
        flops, bytes_ = _cost(step.lower(state, *args).compile())
        row = {
            "critic_fused_pass": fused,
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_sec": round(B * T * (NC + 1) / dt, 1),
            **_roofline_row("fused_step", dt, flops, bytes_),
        }
        print(row, flush=True)
        rows.append(row)
    return rows


def component_roofline():
    """Critic forward / GP double-backprop / generator forward in
    isolation: measured wall vs compute and HBM bounds."""
    import jax
    import jax.numpy as jnp

    from percivaltts_tpu.config import (
        Configuration, DataConfig, ModelConfig, VocoderConfig,
    )
    from percivaltts_tpu.models.critic import build_critic
    from percivaltts_tpu.models.generators import build_generator

    cfg = Configuration(
        data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
        vocoder=VocoderConfig(spec_size=65, nm_size=33),
        model=ModelConfig(generator="cnn_blstm"),
    )
    F = cfg.vocoder.feature_size
    rng = np.random.default_rng(0)
    cmp_ = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    lab = jnp.asarray(rng.normal(size=(B, T, L)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)

    critic = build_critic(cfg.model, cfg.vocoder)
    cparams = critic.init(jax.random.PRNGKey(0), cmp_, lab, mask)
    gen = build_generator(cfg.model, cfg.vocoder, L)
    gparams = gen.init(jax.random.PRNGKey(1), lab)

    rows = []

    fwd = jax.jit(lambda p, x: critic.apply(p, x, lab, mask))
    dt = _bench(fwd, (cparams, cmp_))
    rows.append(_roofline_row("critic_fwd", dt, *_cost(fwd.lower(cparams, cmp_).compile())))

    def gp(p, x):
        g = jax.grad(lambda xx: critic.apply(p, xx, lab, mask).sum())(x)
        gn = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2)) + 1e-12)
        return jnp.mean(jnp.square(gn - 1.0))

    gpf = jax.jit(jax.grad(lambda p, x: gp(p, x)), static_argnums=())
    dt = _bench(gpf, (cparams, cmp_))
    rows.append(_roofline_row("critic_gp_grad", dt, *_cost(gpf.lower(cparams, cmp_).compile())))

    # critic update = grad of the real/fake loss wrt params (no GP)
    def closs(p):
        return (critic.apply(p, cmp_, lab, mask) - critic.apply(p, cmp_ + 0.1, lab, mask)).mean()

    cup = jax.jit(jax.grad(closs))
    dt = _bench(cup, (cparams,))
    rows.append(_roofline_row("critic_bwd(params)", dt, *_cost(cup.lower(cparams).compile())))

    gfwd = jax.jit(lambda p, x: gen.apply(p, x))
    dt = _bench(gfwd, (gparams, lab))
    rows.append(_roofline_row("gen_fwd", dt, *_cost(gfwd.lower(gparams, lab).compile())))

    for r in rows:
        print(r, flush=True)
    return rows


if __name__ == "__main__":
    from percivaltts_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print("== step A/B: critic_fused_pass ==", flush=True)
    step_ab()
    print("== component roofline ==", flush=True)
    component_roofline()
