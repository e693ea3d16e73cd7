"""Probe: stride-2 k=5 time-1D conv (XLA conv lowering) vs explicit
im2col-GEMM formulation, fwd and fwd+bwd, at the critic's shapes.

Run on TPU: python scripts/conv_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, C = 32, 512, 256
K, S = 5, 2


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def conv_xla(x, w):
    w = w.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(S,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_gemm(x, w):
    # pad to SAME, stack K strided slices -> (B, T//S, K*C) @ (K*C, C)
    pad = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    cols = [xp[:, k : k + T : S, :] for k in range(K)]
    patches = jnp.concatenate(cols, axis=-1)
    return patches @ w.reshape(K * C, C)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    f_xla = jax.jit(conv_xla)
    f_gemm = jax.jit(conv_gemm)
    a = np.asarray(f_xla(x, w), np.float32)
    b = np.asarray(f_gemm(x, w), np.float32)
    print("max diff:", float(np.abs(a - b).max()), flush=True)

    def loss_xla(w, x):
        return jnp.sum(jnp.square(conv_xla(x, w).astype(jnp.float32)))

    def loss_gemm(w, x):
        return jnp.sum(jnp.square(conv_gemm(x, w).astype(jnp.float32)))

    g_xla = jax.jit(jax.grad(lambda w, x: loss_xla(w, x), argnums=(0, 1)))
    g_gemm = jax.jit(jax.grad(lambda w, x: loss_gemm(w, x), argnums=(0, 1)))

    print(f"fwd  xla  {timeit(f_xla, x, w):7.3f} ms", flush=True)
    print(f"fwd  gemm {timeit(f_gemm, x, w):7.3f} ms", flush=True)
    print(f"f+b  xla  {timeit(g_xla, w, x):7.3f} ms", flush=True)
    print(f"f+b  gemm {timeit(g_gemm, w, x):7.3f} ms", flush=True)

    # 4-layer stack like the critic (stride 2 each, T halves)
    def stack(conv, x, ws):
        h = x
        for w in ws:
            h = conv(h, w)[:, : h.shape[1] // S, :]
            h = jax.nn.leaky_relu(h.astype(jnp.float32), 0.2).astype(jnp.bfloat16)
        return h

    ws = [jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32) * 0.05).astype(jnp.bfloat16) for _ in range(4)]

    def sl_xla(ws, x):
        return jnp.sum(jnp.square(stack(conv_xla, x, ws).astype(jnp.float32)))

    def sl_gemm(ws, x):
        def cg(x, w):
            padl = (K - 1) // 2
            Tl = x.shape[1]
            xp = jnp.pad(x, ((0, 0), (padl, padl), (0, 0)))
            cols = [xp[:, k : k + Tl : S, :] for k in range(K)]
            return jnp.concatenate(cols, axis=-1) @ w.reshape(K * C, C)
        return jnp.sum(jnp.square(stack(cg, x, ws).astype(jnp.float32)))

    gs_xla = jax.jit(jax.grad(sl_xla, argnums=(0, 1)))
    gs_gemm = jax.jit(jax.grad(sl_gemm, argnums=(0, 1)))
    print(f"stack f+b xla  {timeit(gs_xla, ws, x):7.3f} ms", flush=True)
    print(f"stack f+b gemm {timeit(gs_gemm, ws, x):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
