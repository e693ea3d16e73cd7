"""Conditional Wasserstein critic.

Reference parity: percivaltts's convolutional critic (SURVEY.md §2 "Critic"
— reference location ``models_critic.py`` or inside the WGAN optimizer
module): a conv stack over the spectral feature map, a dense path for the
f0/noise-mask streams, conditioning on the input labels, merged to one scalar
score per sequence. Per WGAN-GP practice there is **no batch norm** (the
gradient penalty is per-sample); ``norm`` selects layer norm (default) or
none (the reference's plain-conv critic; ~10% faster on v5e).

TPU-first notes: strided time-1D convs at full hidden width (conv_style
``time1d``, default) or the reference-faithful 2D image convs (``2d``); the
label conditioning path is a frame-wise dense stack (batched matmul); masked
mean-pooling (not flatten) makes the score length-aware without dynamic
shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from percivaltts_tpu.config import ModelConfig, VocoderConfig


from percivaltts_tpu.models.base import dtype_by_name as _dtype


class TimeConvGemm(nn.Module):
    """k-tap strided time-1D conv as an explicit im2col GEMM.

    Numerically identical to ``nn.Conv(features, (k,), strides=(stride,),
    padding="SAME")`` — same param names/shapes (checkpoint-compatible:
    ``kernel`` (k, in, features), ``bias`` (features,)) and XLA's SAME
    padding split (lo = total//2, hi = total − lo, i.e. the extra tap on
    the right) — but lowered as pad + k strided slices + one
    (B·T', k·C)×(k·C, F) matmul instead of the conv HLO. Measured faster
    than the conv lowering on v5e at the critic's shapes IN ISOLATION
    (B=32, T=512, C=256, k=5: fwd 1.83→1.55 ms, fwd+bwd 2.00→1.83;
    `scripts/conv_probe.py`) — but MEASURED FAR WORSE inside the fused
    WGAN-GP step (headline bench 4.70 → 3.08 M frames/s): the gradient
    penalty's double backprop through the k stacked slices materializes
    pad/slice/add chains that the conv HLO's transpose handles natively,
    and the concat breaks XLA's conv+gelu+layernorm fusion. Kept (with the
    exact-equality test) as the measured record; the critic uses nn.Conv.
    The space-to-depth reformulation is the other conv dead end (reshape
    cost, BASELINE.md).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        k, s = self.kernel_size, self.stride
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, C, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
        )
        To = -(-T // s)  # ceil
        total = max((To - 1) * s + k - T, 0)
        lo = total // 2
        xp = jnp.pad(x, ((0, 0), (lo, total - lo), (0, 0)))
        patches = jnp.concatenate(
            [xp[:, j : j + (To - 1) * s + 1 : s, :] for j in range(k)], axis=-1
        )
        y = patches.astype(self.dtype) @ kernel.reshape(k * C, self.features).astype(
            self.dtype
        )
        return y + bias.astype(self.dtype)


class Critic(nn.Module):
    """score = Critic(cmp features, conditioning labels, mask) ∈ R per sample."""

    vocoder: VocoderConfig
    channels: int = 32
    blocks: int = 4
    hidden: int = 256
    kernel: Tuple[int, int] = (5, 5)
    conv_style: str = "time1d"
    norm: str = "layer"  # "layer" | "none"
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    def _norm(self, x, name, dt, pdt):
        if self.norm == "layer":
            return nn.LayerNorm(dtype=dt, param_dtype=pdt, name=name)(x)
        if self.norm == "none":
            return x
        raise ValueError(f"unknown critic norm: {self.norm}")

    @nn.compact
    def __call__(self, cmp: jax.Array, lab: jax.Array, mask: jax.Array) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        pdt = _dtype(self.param_dtype)
        streams = self.vocoder.streams
        cmp = cmp.astype(dt)
        mask = mask.astype(dt)  # (B, T)

        spec_key = "spec" if "spec" in streams else "mel"
        a, b = streams[spec_key]
        total_stride = 2 ** ((self.blocks + 1) // 2)  # stride-2 every other block
        if cmp.shape[1] % total_stride != 0:
            raise ValueError(
                f"critic needs sequence length divisible by its total time "
                f"stride {total_stride} (got {cmp.shape[1]}); pick bucket "
                f"bounds that are multiples of {total_stride}"
            )
        t_stride = 1
        if self.conv_style == "2d":
            # reference-faithful 2D conv stack over the (T, freq) image
            img = cmp[..., a:b][..., None]  # (B, T, F, 1)
            img = img * mask[:, :, None, None]
            x = nn.Conv(self.channels, self.kernel, dtype=dt, param_dtype=pdt, name="spec_in")(img)
            for i in range(self.blocks):
                x = nn.gelu(x)
                # stride over time every other block to grow the receptive field
                stride = (2, 2) if i % 2 == 0 else (1, 1)
                t_stride *= stride[0]
                x = nn.Conv(
                    self.channels * min(2 ** (i // 2 + 1), 8),
                    self.kernel,
                    strides=stride,
                    dtype=dt,
                    param_dtype=pdt,
                    name=f"spec_conv{i}",
                )(x)
                x = self._norm(x, f"spec_ln{i}", dt, pdt)
            # pool frequency, keep (B, T', C)
            x = x.mean(axis=2)
        elif self.conv_style == "time1d":
            # TPU fast path: full-width time-1D strided conv stack; frequency
            # structure is mixed by the input projection (F → hidden GEMM)
            s = cmp[..., a:b] * mask[:, :, None]
            x = nn.Dense(self.hidden, dtype=dt, param_dtype=pdt, name="spec_in")(s)
            kt = (self.kernel[0],)
            for i in range(self.blocks):
                x = nn.gelu(x)
                stride = 2 if i % 2 == 0 else 1
                t_stride *= stride
                x = nn.Conv(
                    self.hidden, kt, strides=(stride,),
                    dtype=dt, param_dtype=pdt, name=f"spec_conv{i}",
                )(x)
                x = self._norm(x, f"spec_ln{i}", dt, pdt)
        else:
            raise ValueError(f"unknown conv_style: {self.conv_style}")

        # ---- scalar streams (f0 / vuv / nm / bap): frame-wise dense path ----
        # Time-pool BEFORE the dense stacks: their outputs are consumed at
        # the conv path's downsampled rate T/t_stride anyway, so running the
        # GEMMs at full T wasted t_stride× flops (profiled at ~1.8 ms of the
        # 24 ms headline step across all critic passes incl. the GP
        # double-backprop). NOTE this is a different critic function, not a
        # pure optimization — mean-pool(gelu(Dense(x))) ≠
        # gelu(Dense(mean-pool(x))) — with the same param SHAPES, so a
        # checkpoint from before this change restores cleanly but scores
        # batches differently; resumed pre-change WGAN runs should finish on
        # the old revision. (Measured equally stable/convergent on the soak
        # recipes; device step 19.3 → 18.3 ms.)
        B, T = mask.shape
        Tp = x.shape[1]

        def pool_t(z):
            return z[:, : Tp * t_stride].reshape(
                B, Tp, t_stride, z.shape[-1]
            ).mean(axis=2)

        rest = [cmp[..., s:e] for name, (s, e) in streams.items() if name != spec_key]
        h_parts = [x.reshape(x.shape[0], -1, x.shape[-1])]
        if rest:
            r = pool_t(jnp.concatenate(rest, axis=-1) * mask[:, :, None])
            r = nn.Dense(self.hidden // 2, dtype=dt, param_dtype=pdt, name="rest_d0")(r)
            r = nn.gelu(r)
            r = nn.Dense(self.hidden // 2, dtype=dt, param_dtype=pdt, name="rest_d1")(r)
            h_parts.append(r)

        # ---- conditioning on the input labels (conditional critic) ----
        l = pool_t(lab.astype(dt) * mask[:, :, None])
        l = nn.Dense(self.hidden // 2, dtype=dt, param_dtype=pdt, name="cond_d0")(l)
        l = nn.gelu(l)
        h_parts.append(l)

        h = jnp.concatenate(h_parts, axis=-1)
        h = nn.Dense(self.hidden, dtype=dt, param_dtype=pdt, name="merge_d0")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden, dtype=dt, param_dtype=pdt, name="merge_d1")(h)
        h = nn.gelu(h)
        score_t = nn.Dense(1, dtype=dt, param_dtype=pdt, name="score")(h)[..., 0]  # (B, T')

        # masked mean over time at the downsampled rate
        m = mask[:, : Tp * t_stride].reshape(B, Tp, t_stride).max(axis=2)
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        score = (score_t * m).sum(axis=1) / denom
        return score.astype(jnp.float32)


def build_critic(model_cfg: ModelConfig, vocoder: VocoderConfig) -> Critic:
    return Critic(
        vocoder=vocoder,
        channels=model_cfg.critic_channels,
        blocks=model_cfg.critic_blocks,
        hidden=model_cfg.critic_hidden,
        kernel=(model_cfg.critic_kernel, model_cfg.critic_kernel),
        conv_style=model_cfg.conv_style,
        norm=model_cfg.critic_norm,
        compute_dtype=model_cfg.compute_dtype,
        param_dtype=model_cfg.param_dtype,
    )
