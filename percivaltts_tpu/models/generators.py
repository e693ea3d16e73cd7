"""Generator zoo: FC, BLSTM, CNN (and CNN+BLSTM) acoustic models.

Reference parity: percivaltts's Keras model builders
(``percivaltts/models_basic.py`` — FC and recurrent generators — and
``percivaltts/models_cnn.py`` — the signature CNN generator that renders the
spectral stream as a 2D frames×frequency image; SURVEY.md §2 "Generator"
rows). All map ``(batch, frames, label_dim) → (batch, frames, feat_dim)``.

TPU-first design notes:
* Frame-wise dense layers are ``(B*T, D) @ (D, H)`` matmuls — large, batched,
  MXU-shaped. Hidden sizes default to multiples of 128.
* BLSTM/BGRU layers run both directions in ONE fused, unrolled ``lax.scan``
  (models/rnn.py) — compiled once per bucket length, no Python time loops.
* The CNN generator defaults to MXU-aligned time-1D convs (conv_style
  ``time1d``); ``2d`` keeps the reference-faithful (T, freq) image convs.
  bf16 compute with f32 params throughout.
* No data-dependent shapes anywhere: padding is handled by the caller's
  masks, not by dynamic slicing.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from percivaltts_tpu.config import ModelConfig, VocoderConfig
from percivaltts_tpu.models.rnn import BiLSTM


from percivaltts_tpu.models.base import dtype_by_name as _dtype


def _reg(x, norm: str, rate: float, train: bool, dt, pdt, name: str):
    """Shared regularization point (ModelConfig.dropout_rate / gen_norm):
    optional LayerNorm (stateless — see the config comment on why not
    BatchNorm) then dropout, active only in training mode. At the defaults
    (norm="none", rate=0) this adds no params and no ops, so existing
    checkpoints restore unchanged."""
    if norm == "layer":
        x = nn.LayerNorm(dtype=dt, param_dtype=pdt, name=f"{name}_ln")(x)
    elif norm != "none":
        raise ValueError(f"unknown gen_norm: {norm}")
    if rate > 0.0:
        x = nn.Dropout(rate, deterministic=not train, name=f"{name}_drop")(x)
    return x


class FCGenerator(nn.Module):
    """Frame-wise MLP generator (reference: the FC/DNN builder in
    models_basic.py)."""

    feat_dim: int
    hidden_size: int = 256
    num_layers: int = 3
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    dropout_rate: float = 0.0
    norm: str = "none"

    @nn.compact
    def __call__(self, lab: jax.Array, train: bool = False) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        pdt = _dtype(self.param_dtype)
        x = lab.astype(dt)
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_size, dtype=dt, param_dtype=pdt, name=f"dense_{i}")(x)
            x = _reg(x, self.norm, self.dropout_rate, train, dt, pdt, f"reg_{i}")
            x = nn.tanh(x)
        x = nn.Dense(self.feat_dim, dtype=dt, param_dtype=pdt, name="out")(x)
        return x.astype(jnp.float32)


class BLSTMGenerator(nn.Module):
    """Bidirectional recurrent generator (reference: the BLSTM/BGRU builders
    in models_basic.py). Dense front-end, stacked BLSTM or BGRU
    (``cell_type``), linear readout.

    The recurrence is one fused ``lax.scan`` per layer (models/rnn.py) —
    linear in sequence length, compiled once per bucket bound.
    """

    feat_dim: int
    hidden_size: int = 256
    num_layers: int = 2
    cell_type: str = "lstm"
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    shard_mesh: Any = None
    dropout_rate: float = 0.0
    norm: str = "none"

    @nn.compact
    def __call__(self, lab: jax.Array, train: bool = False) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        pdt = _dtype(self.param_dtype)
        x = lab.astype(dt)
        x = nn.Dense(self.hidden_size, dtype=dt, param_dtype=pdt, name="frontend")(x)
        x = _reg(x, self.norm, self.dropout_rate, train, dt, pdt, "reg_fe")
        x = nn.tanh(x)
        for i in range(self.num_layers):
            x = BiLSTM(
                self.hidden_size // 2,
                compute_dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                cell_type=self.cell_type,
                shard_mesh=self.shard_mesh,
                name=f"blstm_{i}",
            )(x)
            # inter-layer dropout only (Keras-style): normalizing the
            # recurrent outputs would change the cells' effective dynamics
            if self.dropout_rate > 0.0:
                x = nn.Dropout(
                    self.dropout_rate, deterministic=not train,
                    name=f"drop_{i}",
                )(x)
        x = nn.Dense(self.feat_dim, dtype=dt, param_dtype=pdt, name="out")(x)
        return x.astype(jnp.float32)


class CNNGenerator(nn.Module):
    """Percival's signature CNN generator (reference: models_cnn.py).

    A dense trunk maps label frames to a hidden sequence; the spectral
    stream is then generated with temporal-convolutional coherence. Two
    styles (ModelConfig.conv_style):

    * ``time1d`` (TPU fast path): residual 1-D convolutions over time at
      ``hidden_size`` channels — each conv is a (5·H → H) GEMM that fills
      the MXU; cross-frequency coherence comes from the dense spec
      projection mixing all bands. Profiling on v5e showed the 2d style's
      32-channel 5×5 convs reach only ~16% MXU (channels ≪ 128 lanes,
      freq=65 pads to 128) plus heavy layout transposes.
    * ``2d`` (reference-faithful): the spectral stream rendered as a
      (T, spec_size, C) image refined by 2D convolutions, exactly the
      reference's inductive bias (nearby frames AND frequency bands
      generated coherently).

    The f0 and noise-mask streams use small dense heads (optionally a BLSTM
    f0 head when ``use_blstm_heads`` — the reference's full default,
    BASELINE config 3).
    """

    vocoder: VocoderConfig
    hidden_size: int = 256
    trunk_layers: int = 2
    channels: int = 32
    blocks: int = 4
    kernel: Tuple[int, int] = (5, 5)
    conv_style: str = "time1d"
    use_blstm_heads: bool = False
    blstm_size: int = 128
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    shard_mesh: Any = None
    dropout_rate: float = 0.0
    norm: str = "none"

    @nn.compact
    def __call__(self, lab: jax.Array, train: bool = False) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        pdt = _dtype(self.param_dtype)
        streams = self.vocoder.streams
        x = lab.astype(dt)
        for i in range(self.trunk_layers):
            x = nn.Dense(self.hidden_size, dtype=dt, param_dtype=pdt, name=f"trunk_{i}")(x)
            x = _reg(x, self.norm, self.dropout_rate, train, dt, pdt, f"reg_{i}")
            x = nn.tanh(x)

        outs = []
        if "f0" in streams:
            h = x
            if self.use_blstm_heads:
                h = BiLSTM(
                    self.blstm_size,
                    compute_dtype=self.compute_dtype,
                    param_dtype=self.param_dtype,
                    shard_mesh=self.shard_mesh,
                    name="f0_blstm",
                )(h)
            f0 = nn.Dense(1, dtype=dt, param_dtype=pdt, name="f0_out")(h)
            outs.append(("f0", f0))
        if "vuv" in streams:
            vuv = nn.Dense(1, dtype=dt, param_dtype=pdt, name="vuv_out")(x)
            outs.append(("vuv", vuv))

        spec_key = "spec" if "spec" in streams else "mel"
        a, b = streams[spec_key]
        spec_size = b - a
        if self.conv_style == "2d":
            # reference-faithful: spectral stream as a (T, freq, C) image
            img = nn.Dense(spec_size * 2, dtype=dt, param_dtype=pdt, name="spec_seed")(x)
            img = nn.tanh(img)
            img = img.reshape(img.shape[0], img.shape[1], spec_size, 2)
            img = nn.Conv(self.channels, self.kernel, dtype=dt, param_dtype=pdt, name="spec_in")(img)
            for i in range(self.blocks):
                r = nn.gelu(img)
                r = nn.Conv(self.channels, self.kernel, dtype=dt, param_dtype=pdt, name=f"spec_conv{i}a")(r)
                r = nn.gelu(r)
                r = nn.Conv(self.channels, self.kernel, dtype=dt, param_dtype=pdt, name=f"spec_conv{i}b")(r)
                img = img + r
            spec = nn.Conv(1, self.kernel, dtype=dt, param_dtype=pdt, name="spec_out")(img)
            outs.append((spec_key, spec[..., 0]))
        elif self.conv_style == "time1d":
            # TPU fast path: residual time-1D convs at full hidden width
            h = x
            kt = (self.kernel[0],)
            for i in range(self.blocks):
                r = nn.gelu(h)
                r = nn.Conv(self.hidden_size, kt, dtype=dt, param_dtype=pdt, name=f"spec_conv{i}a")(r)
                r = nn.gelu(r)
                r = nn.Conv(self.hidden_size, kt, dtype=dt, param_dtype=pdt, name=f"spec_conv{i}b")(r)
                h = h + r
            spec = nn.Dense(spec_size, dtype=dt, param_dtype=pdt, name="spec_out")(h)
            outs.append((spec_key, spec))
        else:
            raise ValueError(f"unknown conv_style: {self.conv_style}")

        for name in ("nm", "bap"):
            if name in streams:
                a, b = streams[name]
                h = nn.Dense(self.hidden_size // 2, dtype=dt, param_dtype=pdt, name=f"{name}_hidden")(x)
                h = nn.tanh(h)
                y = nn.Dense(b - a, dtype=dt, param_dtype=pdt, name=f"{name}_out")(h)
                outs.append((name, y))

        # assemble streams back into the composed feature order
        order = sorted(streams.items(), key=lambda kv: kv[1][0])
        by_name = dict(outs)
        return jnp.concatenate(
            [by_name[n] for n, _ in order], axis=-1
        ).astype(jnp.float32)


def build_generator(
    model_cfg: ModelConfig,
    vocoder: VocoderConfig,
    label_dim: int,
    mesh=None,
) -> nn.Module:
    """Factory mapping config → generator module (reference: the model-choice
    switch in run.py). ``mesh``: partition the recurrent Pallas kernels over
    its ``data`` axis (multi-chip DP)."""
    kind = model_cfg.generator
    feat_dim = vocoder.feature_size
    common = dict(
        compute_dtype=model_cfg.compute_dtype,
        param_dtype=model_cfg.param_dtype,
        dropout_rate=model_cfg.dropout_rate,
        norm=model_cfg.gen_norm,
    )
    if kind == "fc":
        return FCGenerator(
            feat_dim=feat_dim,
            hidden_size=model_cfg.hidden_size,
            num_layers=model_cfg.num_layers,
            **common,
        )
    if kind in ("blstm", "bgru"):
        return BLSTMGenerator(
            feat_dim=feat_dim,
            hidden_size=model_cfg.blstm_size,
            num_layers=model_cfg.blstm_layers,
            cell_type="gru" if kind == "bgru" else "lstm",
            shard_mesh=mesh,
            **common,
        )
    if kind in ("cnn", "cnn_blstm"):
        return CNNGenerator(
            vocoder=vocoder,
            hidden_size=model_cfg.hidden_size,
            channels=model_cfg.cnn_channels,
            blocks=model_cfg.cnn_blocks,
            kernel=(model_cfg.cnn_kernel_time, model_cfg.cnn_kernel_freq),
            conv_style=model_cfg.conv_style,
            use_blstm_heads=(kind == "cnn_blstm"),
            blstm_size=model_cfg.blstm_size // 2,
            shard_mesh=mesh,
            **common,
        )
    raise ValueError(f"unknown generator kind: {kind}")
