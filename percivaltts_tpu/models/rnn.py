"""Fused bidirectional LSTM for TPU.

Reference parity: the bidirectional LSTM layers of percivaltts's recurrent
generators (``models_basic.py`` BLSTM; SURVEY.md §2) — functionally a
standard BLSTM with separate forward/backward parameters.

TPU-first redesign: a naive BLSTM runs two ``lax.scan``s per layer (four per
fwd+bwd pass). On TPU a scan is *latency*-bound — T sequential iterations of
tiny matmuls that can't fill the MXU — so scan count, not FLOPs, sets the
cost. This module fuses both directions into ONE scan (the body steps the
forward cell on x[t] and the backward cell on x[T−1−t] simultaneously) and
unrolls the scan body (default 16×) to amortize per-iteration overhead.
Semantics match two independent single-direction LSTMs exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class _DualLSTMStep(nn.Module):
    """One time step of both directions; scanned over time by BiLSTM."""

    features: int
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    cell_type: str = "lstm"  # "lstm" | "gru"

    @nn.compact
    def __call__(self, carry, xs):
        xf, xb = xs  # (B, D) forward input, backward (time-reversed) input
        cf, cb = carry
        dt, pdt = _dtype(self.compute_dtype), _dtype(self.param_dtype)
        cell_cls = {"lstm": nn.OptimizedLSTMCell, "gru": nn.GRUCell}[self.cell_type]
        cell_f = cell_cls(self.features, dtype=dt, param_dtype=pdt, name="fwd")
        cell_b = cell_cls(self.features, dtype=dt, param_dtype=pdt, name="bwd")
        cf, yf = cell_f(cf, xf)
        cb, yb = cell_b(cb, xb)
        return (cf, cb), (yf, yb)


class BiLSTM(nn.Module):
    """(B, T, D) → (B, T, 2·features); one fused scan for both directions.

    ``cell_type="gru"`` gives the reference's BGRU variant with the same
    fused-scan structure (GRU carry is a single hidden vector).
    """

    features: int
    unroll: int = 16
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    cell_type: str = "lstm"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        dt = _dtype(self.compute_dtype)
        x = x.astype(dt)
        xr = x[:, ::-1]

        scan = nn.scan(
            _DualLSTMStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=min(self.unroll, T),
        )
        step = scan(
            features=self.features,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            cell_type=self.cell_type,
            name="cell",
        )
        zeros = jnp.zeros((B, self.features), dt)
        if self.cell_type == "gru":
            carry = (zeros, zeros)
        else:
            carry = ((zeros, zeros), (zeros, zeros))
        _, (yf, yb) = step(carry, (x, xr))
        return jnp.concatenate([yf, yb[:, ::-1]], axis=-1)
