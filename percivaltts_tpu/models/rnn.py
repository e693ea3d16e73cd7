"""Fused bidirectional LSTM / GRU for TPU.

Reference parity: the bidirectional LSTM layers of percivaltts's recurrent
generators (``models_basic.py`` BLSTM; SURVEY.md §2) — functionally a
standard BLSTM with separate forward/backward parameters.

TPU-first redesign, two tiers:

* **Pallas kernel** (default on TPU for lane-aligned widths): the whole
  recurrence runs as one kernel per direction-pair with carries resident in
  VMEM and the input projections hoisted to big MXU GEMMs —
  ``ops/lstm_pallas.py``. An XLA scan is *latency*-bound (~6 µs/step of
  while-loop overhead on v5e however large the unroll); the kernel removes
  the per-step launch entirely. Measured v5e (D=256, H=128, T=512):
  forward 3.2→2.1 ms at B=160; forward+backward 10.2→4.0 ms at B=160 and
  4.8→1.9 ms at B=32 (the training path, via the kernel's custom-VJP BPTT).
* **Fused scan fallback** (CPU / misaligned widths / explicit
  ``use_pallas=False``): both
  directions step in ONE ``lax.scan`` (forward cell on x[t], backward cell
  on x[T−1−t]) with the body unrolled (default 16×) — scan count, not
  FLOPs, sets the cost.

Both tiers share the same parameters and match ``flax.linen``'s
``OptimizedLSTMCell`` gate math exactly (oracle-tested in tests/test_rnn.py).
LSTM parameters live under ``fwd``/``bwd`` as per-gate kernels in flax's
naming: ``i{c}`` input kernels (no bias), ``h{c}`` recurrent kernels,
``b{c}`` biases, c ∈ {i, f, g, o}.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from percivaltts_tpu.ops.lstm_pallas import bigru_pallas, bilstm_pallas


from percivaltts_tpu.models.base import dtype_by_name as _dtype


_GATES = "ifgo"


class _LSTMDirParams(nn.Module):
    """Per-direction LSTM parameters, flax-``OptimizedLSTMCell``-compatible
    shapes/inits: lecun-normal input kernels, orthogonal recurrent kernels,
    zero biases. Returns them concatenated in gate order i, f, g, o."""

    features: int
    param_dtype: str = "float32"

    @nn.compact
    def __call__(self, in_dim: int):
        H, pdt = self.features, _dtype(self.param_dtype)
        wi = [
            self.param(f"i{c}", nn.initializers.lecun_normal(), (in_dim, H), pdt)
            for c in _GATES
        ]
        wh = [
            self.param(f"h{c}", nn.initializers.orthogonal(), (H, H), pdt)
            for c in _GATES
        ]
        b = [
            self.param(f"b{c}", nn.initializers.zeros_init(), (H,), pdt)
            for c in _GATES
        ]
        return (
            jnp.concatenate(wi, axis=-1),
            jnp.concatenate(wh, axis=-1),
            jnp.concatenate(b, axis=-1),
        )


_GRU_GATES = "rzn"


class _GRUDirParams(nn.Module):
    """Per-direction GRU parameters, flax-``GRUCell``-compatible shapes and
    inits. flax puts biases on the input projections and on the recurrent
    n branch only. Returned concatenated in gate order r, z, n."""

    features: int
    param_dtype: str = "float32"

    @nn.compact
    def __call__(self, in_dim: int):
        H, pdt = self.features, _dtype(self.param_dtype)
        wi = [
            self.param(f"i{c}", nn.initializers.lecun_normal(), (in_dim, H), pdt)
            for c in _GRU_GATES
        ]
        wh = [
            self.param(f"h{c}", nn.initializers.orthogonal(), (H, H), pdt)
            for c in _GRU_GATES
        ]
        b = [
            self.param(f"b{c}", nn.initializers.zeros_init(), (H,), pdt)
            for c in _GRU_GATES
        ]
        bn = self.param("bhn", nn.initializers.zeros_init(), (H,), pdt)
        return (
            jnp.concatenate(wi, axis=-1),
            jnp.concatenate(wh, axis=-1),
            jnp.concatenate(b, axis=-1),
            bn,
        )


class BiLSTM(nn.Module):
    """(B, T, D) → (B, T, 2·features); fused bidirectional recurrence.

    ``cell_type="gru"`` gives the reference's BGRU variant (same two tiers,
    GRU kernels). ``use_pallas``: None = auto (TPU backend + lane-aligned
    gate width), True/False forces; ``pallas_interpret`` runs the kernel in
    interpreter mode (CPU tests).
    """

    features: int
    unroll: int = 16
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    cell_type: str = "lstm"
    use_pallas: Optional[bool] = None
    pallas_interpret: bool = False
    # partition the Pallas kernel over this mesh's "data" axis via shard_map
    # (multi-chip DP; without it XLA gathers around the custom call)
    shard_mesh: Any = None

    def _pick_pallas(self, B: int) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        # auto: TPU backend AND lane-aligned gate width (4H for LSTM, 3H for
        # GRU, a multiple of the 128-lane tile) — misaligned models would
        # only pay Mosaic padding overhead for the kernel launch — AND the
        # BPTT kernel's grid-resident weights + K=1 block fit VMEM (large
        # f32 configs fall back to the scan path instead of failing in
        # Mosaic)
        from percivaltts_tpu.ops.lstm_pallas import pallas_vmem_ok

        gates = 3 if self.cell_type == "gru" else 4
        return (
            jax.default_backend() == "tpu"
            and (gates * self.features) % 128 == 0
            and pallas_vmem_ok(
                B,
                self.features,
                jnp.dtype(_dtype(self.compute_dtype)).itemsize,
                self.cell_type,
            )
        )

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, D = x.shape
        dt = _dtype(self.compute_dtype)
        H = self.features

        if self.cell_type == "gru":
            wi_f, wh_f, b_f, bn_f = _GRUDirParams(H, self.param_dtype, name="fwd")(D)
            wi_b, wh_b, b_b, bn_b = _GRUDirParams(H, self.param_dtype, name="bwd")(D)
            x = x.astype(dt)
            ws = [a.astype(dt) for a in
                  (wi_f, wh_f, b_f, bn_f, wi_b, wh_b, b_b, bn_b)]
            if self._pick_pallas(B):
                return bigru_pallas(
                    x, *ws, interpret=self.pallas_interpret,
                    shard_mesh=self.shard_mesh,
                )
            return self._gru_scan(x, *ws)

        wi_f, wh_f, b_f = _LSTMDirParams(H, self.param_dtype, name="fwd")(D)
        wi_b, wh_b, b_b = _LSTMDirParams(H, self.param_dtype, name="bwd")(D)
        x = x.astype(dt)
        wi_f, wh_f, b_f, wi_b, wh_b, b_b = (
            a.astype(dt) for a in (wi_f, wh_f, b_f, wi_b, wh_b, b_b)
        )
        if self._pick_pallas(B):
            return bilstm_pallas(
                x, wi_f, wh_f, b_f, wi_b, wh_b, b_b,
                interpret=self.pallas_interpret,
                shard_mesh=self.shard_mesh,
            )
        return self._lstm_scan(x, wi_f, wh_f, b_f, wi_b, wh_b, b_b)

    def _lstm_scan(self, x, wi_f, wh_f, b_f, wi_b, wh_b, b_b):
        """Fused-scan fallback: identical math to the Pallas kernel — the
        input projections hoisted out of the scan, both directions stepped
        in one body."""
        B, T, _ = x.shape
        H = self.features
        gx_f = (x @ wi_f + b_f).swapaxes(0, 1)  # (T, B, 4H)
        gx_b = (x[:, ::-1] @ wi_b + b_b).swapaxes(0, 1)

        def cell(c, h, g, wh):
            z = g + h @ wh
            i = jax.nn.sigmoid(z[:, :H])
            f = jax.nn.sigmoid(z[:, H : 2 * H])
            gg = jnp.tanh(z[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(z[:, 3 * H :])
            c = f * c + i * gg
            h = o * jnp.tanh(c)
            return c, h

        def body(carry, gs):
            (cf, hf), (cb, hb) = carry
            gf, gb = gs
            cf, hf = cell(cf, hf, gf, wh_f)
            cb, hb = cell(cb, hb, gb, wh_b)
            return ((cf, hf), (cb, hb)), (hf, hb)

        z0 = jnp.zeros((B, H), x.dtype)
        _, (yf, yb) = jax.lax.scan(
            body,
            ((z0, z0), (z0, z0)),
            (gx_f, gx_b),
            unroll=min(self.unroll, T),
        )
        yf = yf.swapaxes(0, 1)
        yb = yb.swapaxes(0, 1)[:, ::-1]
        return jnp.concatenate([yf, yb], axis=-1)

    def _gru_scan(self, x, wi_f, wh_f, b_f, bn_f, wi_b, wh_b, b_b, bn_b):
        """Fused-scan fallback with identical math to the GRU Pallas kernel
        (flax ``GRUCell`` formulation, gate order r, z, n)."""
        B, T, _ = x.shape
        H = self.features
        gx_f = (x @ wi_f + b_f).swapaxes(0, 1)  # (T, B, 3H)
        gx_b = (x[:, ::-1] @ wi_b + b_b).swapaxes(0, 1)

        def cell(h, g, wh, bn):
            gh = h @ wh
            r = jax.nn.sigmoid(g[:, :H] + gh[:, :H])
            z = jax.nn.sigmoid(g[:, H : 2 * H] + gh[:, H : 2 * H])
            n = jnp.tanh(g[:, 2 * H :] + r * (gh[:, 2 * H :] + bn))
            return (1.0 - z) * n + z * h

        def body(carry, gs):
            hf, hb = carry
            gf, gb = gs
            hf = cell(hf, gf, wh_f, bn_f)
            hb = cell(hb, gb, wh_b, bn_b)
            return (hf, hb), (hf, hb)

        z0 = jnp.zeros((B, H), x.dtype)
        _, (yf, yb) = jax.lax.scan(
            body, (z0, z0), (gx_f, gx_b), unroll=min(self.unroll, T)
        )
        yf = yf.swapaxes(0, 1)
        yb = yb.swapaxes(0, 1)[:, ::-1]
        return jnp.concatenate([yf, yb], axis=-1)
