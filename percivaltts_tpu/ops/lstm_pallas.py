"""Fused bidirectional LSTM / GRU Pallas kernels for TPU.

Reference parity: the BLSTM/BGRU layers of percivaltts's recurrent generators
(``percivaltts/models_basic.py``; SURVEY.md §2 "Generator: basic" — file-level
cite, mount empty). Numerics match ``models/rnn.py``'s XLA-scan BiLSTM (same
gate math as flax ``OptimizedLSTMCell``), which remains the oracle.

Why a kernel: an LSTM scan under XLA is *latency*-bound — T sequential while
iterations, each a handful of small ops with per-iteration launch/sync
overhead (measured ~6 µs/step on v5e regardless of unroll 16→32; the gate
FLOPs themselves are <1 µs). Pallas runs the whole sequence as ONE kernel:
a sequential grid over time blocks, recurrent carries resident in VMEM
scratch across grid steps, the hop-invariant input projections hoisted to
one big MXU GEMM outside the kernel, and the time-block input/output
streaming double-buffered by the pallas pipeline. Both directions execute
in the same kernel (the backward direction reads its time blocks
back-to-front via the BlockSpec index map — no reversed copy of the
sequence is ever materialized).

Layout: time-major ``(T, B, 4H)`` gate blocks of K frames — the sublane
dimension is the batch (any B; tiles pad per block only) and the lane
dimension 4H is a multiple of 128, so blocks tile cleanly for every dtype.

Training: ``bilstm_core`` carries a custom VJP whose backward pass is a
second Pallas kernel running BPTT in one launch — gates are *recomputed*
from the saved inputs (memory-light), and the per-step d(gates) stream out
so the weight/bias/input gradients reduce to big XLA GEMMs outside (the
in-kernel dh matmul contracts against PRE-TRANSPOSED recurrent kernels; a
lane-lane or sublane-sublane contraction falls off the MXU).

Sharding: XLA's SPMD partitioner has no partitioning rule for a custom
call, so under a sharded-batch jit it would gather the kernel's operands
and run the recurrence replicated (correct but not partitioned). Passing
``shard_mesh`` wraps the core in ``shard_map`` over the mesh's ``data``
axis instead — each device runs the kernel on its local batch rows (the
recurrence is batch-row independent), which is the fully-partitioned
multi-chip path. The Trainer plumbs its mesh here automatically; B=1
(init) and non-divisible batches fall back to the gathered call.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# VMEM budget for everything resident during a grid step: the
# double-buffered time blocks PLUS the full-grid-resident weight blocks and
# the f32 carry scratch. Kept below the 16 MB/core limit with headroom for
# Mosaic's own temporaries.
_VMEM_BUDGET = 12 * 1024 * 1024
# Hard ceiling for EXPLICIT use_pallas=True: configs between the
# conservative budget above and this limit previously compiled fine under
# Mosaic (which owns the real 16 MB/core arbitration), so _pick_block
# returns K=1 for them instead of refusing — only past this does it raise.
_VMEM_HARD_LIMIT = 15 * 1024 * 1024


def _fixed_bytes(B: int, H: int, itemsize: int, w_units: int, s_carries: int) -> int:
    """VMEM bytes resident across the whole grid: ``w_units``·H² of weights
    at the compute itemsize plus ``s_carries`` (B, H) f32 carry scratch."""
    return w_units * H * H * itemsize + s_carries * B * H * 4


def _pick_block(
    T: int, B: int, H: int, itemsize: int, h_units: int, fixed: int = 0
) -> int:
    """Largest time-block size (≤ 16) dividing T whose double-buffered block
    footprint plus the grid-resident ``fixed`` bytes (weights, carry scratch)
    fits the VMEM budget. ``h_units``: total block bytes per frame per batch
    row, in units of H·itemsize (12 for the forward LSTM kernel: 2×4H in +
    4×H out; 24 for its BPTT kernel). Raises when even K=1 does not fit —
    callers gate on :func:`pallas_vmem_ok` to fall back to the scan path
    instead of failing at Mosaic compile time."""
    per_k = h_units * H * B * itemsize * 2  # ×2: double buffering
    for k in (16, 8, 4, 2, 1):
        if T % k == 0 and k * per_k + fixed <= _VMEM_BUDGET:
            return k
    if per_k + fixed <= _VMEM_HARD_LIMIT:
        # over the conservative budget but plausibly within the real core
        # limit: honor the caller's explicit use_pallas=True and let Mosaic
        # arbitrate (the auto heuristic already steered clear via
        # pallas_vmem_ok)
        return 1
    raise ValueError(
        f"pallas recurrent kernel does not fit VMEM: T={T} B={B} H={H} "
        f"itemsize={itemsize} needs {per_k + fixed} bytes at K=1 "
        f"(hard limit {_VMEM_HARD_LIMIT}); use the scan path "
        f"(use_pallas=False)"
    )


def pallas_vmem_ok(B: int, H: int, itemsize: int, cell_type: str = "lstm") -> bool:
    """True when the heaviest kernel for this cell (the BPTT pass) fits the
    VMEM budget at the smallest block size. The ``use_pallas=None`` auto
    heuristic calls this so oversized configs (e.g. f32 H≥512, whose weight
    blocks alone approach the 16 MB core limit) silently keep the XLA scan
    path instead of dying in the Mosaic compiler."""
    if cell_type == "gru":
        h_units, fixed = 18, _fixed_bytes(B, H, itemsize, 2 * 2 * 3, 2)
    else:
        h_units, fixed = 24, _fixed_bytes(B, H, itemsize, 2 * 2 * 4, 4)
    return h_units * H * B * itemsize * 2 + fixed <= _VMEM_BUDGET


def _gates(z, H):
    i = jax.nn.sigmoid(z[:, :H])
    f = jax.nn.sigmoid(z[:, H : 2 * H])
    g = jnp.tanh(z[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H :])
    return i, f, g, o


def _dot(a, b):
    """(B, H) @ (H, 4H) on the MXU, f32 accumulate."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b):
    """(B, 4H) @ (H, 4H)ᵀ → (B, H): contract the 4H axes (no transpose op)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _outer(a, b):
    """(B, H)ᵀ @ (B, 4H) → (H, 4H): contract the batch axes."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #


def _fwd_kernel(gxf_ref, gxb_ref, whf_ref, whb_ref,
                yf_ref, yb_ref, cf_ref, cb_ref,
                hf, cf, hb, cb):
    """One grid step = K forward frames (ascending) + K backward frames
    (descending, from the mirrored block). Carries live in VMEM scratch."""
    K = gxf_ref.shape[0]
    H = whf_ref.shape[0]
    dt = gxf_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    whf = whf_ref[:]
    whb = whb_ref[:]
    for k in range(K):
        # forward direction, frame k of this block
        zf = gxf_ref[k].astype(jnp.float32) + _dot(hf[:].astype(dt), whf)
        i, f, g, o = _gates(zf, H)
        c_new = f * cf[:] + i * g
        h_new = o * jnp.tanh(c_new)
        cf[:] = c_new
        hf[:] = h_new
        yf_ref[k] = h_new.astype(dt)
        cf_ref[k] = c_new.astype(dt)

        # backward direction, frame K-1-k of the mirrored block
        kb = K - 1 - k
        zb = gxb_ref[kb].astype(jnp.float32) + _dot(hb[:].astype(dt), whb)
        i, f, g, o = _gates(zb, H)
        c_new = f * cb[:] + i * g
        h_new = o * jnp.tanh(c_new)
        cb[:] = c_new
        hb[:] = h_new
        yb_ref[kb] = h_new.astype(dt)
        cb_ref[kb] = c_new.astype(dt)


def _bilstm_fwd_pallas(gx_f, gx_b, wh_f, wh_b, interpret=False):
    T, B, H4 = gx_f.shape
    H = H4 // 4
    dt = gx_f.dtype
    K = _pick_block(T, B, H, gx_f.dtype.itemsize, 12,
                    _fixed_bytes(B, H, gx_f.dtype.itemsize, 2 * 4, 4))
    G = T // K

    out_shapes = (
        jax.ShapeDtypeStruct((T, B, H), dt),  # yf
        jax.ShapeDtypeStruct((T, B, H), dt),  # yb
        jax.ShapeDtypeStruct((T, B, H), dt),  # cf
        jax.ShapeDtypeStruct((T, B, H), dt),  # cb
    )
    blk = lambda i: (i, 0, 0)
    rblk = lambda i: (G - 1 - i, 0, 0)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, B, H4), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B, H4), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B, H), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B, H), rblk, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),  # hf
            pltpu.VMEM((B, H), jnp.float32),  # cf
            pltpu.VMEM((B, H), jnp.float32),  # hb
            pltpu.VMEM((B, H), jnp.float32),  # cb
        ],
        interpret=interpret,
    )(gx_f, gx_b, wh_f, wh_b)


# --------------------------------------------------------------------------- #
# backward (BPTT)
# --------------------------------------------------------------------------- #


def _bwd_kernel(gxf_ref, gxb_ref, whf_ref, whb_ref, whtf_ref, whtb_ref,
                hpf_ref, hpb_ref, cpf_ref, cpb_ref,
                cf_ref, cb_ref, dyf_ref, dyb_ref,
                dgxf_ref, dgxb_ref,
                dhf, dcf, dhb, dcb):
    """One grid step = K BPTT frames. The fwd direction's BPTT runs
    time-REVERSED (grid reads blocks back-to-front), the bwd direction's
    BPTT runs time-forward. Gates are recomputed from the saved inputs.
    Only the sequential work lives here: the d(gates) stream out and the
    weight/bias/input gradients are big XLA GEMMs outside the kernel.
    All in-kernel matmuls contract lhs-lanes against rhs-sublanes (the MXU
    layout) — dh uses the PRE-TRANSPOSED (4H, H) recurrent kernels, since
    a lane-lane contraction would fall off the MXU."""
    K = gxf_ref.shape[0]
    H = whf_ref.shape[0]
    dt = gxf_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        dhf[:] = jnp.zeros_like(dhf)
        dcf[:] = jnp.zeros_like(dcf)
        dhb[:] = jnp.zeros_like(dhb)
        dcb[:] = jnp.zeros_like(dcb)

    whf = whf_ref[:]
    whb = whb_ref[:]
    whtf = whtf_ref[:]
    whtb = whtb_ref[:]
    for k in range(K):
        # ---- forward direction BPTT: frame K-1-k of the mirrored block ----
        kf = K - 1 - k
        z = gxf_ref[kf].astype(jnp.float32) + _dot(hpf_ref[kf], whf)
        i, f, g, o = _gates(z, H)
        c = cf_ref[kf].astype(jnp.float32)
        cprev = cpf_ref[kf].astype(jnp.float32)
        tc = jnp.tanh(c)
        dh = dyf_ref[kf].astype(jnp.float32) + dhf[:]
        dc = dcf[:] + dh * o * (1.0 - tc * tc)
        dz = jnp.concatenate(
            [
                dc * g * i * (1.0 - i),
                dc * cprev * f * (1.0 - f),
                dc * i * (1.0 - g * g),
                dh * tc * o * (1.0 - o),
            ],
            axis=-1,
        ).astype(dt)
        dgxf_ref[kf] = dz
        dhf[:] = _dot(dz, whtf)
        dcf[:] = dc * f

        # ---- backward direction BPTT: frame k of this block --------------- #
        z = gxb_ref[k].astype(jnp.float32) + _dot(hpb_ref[k], whb)
        i, f, g, o = _gates(z, H)
        c = cb_ref[k].astype(jnp.float32)
        cprev = cpb_ref[k].astype(jnp.float32)
        tc = jnp.tanh(c)
        dh = dyb_ref[k].astype(jnp.float32) + dhb[:]
        dc = dcb[:] + dh * o * (1.0 - tc * tc)
        dz = jnp.concatenate(
            [
                dc * g * i * (1.0 - i),
                dc * cprev * f * (1.0 - f),
                dc * i * (1.0 - g * g),
                dh * tc * o * (1.0 - o),
            ],
            axis=-1,
        ).astype(dt)
        dgxb_ref[k] = dz
        dhb[:] = _dot(dz, whtb)
        dcb[:] = dc * f


def _bilstm_bwd_pallas(gx_f, gx_b, wh_f, wh_b, hp_f, hp_b, cp_f, cp_b,
                       cf, cb, dyf, dyb, interpret=False):
    T, B, H4 = gx_f.shape
    H = H4 // 4
    dt = gx_f.dtype
    # in: gx 2×4H + hp/cp/c/dy 2×4×H; out: dgx 2×4H → 24 H-units per frame
    K = _pick_block(T, B, H, gx_f.dtype.itemsize, 24,
                    _fixed_bytes(B, H, gx_f.dtype.itemsize, 2 * 2 * 4, 4))
    G = T // K

    blk = lambda i: (G - 1 - i, 0, 0)   # fwd-direction BPTT: reversed
    fblk = lambda i: (i, 0, 0)          # bwd-direction BPTT: forward
    w0 = lambda i: (0, 0)
    spec = lambda m: pl.BlockSpec((K, B, H4), m, memory_space=pltpu.VMEM)
    hspec = lambda m: pl.BlockSpec((K, B, H), m, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(G,),
        in_specs=[
            spec(blk),                                       # gx_f
            spec(fblk),                                      # gx_b
            pl.BlockSpec((H, H4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), w0, memory_space=pltpu.VMEM),
            hspec(blk),                                      # hprev_f
            hspec(fblk),                                     # hprev_b
            hspec(blk),                                      # cprev_f
            hspec(fblk),                                     # cprev_b
            hspec(blk),                                      # cf
            hspec(fblk),                                     # cb
            hspec(blk),                                      # dyf
            hspec(fblk),                                     # dyb
        ],
        out_specs=(
            spec(blk),                                       # dgx_f
            spec(fblk),                                      # dgx_b
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H4), dt),
            jax.ShapeDtypeStruct((T, B, H4), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),   # dhf
            pltpu.VMEM((B, H), jnp.float32),   # dcf
            pltpu.VMEM((B, H), jnp.float32),   # dhb
            pltpu.VMEM((B, H), jnp.float32),   # dcb
        ],
        interpret=interpret,
    )(gx_f, gx_b, wh_f, wh_b, wh_f.T, wh_b.T,
      hp_f, hp_b, cp_f, cp_b, cf, cb, dyf, dyb)


# --------------------------------------------------------------------------- #
# custom-VJP core
# --------------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bilstm_core(gx_f, gx_b, wh_f, wh_b, interpret=False):
    """(T, B, 4H) pre-computed input gates per direction + (H, 4H) recurrent
    kernels → (yf, yb) each (T, B, H). The backward direction runs over the
    same time axis back-to-front (``keep_order`` semantics: yb[t] is the
    backward hidden state at frame t)."""
    yf, yb, _, _ = _bilstm_fwd_pallas(gx_f, gx_b, wh_f, wh_b, interpret)
    return yf, yb


def _core_fwd(gx_f, gx_b, wh_f, wh_b, interpret):
    yf, yb, cf, cb = _bilstm_fwd_pallas(gx_f, gx_b, wh_f, wh_b, interpret)
    return (yf, yb), (gx_f, gx_b, wh_f, wh_b, yf, yb, cf, cb)


def _core_bwd(interpret, res, grads):
    gx_f, gx_b, wh_f, wh_b, yf, yb, cf, cb = res
    dyf, dyb = grads
    z = jnp.zeros_like(yf[:1])
    # "previous" state per direction: t-1 for fwd, t+1 for bwd
    hp_f = jnp.concatenate([z, yf[:-1]], axis=0)
    cp_f = jnp.concatenate([z, cf[:-1]], axis=0)
    hp_b = jnp.concatenate([yb[1:], z], axis=0)
    cp_b = jnp.concatenate([cb[1:], z], axis=0)
    dgx_f, dgx_b = _bilstm_bwd_pallas(
        gx_f, gx_b, wh_f, wh_b, hp_f, hp_b, cp_f, cp_b, cf, cb, dyf, dyb,
        interpret,
    )
    # dWh = Σ_t h_{prev,t}ᵀ · dz_t — one big (H, T·B)×(T·B, 4H) MXU GEMM in
    # XLA rather than a per-frame outer-product accumulation in the kernel
    # (a sublane-sublane contraction that falls off the MXU).
    dwh_f = jnp.einsum("tbh,tbg->hg", hp_f, dgx_f)
    dwh_b = jnp.einsum("tbh,tbg->hg", hp_b, dgx_b)
    return dgx_f, dgx_b, dwh_f.astype(wh_f.dtype), dwh_b.astype(wh_b.dtype)


bilstm_core.defvjp(_core_fwd, _core_bwd)


def _want_shard(mesh, axis, B: int) -> bool:
    """Shard only when the mesh has a >1 data axis AND the (static) batch
    divides it — init (B=1) and odd predict batches fall back to the
    unsharded call, which XLA runs gathered/replicated (still correct)."""
    if mesh is None:
        return False
    size = mesh.shape.get(axis, 1)
    return size > 1 and B % size == 0


def _shard_over_batch(core, n_weights, mesh, axis):
    """Wrap a (gx_f, gx_b, *weights) → (yf, yb) core in ``shard_map`` over
    the batch (middle) axis of the time-major gate tensors. The recurrence
    is independent per batch row, so each device runs the kernel on its
    local rows — the fully-partitioned multi-chip path (XLA's SPMD
    partitioner has no rule for the custom call and would otherwise gather
    it; see module docstring)."""
    from jax.sharding import PartitionSpec as P

    gspec = P(None, axis, None)
    return jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(gspec, gspec) + (P(),) * n_weights,
        out_specs=(gspec, gspec),
        check_vma=False,
    )


def bilstm_pallas(
    x: jax.Array,
    wi_f: jax.Array,
    wh_f: jax.Array,
    b_f: jax.Array,
    wi_b: jax.Array,
    wh_b: jax.Array,
    b_b: jax.Array,
    interpret: bool = False,
    shard_mesh=None,
    shard_axis: str = "data",
) -> jax.Array:
    """(B, T, D) → (B, T, 2H) fused bidirectional LSTM.

    The input projections run as two big XLA GEMMs (MXU-efficient, part of
    the surrounding jit so they fuse/overlap); only the sequential recurrence
    runs in the Pallas kernel. Gate order i, f, g, o matches models/rnn.py.
    ``shard_mesh``: partition the kernel over the batch via shard_map on
    this mesh's ``shard_axis`` (multi-chip data parallelism; B must divide
    by the axis size).
    """
    gx_f = (x @ wi_f + b_f).swapaxes(0, 1)  # (T, B, 4H)
    gx_b = (x @ wi_b + b_b).swapaxes(0, 1)
    core = lambda gf, gb, wf, wb: bilstm_core(gf, gb, wf, wb, interpret)
    if _want_shard(shard_mesh, shard_axis, gx_f.shape[1]):
        core = _shard_over_batch(core, 2, shard_mesh, shard_axis)
    yf, yb = core(gx_f, gx_b, wh_f, wh_b)
    return jnp.concatenate([yf, yb], axis=-1).swapaxes(0, 1)


# --------------------------------------------------------------------------- #
# GRU: forward
# --------------------------------------------------------------------------- #
#
# flax ``GRUCell`` math, gate order r, z, n:
#   r  = σ(gx_r + h·Whr)           gx = x·Wi + b_i   (hoisted, (T, B, 3H))
#   z  = σ(gx_z + h·Whz)
#   n  = tanh(gx_n + r ⊙ (h·Whn + b_hn))
#   h' = (1 − z) ⊙ n + z ⊙ h
# No cell state, so the only residual besides gx is y itself.


def _gru_gates(gh, gx, bn, H):
    r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gx[:, H : 2 * H] + gh[:, H : 2 * H])
    ghn = gh[:, 2 * H :] + bn
    n = jnp.tanh(gx[:, 2 * H :] + r * ghn)
    return r, z, n, ghn


def _gru_fwd_kernel(gxf_ref, gxb_ref, whf_ref, whb_ref, bnf_ref, bnb_ref,
                    yf_ref, yb_ref, hf, hb):
    K = gxf_ref.shape[0]
    H = whf_ref.shape[0]
    dt = gxf_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        hf[:] = jnp.zeros_like(hf)
        hb[:] = jnp.zeros_like(hb)

    whf = whf_ref[:]
    whb = whb_ref[:]
    bnf = bnf_ref[:].astype(jnp.float32)  # (1, H), broadcasts over batch
    bnb = bnb_ref[:].astype(jnp.float32)
    for k in range(K):
        gh = _dot(hf[:].astype(dt), whf)
        r, z, n, _ = _gru_gates(gh, gxf_ref[k].astype(jnp.float32), bnf, H)
        hf[:] = (1.0 - z) * n + z * hf[:]
        yf_ref[k] = hf[:].astype(dt)

        kb = K - 1 - k
        gh = _dot(hb[:].astype(dt), whb)
        r, z, n, _ = _gru_gates(gh, gxb_ref[kb].astype(jnp.float32), bnb, H)
        hb[:] = (1.0 - z) * n + z * hb[:]
        yb_ref[kb] = hb[:].astype(dt)


def _bigru_fwd_pallas(gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, interpret=False):
    T, B, H3 = gx_f.shape
    H = H3 // 3
    dt = gx_f.dtype
    K = _pick_block(T, B, H, gx_f.dtype.itemsize, 8,  # in 2×3H, out 2×H
                    _fixed_bytes(B, H, gx_f.dtype.itemsize, 2 * 3, 2))
    G = T // K

    blk = lambda i: (i, 0, 0)
    rblk = lambda i: (G - 1 - i, 0, 0)
    w0 = lambda i: (0, 0)
    return pl.pallas_call(
        _gru_fwd_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K, B, H3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B, H3), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), w0, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B, H), rblk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((T, B, H), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(gx_f, gx_b, wh_f, wh_b, bn_f[None, :], bn_b[None, :])


# --------------------------------------------------------------------------- #
# GRU: backward (BPTT)
# --------------------------------------------------------------------------- #


def _gru_bwd_kernel(gxf_ref, gxb_ref, whf_ref, whb_ref, bnf_ref, bnb_ref,
                    whtf_ref, whtb_ref,
                    hpf_ref, hpb_ref, dyf_ref, dyb_ref,
                    dgxf_ref, dgxb_ref, dnrf_ref, dnrb_ref,
                    dhf, dhb):
    """Streams out d(gx) (for the input-projection grads) and dnr = dn_pre·r
    (the recurrent n-branch grad, whose weight gradient differs from the
    input branch's); dWh/db reduce to XLA GEMMs outside."""
    K = gxf_ref.shape[0]
    H = whf_ref.shape[0]
    dt = gxf_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        dhf[:] = jnp.zeros_like(dhf)
        dhb[:] = jnp.zeros_like(dhb)

    whf, whb = whf_ref[:], whb_ref[:]
    whtf, whtb = whtf_ref[:], whtb_ref[:]
    bnf = bnf_ref[:].astype(jnp.float32)  # (1, H), broadcasts over batch
    bnb = bnb_ref[:].astype(jnp.float32)

    def bptt(gx_k, hp_k, dy_k, wh, wht, bn, dh_sc, dgx_ref, dnr_ref, kk):
        hprev = hp_k.astype(jnp.float32)
        gh = _dot(hp_k, wh)
        r, z, n, ghn = _gru_gates(gh, gx_k.astype(jnp.float32), bn, H)
        dh = dy_k.astype(jnp.float32) + dh_sc[:]
        dz = dh * (hprev - n)
        dn_pre = dh * (1.0 - z) * (1.0 - n * n)
        dr_pre = dn_pre * ghn * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dnr = dn_pre * r
        dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1).astype(dt)
        dgx_ref[kk] = dgx
        dnr_ref[kk] = dnr.astype(dt)
        # dh_{t-1}: direct path z⊙h + the three recurrent branches
        dgh = jnp.concatenate([dr_pre, dz_pre, dnr], axis=-1).astype(dt)
        dh_sc[:] = dh * z + _dot(dgh, wht)

    for k in range(K):
        kf = K - 1 - k
        bptt(gxf_ref[kf], hpf_ref[kf], dyf_ref[kf], whf, whtf, bnf,
             dhf, dgxf_ref, dnrf_ref, kf)
        bptt(gxb_ref[k], hpb_ref[k], dyb_ref[k], whb, whtb, bnb,
             dhb, dgxb_ref, dnrb_ref, k)


def _bigru_bwd_pallas(gx_f, gx_b, wh_f, wh_b, bn_f, bn_b,
                      hp_f, hp_b, dyf, dyb, interpret=False):
    T, B, H3 = gx_f.shape
    H = H3 // 3
    dt = gx_f.dtype
    # in: 2×3H (gx) + 2×H (hp) + 2×H (dy); out: 2×3H (dgx) + 2×H (dnr)
    # → 18H per frame
    K = _pick_block(T, B, H, gx_f.dtype.itemsize, 18,
                    _fixed_bytes(B, H, gx_f.dtype.itemsize, 2 * 2 * 3, 2))
    G = T // K

    blk = lambda i: (G - 1 - i, 0, 0)
    fblk = lambda i: (i, 0, 0)
    w0 = lambda i: (0, 0)
    spec3 = lambda m: pl.BlockSpec((K, B, H3), m, memory_space=pltpu.VMEM)
    hspec = lambda m: pl.BlockSpec((K, B, H), m, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gru_bwd_kernel,
        grid=(G,),
        in_specs=[
            spec3(blk),                                      # gx_f
            spec3(fblk),                                     # gx_b
            pl.BlockSpec((H, H3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), w0, memory_space=pltpu.VMEM),
            hspec(blk),                                      # hprev_f
            hspec(fblk),                                     # hprev_b
            hspec(blk),                                      # dyf
            hspec(fblk),                                     # dyb
        ],
        out_specs=(
            spec3(blk),
            spec3(fblk),
            hspec(blk),
            hspec(fblk),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H3), dt),
            jax.ShapeDtypeStruct((T, B, H3), dt),
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((T, B, H), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(gx_f, gx_b, wh_f, wh_b, bn_f[None, :], bn_b[None, :],
      wh_f.T, wh_b.T, hp_f, hp_b, dyf, dyb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bigru_core(gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, interpret=False):
    """(T, B, 3H) pre-computed input projections per direction + (H, 3H)
    recurrent kernels + (H,) recurrent n-branch biases → (yf, yb)."""
    return _bigru_fwd_pallas(gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, interpret)


def _gru_core_fwd(gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, interpret):
    yf, yb = _bigru_fwd_pallas(gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, interpret)
    return (yf, yb), (gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, yf, yb)


def _gru_core_bwd(interpret, res, grads):
    gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, yf, yb = res
    dyf, dyb = grads
    z = jnp.zeros_like(yf[:1])
    hp_f = jnp.concatenate([z, yf[:-1]], axis=0)
    hp_b = jnp.concatenate([yb[1:], z], axis=0)
    dgx_f, dgx_b, dnr_f, dnr_b = _bigru_bwd_pallas(
        gx_f, gx_b, wh_f, wh_b, bn_f, bn_b, hp_f, hp_b, dyf, dyb, interpret
    )
    H = wh_f.shape[0]

    def dwh(hp, dgx, dnr):
        d = jnp.concatenate([dgx[..., : 2 * H], dnr], axis=-1)
        return jnp.einsum("tbh,tbg->hg", hp, d)

    dwh_f = dwh(hp_f, dgx_f, dnr_f).astype(wh_f.dtype)
    dwh_b = dwh(hp_b, dgx_b, dnr_b).astype(wh_b.dtype)
    dbn_f = jnp.sum(dnr_f.astype(jnp.float32), axis=(0, 1)).astype(bn_f.dtype)
    dbn_b = jnp.sum(dnr_b.astype(jnp.float32), axis=(0, 1)).astype(bn_b.dtype)
    return dgx_f, dgx_b, dwh_f, dwh_b, dbn_f, dbn_b


bigru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


def bigru_pallas(
    x: jax.Array,
    wi_f: jax.Array,
    wh_f: jax.Array,
    b_f: jax.Array,
    bn_f: jax.Array,
    wi_b: jax.Array,
    wh_b: jax.Array,
    b_b: jax.Array,
    bn_b: jax.Array,
    interpret: bool = False,
    shard_mesh=None,
    shard_axis: str = "data",
) -> jax.Array:
    """(B, T, D) → (B, T, 2H) fused bidirectional GRU (flax ``GRUCell``
    math). ``b`` is the input-projection bias (r, z, n concatenated);
    ``bn`` the recurrent n-branch bias. ``shard_mesh``: as bilstm_pallas."""
    gx_f = (x @ wi_f + b_f).swapaxes(0, 1)  # (T, B, 3H)
    gx_b = (x @ wi_b + b_b).swapaxes(0, 1)
    core = lambda gf, gb, wf, wb, nf, nb: bigru_core(gf, gb, wf, wb, nf, nb, interpret)
    if _want_shard(shard_mesh, shard_axis, gx_f.shape[1]):
        core = _shard_over_batch(core, 4, shard_mesh, shard_axis)
    yf, yb = core(gx_f, gx_b, wh_f, wh_b, bn_f, bn_b)
    return jnp.concatenate([yf, yb], axis=-1).swapaxes(0, 1)
