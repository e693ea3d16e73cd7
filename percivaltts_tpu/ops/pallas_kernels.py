"""Pallas TPU kernels for the DSP hot loops: framing+window and overlap-add.

Reference parity: the per-frame Python loops of percivaltts's vendored
pulsemodel/sigproc analysis & synthesis (SURVEY.md §2 "PML vocoder", §3.1/3.4
hot loops). Here the whole utterance is processed by TPU kernels:

* ``frame_window``: signal → windowed overlapping frames. Frame starts are
  hop-aligned, so framing is R = ceil(frame_len/hop) *shifted contiguous
  copies* of the hop-blocked signal — no gather. Each grid program issues R
  overlapping async DMAs (HBM→VMEM), overlaps them, and fuses the window
  multiply on the VPU.
* ``overlap_add``: frames → signal, the scatter-free dual: output block t is
  Σ_r frames[t−r][chunk r]; each program DMAs R shifted row-spans and
  accumulates in VMEM.

Mosaic tiling notes (learned against the real v5e compiler):
* hop (e.g. 80) is smaller than the 128-lane tile and Mosaic rejects any
  slice/DMA whose minor dimension isn't 128-aligned — so the hop axis is
  **lane-padded to 128** host-side (zeros in lanes hop..127) and stripped
  after the kernel. The r-chunk index lives on a *leading* (untiled)
  dimension, selected statically or via DMA source offsets; every VMEM
  read/write is a full (rows, 128) tile.

The XLA implementations in ``ops/stft.py`` use the identical shifted-block
scheme and are the numerical oracles (tests/test_pallas.py: interpret mode
on CPU, compiled on TPU).

Measured on v5e (10 s of 16 kHz audio, fl=400, hop=80, hard-synced): the XLA
shifted-view path runs 2.0 ms (frame) / 1.8 ms (OLA) vs 40 / 23 ms for these
kernels — the 80→128 lane-padding relayout and per-program DMA serialization
cost more than XLA's fused slicing, so **stft()/istft() default to the XLA
path**; the kernels remain as compiled-and-verified alternates for shapes
where manual DMA scheduling wins (e.g. hop a multiple of 128).

Where Pallas DOES win in this codebase is the *latency*-bound construct XLA
cannot flatten — the BLSTM recurrence: see ``ops/lstm_pallas.py`` (2.5×
over the XLA scan on the training path, used by default on TPU).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# frames (or output hop-blocks) per grid program
_FB = 256
_LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def frame_window(
    x: jax.Array,
    frame_length: int,
    hop: int,
    window: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Centered framing + window: (n,) → (ceil(n/hop), frame_length).

    Matches ``ops.stft.frame_signal(x, frame_length, hop) * window``.
    """
    n = x.shape[0]
    nf = _cdiv(n, hop)
    R = _cdiv(frame_length, hop)
    W = R * hop
    half = frame_length // 2
    nf_pad = _cdiv(nf, _FB) * _FB
    HP = _LANES if hop <= _LANES else _cdiv(hop, _LANES) * _LANES

    total = (nf_pad + R + 1) * hop + half
    total = _cdiv(total, hop) * hop
    xp = jnp.zeros((total,), x.dtype).at[half : half + n].set(x)
    # hop-aligned signal blocks, lane-padded to HP
    x2d = jnp.zeros((total // hop, HP), x.dtype).at[:, :hop].set(
        xp.reshape(-1, hop)
    )

    wsrc = jnp.zeros((W,), x.dtype)
    if window is None:
        wsrc = wsrc.at[:frame_length].set(1.0)
    else:
        wsrc = wsrc.at[:frame_length].set(window.astype(x.dtype))
    w3 = jnp.zeros((R, 1, HP), x.dtype).at[:, 0, :hop].set(wsrc.reshape(R, hop))

    def kernel(x_hbm, w_ref, out_ref):
        g = pl.program_id(0)

        def body(scratch, sems):
            copies = []
            for r in range(R):
                dma = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(g * _FB + r, _FB), :],
                    scratch.at[r],
                    sems.at[r],
                )
                dma.start()
                copies.append(dma)
            for r in range(R):
                copies[r].wait()
                out_ref[r] = scratch[r] * w_ref[r]

        pl.run_scoped(
            body,
            pltpu.VMEM((R, _FB, HP), x.dtype),
            pltpu.SemaphoreType.DMA((R,)),
        )

    out = pl.pallas_call(
        kernel,
        grid=(nf_pad // _FB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((R, 1, HP), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (R, _FB, HP), lambda g: (0, g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, nf_pad, HP), x.dtype),
        interpret=interpret,
    )(x2d, w3)
    frames = out[:, :nf, :hop].transpose(1, 0, 2).reshape(nf, W)
    return frames[:, :frame_length]


def overlap_add(
    frames: jax.Array,
    hop: int,
    out_length: int,
    interpret: bool = False,
) -> jax.Array:
    """Centered overlap-add: (nf, frame_length) → (out_length,).

    Matches ``ops.stft.overlap_add(frames, hop, out_length)``.
    """
    nf, fl = frames.shape
    R = _cdiv(fl, hop)
    W = R * hop
    half = fl // 2
    HP = _LANES if hop <= _LANES else _cdiv(hop, _LANES) * _LANES

    out_blocks = nf + R
    ob_pad = _cdiv(out_blocks, _FB) * _FB

    # (rows, R, HP): row p holds frame p-(R-1), split into lane-padded chunks
    fp = jnp.zeros((ob_pad + R, W), frames.dtype)
    fp = fp.at[R - 1 : R - 1 + nf, :fl].set(frames)
    fp3 = jnp.zeros((ob_pad + R, R, HP), frames.dtype).at[:, :, :hop].set(
        fp.reshape(ob_pad + R, R, hop)
    )

    def kernel(f_hbm, out_ref):
        g = pl.program_id(0)

        def body(scratch, sems):
            copies = []
            for r in range(R):
                dma = pltpu.make_async_copy(
                    f_hbm.at[pl.ds(g * _FB + (R - 1 - r), _FB), r, :],
                    scratch.at[r],
                    sems.at[r],
                )
                dma.start()
                copies.append(dma)
            copies[0].wait()
            acc = scratch[0]
            for r in range(1, R):
                copies[r].wait()
                acc = acc + scratch[r]
            out_ref[:, :] = acc

        pl.run_scoped(
            body,
            pltpu.VMEM((R, _FB, HP), frames.dtype),
            pltpu.SemaphoreType.DMA((R,)),
        )

    out = pl.pallas_call(
        kernel,
        grid=(ob_pad // _FB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_FB, HP), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ob_pad, HP), frames.dtype),
        interpret=interpret,
    )(fp3)
    flat = out[:, :hop].reshape(-1)
    return jax.lax.dynamic_slice(flat, (half,), (out_length,))
