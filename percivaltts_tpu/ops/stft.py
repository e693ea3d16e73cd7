"""Framing, windows, STFT / inverse-STFT (overlap-add).

Reference parity: the framing/FFT DSP substrate of percivaltts's vendored
``pulsemodel/sigproc`` utilities (SURVEY.md §2 "PML vocoder", L0 layer) —
there it is per-frame Python/scipy loops over the corpus; here every
utterance is processed as one batched tensor op: framing and overlap-add are
R = ceil(frame_len/hop) shifted contiguous views (no gather/scatter — frame
starts are hop-aligned), the FFT is XLA's batched rfft — all jit-able and
VPU-friendly with static shapes.

``percivaltts_tpu.ops.pallas_kernels`` implements the same scheme as Pallas
TPU kernels with this module as their numerical oracle; measured on v5e the
XLA path wins (see the kernel module docstring), so it is the default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches scipy.signal.get_window('hann', n))."""
    n = jnp.arange(length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / length)


def num_frames(num_samples: int, frame_length: int, hop: int) -> int:
    """Frames for a center-padded analysis: one frame per hop covering the
    whole signal."""
    return int(np.ceil(num_samples / hop))


def frame_signal(
    x: jax.Array, frame_length: int, hop: int, pad: bool = True
) -> jax.Array:
    """Slice a 1-D signal into overlapping frames ``(num_frames, frame_length)``.

    Frames are centered on t = i·hop (center-padding with zeros), matching
    the convention that frame i describes the signal around sample i·hop.

    Implementation: because frame starts are multiples of ``hop``, framing is
    R = ceil(frame_length/hop) *shifted contiguous views* of the signal
    reshaped to (blocks, hop) — pure slicing, no index gather, vectorizes
    cleanly on the VPU (and is the scheme the Pallas kernel uses).
    """
    n = x.shape[0]
    # tail padding must cover total_blocks·hop below for ANY frame/hop ratio
    # (short frames with large hops included): R·hop + 2·hop is the bound on
    # what the blocked view can read past the signal
    if pad:
        half = frame_length // 2
        nf = num_frames(n, frame_length, hop)
        x = jnp.pad(x, (half, frame_length + 3 * hop))
    else:
        nf = max(1 + (n - frame_length) // hop, 0)
        x = jnp.pad(x, (0, frame_length + 3 * hop))
    R = -(-frame_length // hop)
    total_blocks = nf + R + 1
    x2d = x[: total_blocks * hop].reshape(total_blocks, hop)
    cols = [x2d[r : r + nf] for r in range(R)]  # each (nf, hop)
    frames = jnp.stack(cols, axis=1).reshape(nf, R * hop)
    return frames[:, :frame_length]


def stft(
    x: jax.Array,
    frame_length: int,
    hop: int,
    dftlen: Optional[int] = None,
    window: Optional[jax.Array] = None,
) -> jax.Array:
    """Short-time Fourier transform → ``(num_frames, dftlen//2 + 1)`` complex."""
    dftlen = dftlen or frame_length
    window = hann_window(frame_length) if window is None else window
    frames = frame_signal(x, frame_length, hop) * window[None, :]
    return jnp.fft.rfft(frames, n=dftlen, axis=-1)


def overlap_add(frames: jax.Array, hop: int, out_length: int) -> jax.Array:
    """Overlap-add synthesis: ``(num_frames, frame_length)`` → ``(out_length,)``.

    Frame i is added centered at sample i·hop (inverse of ``frame_signal``'s
    centering). Implemented as R = ceil(frame_length/hop) shifted vectorized
    adds over an (nf, R, hop) view — no scatter, no index arithmetic (the
    dual of ``frame_signal``'s scheme, and what the Pallas kernel uses).
    """
    nf, fl = frames.shape
    half = fl // 2
    R = -(-fl // hop)
    fp = jnp.pad(frames, ((0, 0), (0, R * hop - fl))).reshape(nf, R, hop)
    total_blocks = nf + R
    buf = jnp.zeros((total_blocks, hop), frames.dtype)
    for r in range(R):
        buf = buf.at[r : r + nf].add(fp[:, r, :])
    out = buf.reshape(-1)  # length (nf+R)·hop ≥ half + out_length
    return out[half : half + out_length]


def istft(
    spec: jax.Array,
    frame_length: int,
    hop: int,
    out_length: int,
    window: Optional[jax.Array] = None,
) -> jax.Array:
    """Inverse STFT with windowed overlap-add and COLA normalization."""
    window = hann_window(frame_length) if window is None else window
    frames = jnp.fft.irfft(spec, axis=-1)[:, :frame_length] * window[None, :]
    y = overlap_add(frames, hop, out_length)
    # normalize by the window-square overlap (COLA denominator)
    wsq = overlap_add(
        jnp.tile((window * window)[None, :], (spec.shape[0], 1)), hop, out_length
    )
    return y / jnp.maximum(wsq, 1e-8)
