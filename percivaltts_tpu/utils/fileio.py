"""Binary float32 feature-file I/O.

Reference parity: the Merlin-style headerless float32 feature files written
and read throughout percivaltts (compose.py / data.py; SURVEY.md §1 "file-
mediated design"). The on-disk format is kept bit-compatible (raw little-
endian float32, row-major ``(frames, dim)``) so feature files produced by the
reference pipeline can be consumed directly for parity checks.

A native C++ fast path (percivaltts_tpu/native) is used transparently when
built; the numpy path is the always-available fallback.
"""

from __future__ import annotations

import os

import numpy as np


def load_binary_file(path: str, dim: int, dtype=np.float32) -> np.ndarray:
    """Load a headerless binary feature file as ``(frames, dim)``."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    if dtype == np.float32:
        from percivaltts_tpu import native

        if native.available():
            return native.read_f32(path, dim)
    data = np.fromfile(path, dtype=dtype)
    if data.size % dim != 0:
        raise ValueError(
            f"{path}: size {data.size} is not a multiple of dim {dim}"
        )
    return data.reshape(-1, dim)


def save_binary_file(path: str, arr: np.ndarray, dtype=np.float32) -> None:
    """Save ``(frames, dim)`` float features as a headerless binary file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.ascontiguousarray(arr, dtype=dtype)
    if dtype == np.float32:
        from percivaltts_tpu import native

        if native.write_f32(path, arr):
            return
    arr.tofile(path)
