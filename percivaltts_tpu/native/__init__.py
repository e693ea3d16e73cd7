"""ctypes bindings for the native host data plane (``native/``).

Auto-builds ``libpercival_native.so`` with g++ on first use when missing;
every entry point has a numpy fallback so the framework runs without a
toolchain. See ``native/percival_native.cpp`` for the parity notes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpercival_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "percival_native.cpp")
    if not os.path.exists(src):
        return False
    # Serialize concurrent builders (multi-host training on a shared
    # filesystem, parallel pytest workers): an flock around make prevents a
    # process from dlopen-ing a half-written .so mid-rebuild.
    lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
    lock = None
    try:
        # Lock acquisition must not disable the build: on platforms
        # without fcntl or with a read-only package dir, fall back to the
        # (pre-lock) unlocked build rather than silently skipping it.
        try:
            import fcntl

            lock = open(lock_path, "w")
            fcntl.flock(lock, fcntl.LOCK_EX)
        except Exception:
            if lock is not None:
                lock.close()
            lock = None
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        finally:
            if lock is not None:
                import fcntl

                fcntl.flock(lock, fcntl.LOCK_UN)
                lock.close()
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    ``make`` runs unconditionally (it no-ops when the .so is newer than the
    sources) so a stale or foreign-ISA binary is rebuilt for THIS host —
    the library is compiled with -march=native and must never ship
    prebuilt. If the build toolchain is missing but a .so exists, it is
    used best-effort."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    built = _build()
    if not built and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.pn_file_f32_count.restype = ctypes.c_int64
    lib.pn_file_f32_count.argtypes = [ctypes.c_char_p]
    lib.pn_read_f32.restype = ctypes.c_int64
    lib.pn_read_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pn_write_f32.restype = ctypes.c_int64
    lib.pn_write_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pn_assemble_batch.restype = None
    lib.pn_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.pn_normalize.restype = None
    lib.pn_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_f32(path: str, dim: int) -> np.ndarray:
    """Native raw-float32 feature-file read → (frames, dim); numpy fallback."""
    lib = get_lib()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, dim)
    count = lib.pn_file_f32_count(path.encode())
    if count == -2:
        # exists but its byte size is not a multiple of 4 — data corruption,
        # not a missing file (matches the numpy fallback's ValueError)
        raise ValueError(f"{path}: truncated/corrupt float32 file")
    if count < 0:
        raise FileNotFoundError(path)
    if count % dim != 0:
        raise ValueError(f"{path}: size {count} not a multiple of dim {dim}")
    out = np.empty(count, dtype=np.float32)
    got = lib.pn_read_f32(path.encode(), _fptr(out), count)
    if got != count:
        raise IOError(f"{path}: short read {got}/{count}")
    return out.reshape(-1, dim)


def write_f32(path: str, arr: np.ndarray) -> bool:
    """Native raw-float32 feature-file write. Returns False when the native
    library is unavailable (caller falls back to numpy), raises on a short
    write."""
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    put = lib.pn_write_f32(path.encode(), _fptr(arr), arr.size)
    if put != arr.size:
        raise IOError(f"{path}: short write {put}/{arr.size}")
    return True


def assemble_batch(
    arrays: Sequence[np.ndarray],
    offsets: Sequence[int],
    lengths: Sequence[int],
    bound: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Padded batch (B, bound, dim) + mask (B, bound) from per-utterance
    float32 (frames, dim) matrices; native C++ path with numpy fallback."""
    B = len(arrays)
    dim = arrays[0].shape[1]
    out = np.empty((B, bound, dim), dtype=np.float32)
    mask = np.empty((B, bound), dtype=np.float32)
    lib = get_lib()
    if lib is None:
        out[:] = 0.0
        mask[:] = 0.0
        for j, a in enumerate(arrays):
            n = lengths[j]
            out[j, :n] = a[offsets[j] : offsets[j] + n]
            mask[j, :n] = 1.0
        return out, mask
    arrays = [np.ascontiguousarray(a, dtype=np.float32) for a in arrays]
    PtrArray = ctypes.POINTER(ctypes.c_float) * B
    srcs = PtrArray(*[_fptr(a) for a in arrays])
    ln = np.asarray(lengths, dtype=np.int32)
    of = np.asarray(offsets, dtype=np.int32)
    lib.pn_assemble_batch(
        srcs,
        ln.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        of.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B,
        bound,
        dim,
        _fptr(out),
        _fptr(mask),
    )
    return out, mask


def normalize_inplace(x: np.ndarray, shift: np.ndarray, scale: np.ndarray) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    if lib is None:
        x -= shift
        x *= scale
        return x
    lib.pn_normalize(
        _fptr(x),
        x.shape[0],
        x.shape[1],
        _fptr(np.ascontiguousarray(shift, np.float32)),
        _fptr(np.ascontiguousarray(scale, np.float32)),
    )
    return x
