import numpy as np
import pytest

from percivaltts_tpu import native


def test_native_builds_and_loads():
    # the environment ships g++; the native data plane must actually build
    assert native.available(), "libpercival_native.so failed to build/load"


def test_read_write_f32_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(57, 13)).astype(np.float32)
    p = str(tmp_path / "x.f32")
    a.tofile(p)
    b = native.read_f32(p, 13)
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        native.read_f32(p, 14)
    with pytest.raises(FileNotFoundError):
        native.read_f32(str(tmp_path / "missing.f32"), 13)


def test_assemble_batch_matches_numpy():
    rng = np.random.default_rng(1)
    arrays = [rng.normal(size=(n, 5)).astype(np.float32) for n in (10, 25, 64, 3)]
    offsets = [0, 5, 0, 0]
    lengths = [10, 20, 64, 3]
    bound = 64
    out, mask = native.assemble_batch(arrays, offsets, lengths, bound)
    assert out.shape == (4, 64, 5) and mask.shape == (4, 64)
    for j, a in enumerate(arrays):
        n = lengths[j]
        np.testing.assert_array_equal(out[j, :n], a[offsets[j] : offsets[j] + n])
        assert np.all(out[j, n:] == 0.0)
        np.testing.assert_array_equal(mask[j], ([1.0] * n + [0.0] * (bound - n)))


def test_normalize_inplace_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(100, 7)).astype(np.float32)
    shift = rng.normal(size=7).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=7).astype(np.float32)
    expected = (x - shift) * scale
    got = native.normalize_inplace(x.copy(), shift, scale)
    np.testing.assert_allclose(got, expected, rtol=1e-6)
