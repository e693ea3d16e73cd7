"""ops.morph: 1-D frame-axis morphology shared by the vocoder gates."""

import numpy as np

from percivaltts_tpu.ops.morph import dilate1d, erode1d


def _naive(x, radius, op):
    nf = len(x)
    out = np.empty_like(x)
    for i in range(nf):
        lo, hi = max(0, i - radius), min(nf, i + radius + 1)
        out[i] = op(x[lo:hi])
    return out


def test_dilate_erode_match_naive_running_extrema():
    rng = np.random.default_rng(0)
    x = rng.normal(size=37).astype(np.float32)
    for r in (0, 1, 2, 4):
        np.testing.assert_array_equal(
            np.asarray(dilate1d(x, r)), _naive(x, r, np.max)
        )
        np.testing.assert_array_equal(
            np.asarray(erode1d(x, r)), _naive(x, r, np.min)
        )


def test_2d_operates_along_frames_only():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(23, 5)).astype(np.float32)
    got = np.asarray(dilate1d(x, 3))
    for j in range(x.shape[1]):
        np.testing.assert_array_equal(got[:, j], _naive(x[:, j], 3, np.max))


def test_mask_round_trip():
    # dilate-then-erode of an isolated marker recovers it (closing)
    x = np.zeros(20, np.float32)
    x[10] = 1.0
    d = np.asarray(dilate1d(x, 2))
    assert d[8:13].min() == 1.0 and d.sum() == 5.0
    e = np.asarray(erode1d(d, 2))
    assert e[10] == 1.0 and e.sum() == 1.0
