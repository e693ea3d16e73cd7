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


def test_radius_exceeding_length():
    # radius >= nf must reduce to the global extremum, not crash
    rng = np.random.default_rng(2)
    x = rng.normal(size=3).astype(np.float32)
    for r in (3, 6):
        np.testing.assert_array_equal(
            np.asarray(dilate1d(x, r)), np.full(3, x.max())
        )
        np.testing.assert_array_equal(
            np.asarray(erode1d(x, r)), np.full(3, x.min())
        )


def test_fill_from_interior():
    from percivaltts_tpu.ops.morph import fill_from_interior
    import jax.numpy as jnp

    x = np.arange(8, dtype=np.float32)[:, None]
    interior = np.zeros((8, 1), bool)
    interior[3:5] = True
    filled, reached = fill_from_interior(jnp.asarray(x), jnp.asarray(interior), 2)
    filled, reached = np.asarray(filled), np.asarray(reached)
    # values propagate outward from the interior, earlier frame winning
    np.testing.assert_array_equal(filled[:, 0], [0, 3, 3, 3, 4, 4, 4, 7])
    np.testing.assert_array_equal(reached[:, 0], [False, True, True, True, True, True, True, False])
    # untouched frames keep originals
    assert filled[0, 0] == 0 and filled[7, 0] == 7


def test_erode1d_bool_matches_and_chain():
    rng = np.random.default_rng(3)
    m = rng.random(30) > 0.5
    from percivaltts_tpu.ops.morph import erode1d

    got = np.asarray(erode1d(m[:, None], 3))[:, 0]
    want = _naive(m.astype(np.float32), 3, np.min).astype(bool)
    np.testing.assert_array_equal(got.astype(bool), want)
