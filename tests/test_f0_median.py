import numpy as np

from percivaltts_tpu.ops.f0 import _median5, estimate_f0

FS = 16000


def test_median5_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=50).astype(np.float32)
    ours = np.asarray(_median5(x))
    padded = np.concatenate([x[:1], x[:1], x, x[-1:], x[-1:]])
    oracle = np.array([np.median(padded[i : i + 5]) for i in range(50)])
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_octave_error_suppressed():
    """A harmonic signal with a brief corrupted segment: the 5-frame median
    keeps the track on the true f0 through isolated estimator glitches."""
    f0 = 150.0
    t = np.arange(int(0.5 * FS)) / FS
    rng = np.random.default_rng(1)
    x = np.zeros_like(t)
    for k in range(1, 40):
        x += np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / (
            1 + (k * f0 / 800.0) ** 2
        )
    x = (x / np.abs(x).max() * 0.7).astype(np.float32)
    # corrupt 2 frames' worth of samples with loud noise (a click)
    x[4000:4160] += rng.normal(size=160).astype(np.float32) * 1.5
    res = estimate_f0(x, FS, hop=80)
    f = np.asarray(res.f0)
    v = np.asarray(res.vuv)
    core = (np.arange(len(f)) > 10) & (np.arange(len(f)) < len(f) - 10) & (v > 0.5)
    rel = np.abs(f[core] - f0) / f0
    # no frame in the voiced core may sit at an octave error
    assert np.max(rel) < 0.25, np.max(rel)
    assert np.median(rel) < 0.02
