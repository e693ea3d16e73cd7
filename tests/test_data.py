import os

import numpy as np
import pytest

from percivaltts_tpu.data.dataset import Dataset, cost_0pred_rmse, split_fileids
from percivaltts_tpu.data.normalize import NormStats, compute_meanstd, compute_minmax


def _toy_corpus(n=20, ldim=7, cdim=5, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(50, 400, size=n)
    labs = [rng.normal(size=(L, ldim)).astype(np.float32) for L in lens]
    cmps = [rng.normal(2.0, 3.0, size=(L, cdim)).astype(np.float32) for L in lens]
    return Dataset(labs=labs, cmps=cmps)


def test_split_fileids():
    ids = [f"u{i}" for i in range(10)]
    tr, va, te = split_fileids(ids, 2, 3)
    assert tr == ids[:5] and va == ids[5:7] and te == ids[7:]
    with pytest.raises(ValueError):
        split_fileids(ids, 5, 5)


def test_meanstd_roundtrip(tmp_path):
    ds = _toy_corpus()
    stats = compute_meanstd(ds.cmps)
    allc = np.concatenate(ds.cmps, axis=0)
    normed = stats.normalize(allc)
    np.testing.assert_allclose(normed.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(normed.std(axis=0), 1.0, atol=1e-3)
    back = stats.denormalize(normed)
    np.testing.assert_allclose(back, allc, rtol=1e-4, atol=1e-4)
    p = str(tmp_path / "stats.npz")
    stats.save(p)
    stats2 = NormStats.load(p)
    np.testing.assert_allclose(stats2.shift, stats.shift)
    np.testing.assert_allclose(stats2.scale, stats.scale)


def test_meanstd_keep_streams():
    ds = _toy_corpus(cdim=6)
    stats = compute_meanstd(ds.cmps, keep_streams=[(4, 6)])
    assert np.all(stats.shift[4:6] == 0.0) and np.all(stats.scale[4:6] == 1.0)
    assert not np.all(stats.scale[:4] == 1.0)


def test_minmax_range():
    ds = _toy_corpus()
    stats = compute_minmax(ds.labs, out_range=(0.01, 0.99))
    allx = np.concatenate(ds.labs, axis=0)
    normed = stats.normalize(allx)
    np.testing.assert_allclose(normed.min(axis=0), 0.01, atol=1e-4)
    np.testing.assert_allclose(normed.max(axis=0), 0.99, atol=1e-4)


def test_batches_static_shapes():
    ds = _toy_corpus(n=30)
    shapes = set()
    total = 0
    for batch in ds.batches(batch_size=4, bucket_bounds=(128, 256, 512), seed=1):
        assert batch["lab"].shape[0] == 4
        assert batch["lab"].shape[1] in (128, 256, 512)
        assert batch["mask"].shape == batch["lab"].shape[:2]
        # mask matches lengths
        np.testing.assert_array_equal(
            batch["mask"].sum(axis=1).astype(np.int32), batch["lengths"]
        )
        # padded region is zero
        for j in range(4):
            n = batch["lengths"][j]
            assert np.all(batch["cmp"][j, n:] == 0.0)
        shapes.add(batch["lab"].shape)
        total += 1
    assert total >= 1
    assert len(shapes) <= 3


def test_batches_crop_long():
    rng = np.random.default_rng(0)
    labs = [rng.normal(size=(900, 3)).astype(np.float32) for _ in range(4)]
    cmps = [rng.normal(size=(900, 2)).astype(np.float32) for _ in range(4)]
    ds = Dataset(labs=labs, cmps=cmps)
    batches = list(ds.batches(batch_size=4, bucket_bounds=(256,), seed=0))
    assert len(batches) == 1
    assert batches[0]["lab"].shape == (4, 256, 3)
    assert np.all(batches[0]["lengths"] == 256)


def test_cost_0pred():
    ds = _toy_corpus()
    c = cost_0pred_rmse(ds.cmps)
    allc = np.concatenate(ds.cmps)
    assert c == pytest.approx(float(np.sqrt(np.mean(allc**2))), rel=1e-6)


def test_epoch_reshuffles():
    ds = _toy_corpus(n=16)
    b0 = list(ds.batches(4, (512,), seed=7, epoch=0))
    b1 = list(ds.batches(4, (512,), seed=7, epoch=1))
    assert not np.allclose(b0[0]["lab"], b1[0]["lab"])


def test_demo_jitter_mode_one_to_many(tmp_path):
    """jitter > 0 must change ONLY the acoustics (unlabeled realization
    variability): labels/questions byte-identical to jitter=0, waveforms
    different; jitter=0 itself stays deterministic."""
    from percivaltts_tpu.data.demo import generate_demo_corpus

    a, a2, b = (str(tmp_path / d) for d in ("a", "a2", "b"))
    generate_demo_corpus(a, num_utterances=3, fs=16000, seed=11)
    generate_demo_corpus(a2, num_utterances=3, fs=16000, seed=11)
    generate_demo_corpus(b, num_utterances=3, fs=16000, seed=11, jitter=0.25)

    def rd(root, rel):
        with open(os.path.join(root, rel), "rb") as f:
            return f.read()

    for rel in (
        "questions.hed",
        "fileids.scp",
        os.path.join("label_state_align", "demo0000.lab"),
    ):
        assert rd(a, rel) == rd(a2, rel) == rd(b, rel)
    wav = os.path.join("wav", "demo0000.wav")
    assert rd(a, wav) == rd(a2, wav)  # deterministic
    assert rd(a, wav) != rd(b, wav)  # jitter moved the acoustics


def test_demo_speaker_f0_mode(tmp_path):
    """speaker_f0 > 0 pins every utterance's base f0 (single-speaker
    corpus): the ground-truth f0 tracks all sit on the pinned value's
    declination band (across-utterance mean-f0 std collapses vs the
    default's ~30 Hz draw), while labels/questions stay byte-identical —
    f0 never enters the labels in either mode."""
    import numpy as np

    from percivaltts_tpu.data.demo import generate_demo_corpus

    a, s = str(tmp_path / "a"), str(tmp_path / "s")
    generate_demo_corpus(a, num_utterances=4, fs=16000, seed=11)
    generate_demo_corpus(s, num_utterances=4, fs=16000, seed=11, speaker_f0=160.0)

    def rd(root, rel):
        with open(os.path.join(root, rel), "rb") as f:
            return f.read()

    for rel in (
        "questions.hed",
        "fileids.scp",
        os.path.join("label_state_align", "demo0002.lab"),
    ):
        assert rd(a, rel) == rd(s, rel)

    def voiced_means(root):
        out = []
        for i in range(4):
            tr = np.load(os.path.join(root, "f0ref", f"demo{i:04d}.npy"))
            v = tr[:, 1] > 0.5
            out.append(tr[v, 0].mean())
        return np.array(out)

    ms, ma = voiced_means(s), voiced_means(a)
    # pinned: every utterance mean within the declination band of 160 Hz
    assert np.all(ms > 160.0 * 0.8) and np.all(ms < 160.0 * 1.05), ms
    assert ms.std() < 5.0, ms
    # the default mode's across-utterance spread is the irreducible term
    assert ma.std() > 10.0, ma
