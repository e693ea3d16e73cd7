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


def test_demo_encode_f0_mode(tmp_path):
    """encode_f0=True writes each utterance's base-f0 draw INTO the labels
    (&<hz>! context suffix + CQS F0_Base question) — the corpus-realism
    axis that makes F0 RMSE model-limited instead of corpus-limited
    (BASELINE.md "attribution CLOSED"). Acoustics must be byte-identical
    to the default corpus; only the label information content changes."""
    from percivaltts_tpu.data.demo import generate_demo_corpus
    from percivaltts_tpu.data.hts_labels import (
        QuestionSet,
        binarize_label_file,
    )

    a, e = str(tmp_path / "a"), str(tmp_path / "e")
    generate_demo_corpus(a, num_utterances=3, fs=16000, seed=11)
    generate_demo_corpus(e, num_utterances=3, fs=16000, seed=11, encode_f0=True)

    def rd(root, rel):
        with open(os.path.join(root, rel), "rb") as f:
            return f.read()

    for i in range(3):
        assert rd(a, f"wav/demo{i:04d}.wav") == rd(e, f"wav/demo{i:04d}.wav")
        assert rd(a, f"f0ref/demo{i:04d}.npy") == rd(e, f"f0ref/demo{i:04d}.npy")

    qa = QuestionSet.from_hed(os.path.join(a, "questions.hed"))
    qe = QuestionSet.from_hed(os.path.join(e, "questions.hed"))
    assert qe.dim == qa.dim + 1  # the F0_Base CQS, appended last

    bases = []
    for i in range(3):
        arr = binarize_label_file(
            os.path.join(e, "label_state_align", f"demo{i:04d}.lab"), qe
        )
        col = arr[:, qa.dim]  # F0_Base answers
        # constant across the utterance (a per-utterance scalar feature)
        assert float(col.std()) == 0.0
        base = float(col[0])
        bases.append(base)
        # and it is the TRUE base: the f0ref voiced means sit in its
        # declination band (contour = base * [0.85..1.02])
        tr = np.load(os.path.join(e, "f0ref", f"demo{i:04d}.npy"))
        vm = float(tr[tr[:, 1] > 0.5, 0].mean())
        assert 0.8 * base < vm < 1.05 * base, (base, vm)
    # across utterances the column varies — it carries the draw
    assert np.std(bases) > 5.0, bases


def test_demo_replay_corpus_plans(tmp_path):
    """replay_corpus_plans must re-derive the SAME utterances (plans +
    canonical waveforms) as generate_demo_corpus without touching disk —
    it is the Monte-Carlo oracle substrate of scripts/pred_budget.py, so
    any RNG-consumption drift between the two would silently corrupt the
    error-budget's irreducible-floor term."""
    import scipy.io.wavfile as wavfile

    from percivaltts_tpu.data.demo import (
        generate_demo_corpus,
        replay_corpus_plans,
    )

    root = str(tmp_path / "c")
    kw = dict(num_utterances=3, fs=16000, seed=23, jitter=0.1)
    ids = generate_demo_corpus(root, **kw)
    plans = list(replay_corpus_plans(**kw))
    assert [p[0] for p in plans] == ids
    shift = 0.005
    for uid, seq, durs, f0_base, wav in plans:
        _, disk = wavfile.read(os.path.join(root, "wav", uid + ".wav"))
        # replay quantized exactly as save_wav writes must match the file
        rep = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
        assert np.array_equal(disk, rep)
        # the plan is frame-quantized and consistent with the label file
        with open(
            os.path.join(root, "label_state_align", uid + ".lab")
        ) as f:
            n_states = len(f.read().strip().split("\n"))
        assert n_states == 5 * len(seq)
        assert all(abs(d / shift - round(d / shift)) < 1e-6 for d in durs)
        assert 110.0 <= f0_base <= 220.0


def test_demo_acoustic_stressors(tmp_path):
    """noise_snr_db / reverb_ms stress ONLY the acoustic conditions: labels,
    questions and f0ref stay byte-identical to the clean corpus (the base
    RNG draws are untouched), waveforms change, and the stressed corpus is
    itself deterministic."""
    from percivaltts_tpu.data.demo import generate_demo_corpus

    a, n, n2, r = (str(tmp_path / d) for d in ("a", "n", "n2", "r"))
    generate_demo_corpus(a, num_utterances=2, fs=16000, seed=11)
    generate_demo_corpus(n, num_utterances=2, fs=16000, seed=11, noise_snr_db=20.0)
    generate_demo_corpus(n2, num_utterances=2, fs=16000, seed=11, noise_snr_db=20.0)
    generate_demo_corpus(r, num_utterances=2, fs=16000, seed=11, reverb_ms=120.0)

    def rd(root, rel):
        with open(os.path.join(root, rel), "rb") as f:
            return f.read()

    for rel in (
        "questions.hed",
        "fileids.scp",
        os.path.join("label_state_align", "demo0000.lab"),
        os.path.join("f0ref", "demo0001.npy"),
    ):
        assert rd(a, rel) == rd(n, rel) == rd(r, rel)
    wav = os.path.join("wav", "demo0000.wav")
    assert rd(n, wav) == rd(n2, wav)  # stressors deterministic
    assert rd(a, wav) != rd(n, wav)  # noise moved the acoustics
    assert rd(a, wav) != rd(r, wav)  # reverb moved the acoustics
    assert rd(n, wav) != rd(r, wav)
