"""Demo-corpus fetcher (percivaltts_tpu/data/fetch.py — the reference's
"demo data fetch" component, SURVEY §2). The download leg is untestable
here (zero-egress environment) and covered only by its error path; the
extraction / layout-discovery / normalization / validation legs run for
real on fabricated slt_arctic-shaped archives, ending in an actual
``compose`` over the fetched tree."""

import io
import os
import tarfile

import numpy as np
import pytest

from percivaltts_tpu.data.fetch import fetch_demo_corpus


def _add_bytes(tar, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tar.addfile(info, io.BytesIO(data))


def _tiny_wav_bytes(fs=16000, sec=0.3, seed=0) -> bytes:
    import scipy.io.wavfile as wavfile

    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * sec)) / fs
    x = 0.3 * np.sin(2 * np.pi * 140.0 * t) + 0.01 * rng.standard_normal(
        t.shape
    )
    buf = io.BytesIO()
    wavfile.write(buf, fs, (x * 32767).astype(np.int16))
    return buf.getvalue()


def _lab_text(sec=0.3) -> str:
    # HTS full-context lines in 100 ns units, state-aligned ([k] suffix)
    n = int(sec * 1e7)
    third = n // 3
    lines = []
    for i, ph in enumerate(("sil", "a", "sil")):
        s, e = i * third, (i + 1) * third
        step = (e - s) // 3
        for k in range(2, 5):
            lines.append(
                f"{s + (k - 2) * step} {s + (k - 1) * step} "
                f"x^x-{ph}+x=x@1_1[{k}]"
            )
    return "\n".join(lines) + "\n"


QUESTIONS = 'QS "C-a" {*-a+*}\nQS "C-sil" {*-sil+*}\nCQS "Pos" {@(\\d+)_}\n'


def _make_archive(path, ids=("utt1", "utt2"), nested="slt_arctic_merlin_full",
                  label_dir="label_state_align", with_fileids=True,
                  with_questions=True):
    with tarfile.open(path, "w:gz") as tar:
        pre = (nested + "/") if nested else ""
        for i, uid in enumerate(ids):
            _add_bytes(tar, f"{pre}wav/{uid}.wav", _tiny_wav_bytes(seed=i))
            _add_bytes(
                tar, f"{pre}{label_dir}/{uid}.lab", _lab_text().encode()
            )
        if with_questions:
            _add_bytes(
                tar, f"{pre}questions-radio_dnn_416.hed", QUESTIONS.encode()
            )
        if with_fileids:
            _add_bytes(
                tar, f"{pre}file_id_list_full.scp",
                ("\n".join(ids) + "\n").encode(),
            )
    return path


def test_fetch_from_local_archive_normalizes_layout(tmp_path):
    arc = _make_archive(str(tmp_path / "c.tar.gz"))
    dest = str(tmp_path / "corpus")
    info = fetch_demo_corpus(dest, archive=arc)
    assert info["n_utts"] == 2
    assert info["label_dir"] == "label_state_align"
    assert os.path.exists(os.path.join(dest, "wav", "utt1.wav"))
    assert os.path.exists(os.path.join(dest, "label_state_align", "utt2.lab"))
    assert os.path.exists(os.path.join(dest, "questions.hed"))
    with open(os.path.join(dest, "fileids.scp")) as f:
        assert [ln.strip() for ln in f if ln.strip()] == ["utt1", "utt2"]

    # the fetched tree must actually compose (the real downstream contract)
    from percivaltts_tpu.config import Configuration, DataConfig, VocoderConfig
    from percivaltts_tpu.data.compose import compose

    cfg = Configuration(
        workdir=str(tmp_path / "exp"),
        data=DataConfig(
            corpus_dir=dest,
            question_file=os.path.join(dest, "questions.hed"),
            fileids=os.path.join(dest, "fileids.scp"),
            label_dim=0,
            num_valid=0,
            num_test=1,
        ),
        vocoder=VocoderConfig(fs=16000, spec_size=17, nm_size=5),
    )
    cc = compose(cfg)
    assert len(cc.train) + len(cc.valid) + len(cc.test) == 2
    for ds in (cc.train, cc.test):
        for c in ds.cmps:
            assert np.isfinite(c).all()


def test_fetch_phone_aligned_and_derived_fileids(tmp_path):
    arc = _make_archive(
        str(tmp_path / "c.tar.gz"),
        label_dir="label_phone_align",
        with_fileids=False,
        nested="deep/nest",
    )
    dest = str(tmp_path / "corpus")
    info = fetch_demo_corpus(dest, archive=arc)
    assert info["label_dir"] == "label_phone_align"
    # fileids derived from wav/ when the archive carries none
    with open(os.path.join(dest, "fileids.scp")) as f:
        assert [ln.strip() for ln in f if ln.strip()] == ["utt1", "utt2"]


def test_fetch_rejects_path_traversal(tmp_path):
    arc = str(tmp_path / "evil.tar.gz")
    with tarfile.open(arc, "w:gz") as tar:
        _add_bytes(tar, "../evil.txt", b"nope")
    with pytest.raises(ValueError, match="escapes"):
        fetch_demo_corpus(str(tmp_path / "corpus"), archive=arc)
    assert not os.path.exists(str(tmp_path.parent / "evil.txt"))


def test_fetch_errors_are_actionable(tmp_path):
    # not a corpus at all
    arc = str(tmp_path / "junk.tar.gz")
    with tarfile.open(arc, "w:gz") as tar:
        _add_bytes(tar, "readme.txt", b"hello")
    with pytest.raises(FileNotFoundError, match="wav/"):
        fetch_demo_corpus(str(tmp_path / "c1"), archive=arc)

    # corpus without a question set names the missing piece
    arc2 = _make_archive(str(tmp_path / "noq.tar.gz"), with_questions=False)
    with pytest.raises(FileNotFoundError, match="questions"):
        fetch_demo_corpus(str(tmp_path / "c2"), archive=arc2)

    # listed id with no files
    arc3 = str(tmp_path / "gap.tar.gz")
    with tarfile.open(arc3, "w:gz") as tar:
        _add_bytes(tar, "wav/utt1.wav", _tiny_wav_bytes())
        _add_bytes(tar, "label_state_align/utt1.lab", _lab_text().encode())
        _add_bytes(tar, "questions.hed", QUESTIONS.encode())
        _add_bytes(tar, "fileids.scp", b"utt1\nmissing_utt\n")
    with pytest.raises(FileNotFoundError, match="missing_utt"):
        fetch_demo_corpus(str(tmp_path / "c3"), archive=arc3)

    # offline download failure says how to resume from a local archive
    with pytest.raises(RuntimeError, match="--archive"):
        fetch_demo_corpus(
            str(tmp_path / "c4"),
            url="http://203.0.113.1/never.tar.gz",  # TEST-NET, blackholed
        )
