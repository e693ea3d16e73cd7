"""Real-corpus readiness (VERDICT round-3 item 8): the day a real
Merlin-layout corpus (slt_arctic) appears, ``cli compose`` must either work
or say exactly why not. These tests build small "foreign" corpora
exercising each failure path: wrong sample rate, unsupported wav encoding,
missing wav/label files, phone-aligned labels, label/audio misalignment."""

import os

import numpy as np
import pytest

from percivaltts_tpu.config import Configuration, DataConfig, VocoderConfig

pytestmark = pytest.mark.slow  # builds corpora + runs real analysis
from percivaltts_tpu.data.compose import compose, load_wav, save_wav
from percivaltts_tpu.data.demo import generate_demo_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("foreign"))
    ids = generate_demo_corpus(root, num_utterances=4, fs=16000, seed=3)
    return root, ids


def _cfg(root, **voc_kw):
    voc_kw.setdefault("fs", 16000)
    return Configuration(
        data=DataConfig(
            corpus_dir=root,
            fileids=os.path.join(root, "fileids.scp"),
            question_file=os.path.join(root, "questions.hed"),
            num_valid=1,
            num_test=1,
            bucket_bounds=(256,),
        ),
        vocoder=VocoderConfig(spec_size=33, nm_size=17, **voc_kw),
    )


def test_fs_mismatch_is_actionable(corpus):
    root, ids = corpus
    # config says 48 kHz but the corpus is 16 kHz (the common real-world
    # direction is the reverse; the check is symmetric)
    with pytest.raises(ValueError, match="resample|vocoder.fs"):
        compose(_cfg(root, fs=48000, shift_ms=5.0), fileids=ids)


def test_unsupported_wav_encoding_is_actionable(corpus, tmp_path):
    root, ids = corpus
    import scipy.io.wavfile as wavfile

    bad = str(tmp_path / "bad.wav")
    wavfile.write(bad, 16000, np.full(16000, 128, np.uint8))  # 8-bit PCM
    with pytest.raises(ValueError, match="16-bit|sample format"):
        load_wav(bad)
    # but 24-in-32-bit PCM and float64 load fine (real corpora carry these)
    ok32 = str(tmp_path / "ok32.wav")
    wavfile.write(ok32, 16000, (np.sin(np.arange(400) / 10) * 2**30).astype(np.int32))
    fs, x = load_wav(ok32)
    assert fs == 16000 and np.abs(x).max() <= 1.0


def test_missing_wav_and_label_are_actionable(corpus, tmp_path):
    root, ids = corpus
    cfg = _cfg(root)
    with pytest.raises(FileNotFoundError, match="corpus layout|file-id"):
        compose(cfg, fileids=ids + ["no_such_utt"])
    # a present wav with a missing label names the label path + the fix
    orphan = "orphan_utt"
    save_wav(os.path.join(root, "wav", orphan + ".wav"), 16000,
             np.zeros(16000, np.float32))
    with pytest.raises(FileNotFoundError, match="label_state_align|label_dir"):
        compose(cfg, fileids=[orphan] + ids)


def test_phone_aligned_labels_compose(corpus, tmp_path):
    """Merlin corpora come state- OR phone-aligned; the binarizer
    auto-detects per entry. Strip the [state] suffixes (and dedup the
    5-state rows) from a demo label to fabricate a phone-aligned corpus."""
    root, ids = corpus
    import shutil

    root2 = str(tmp_path / "phone_corpus")
    shutil.copytree(root, root2)
    lab_dir = os.path.join(root2, "label_state_align")
    for uid in ids:
        p = os.path.join(lab_dir, uid + ".lab")
        out, seen = [], None
        for line in open(p):
            parts = line.split()
            if len(parts) != 3:
                continue
            start, end, lab = parts
            base = lab.rsplit("[", 1)[0]
            if seen and seen[2] == base:
                seen = (seen[0], end, base)  # extend the phone segment
            else:
                if seen:
                    out.append(seen)
                seen = (start, end, base)
        if seen:
            out.append(seen)
        with open(p, "w") as f:
            for s, e, l in out:
                f.write(f"{s} {e} {l}\n")
    c = compose(_cfg(root2), fileids=ids)
    assert c.train.label_dim > 0
    assert all(l.shape[0] > 0 for l in c.train.labs)


def test_label_audio_misalignment_warns(corpus, tmp_path, capsys):
    """Labels from a different audio cut (here: audio truncated to half)
    must produce the misalignment warning naming the file and shift_ms."""
    root, ids = corpus
    import shutil

    root2 = str(tmp_path / "cut_corpus")
    shutil.copytree(root, root2)
    uid = ids[0]
    fs, x = load_wav(os.path.join(root2, "wav", uid + ".wav"))
    save_wav(os.path.join(root2, "wav", uid + ".wav"), fs, x[: len(x) // 2])
    compose(_cfg(root2), fileids=ids)
    out = capsys.readouterr().out
    assert "disagree" in out and uid in out and "shift_ms" in out
