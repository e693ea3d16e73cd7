import numpy as np
import pytest

from percivaltts_tpu.data.hts_labels import (
    NUM_FRAME_FEATURES,
    QuestionSet,
    binarize_labels,
    parse_label_file,
)

LABEL_STATE = """\
0 500000 x^x-sil+hh=iy@x_x[2]
500000 1000000 x^x-sil+hh=iy@x_x[3]
1000000 1500000 x^x-sil+hh=iy@x_x[4]
1500000 2000000 x^x-sil+hh=iy@x_x[5]
2000000 2500000 x^x-sil+hh=iy@x_x[6]
2500000 3000000 x^sil-hh+iy=w@1_2[2]
3000000 4000000 x^sil-hh+iy=w@1_2[3]
4000000 4500000 x^sil-hh+iy=w@1_2[4]
4500000 5000000 x^sil-hh+iy=w@1_2[5]
5000000 6000000 x^sil-hh+iy=w@1_2[6]
"""

QUESTIONS = """\
QS "C-Silence" {*-sil+*}
QS "C-hh" {*-hh+*}
QS "C-Voiced" {*-iy+*,*-w+*,*-aa+*}
CQS "Pos_Fw" {@(\\d+)_}
"""


@pytest.fixture
def label_path(tmp_path):
    p = tmp_path / "utt.lab"
    p.write_text(LABEL_STATE)
    return str(p)


@pytest.fixture
def qset(tmp_path):
    p = tmp_path / "questions.hed"
    p.write_text(QUESTIONS)
    return QuestionSet.from_hed(str(p))


def test_parse_state_aligned(label_path):
    entries = parse_label_file(label_path)
    assert len(entries) == 10
    assert entries[0].state == 2
    assert entries[0].label == "x^x-sil+hh=iy@x_x"
    assert entries[-1].end == 6000000
    assert entries[-1].state == 6


def test_question_set(qset):
    assert qset.dim == 4
    a = qset.answer("x^x-sil+hh=iy@x_x")
    assert a.tolist() == [1.0, 0.0, 0.0, 0.0]
    b = qset.answer("x^sil-hh+iy=w@1_2")
    assert b.tolist() == [0.0, 1.0, 0.0, 1.0]  # CQS captures @1_


def test_binarize_shapes_and_features(label_path, qset):
    entries = parse_label_file(label_path)
    feats = binarize_labels(entries, qset, shift_sec=0.005)
    # 6000000 units = 0.6 s = 120 frames at 5 ms
    assert feats.shape == (120, qset.dim + NUM_FRAME_FEATURES)
    # first phone (sil) covers frames 0..49, second (hh) 50..119
    assert np.all(feats[:50, 0] == 1.0)  # C-Silence
    assert np.all(feats[50:, 1] == 1.0)  # C-hh
    assert np.all(feats[50:, 3] == 1.0)  # CQS Pos_Fw = 1
    q = qset.dim
    # forward state fraction increases within a state, in (0, 1)
    assert feats[0, q] < feats[9, q]
    assert 0.0 < feats[0, q] < 1.0
    # fwd + bwd fractions sum to 1
    np.testing.assert_allclose(feats[:, q] + feats[:, q + 1], 1.0, atol=1e-6)
    # state index feature: first state of phone = (2-1)/5
    assert feats[0, q + 2] == pytest.approx(0.2)
    # phone duration in seconds: sil phone = 0.25 s
    assert feats[0, q + 6] == pytest.approx(0.25)
    # phone fwd fraction monotonically increases over the phone
    pf = feats[:50, q + 4]
    assert np.all(np.diff(pf) > 0)


def test_binarize_phone_aligned(tmp_path, qset):
    p = tmp_path / "phone.lab"
    p.write_text("0 500000 x^x-sil+hh=iy@x_x\n500000 1000000 x^sil-hh+iy=w@1_2\n")
    entries = parse_label_file(p)
    assert entries[0].state is None
    feats = binarize_labels(entries, qset, shift_sec=0.005)
    assert feats.shape[0] == 20
    assert np.all(feats[:10, 0] == 1.0)
