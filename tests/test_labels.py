import os

import numpy as np
import pytest

from percivaltts_tpu.data.hts_labels import (
    NUM_FRAME_FEATURES,
    QuestionSet,
    binarize_label_file,
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


# --------------------------------------------------------------------- #
# radio-style fixture: ~127 questions with genuine Merlin CQS patterns
# over every delimiter family of the full-context format (VERDICT item 6)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _radio_qs():
    return QuestionSet.from_hed(
        os.path.join(FIXTURES, "questions_radio_style.hed")
    )


def test_radio_hed_parses_all_questions():
    qs = _radio_qs()
    assert qs.dim == 127
    kinds = [q.kind for q in qs.questions]
    assert kinds.count("CQS") == 38
    assert kinds.count("QS") == 89


def test_radio_label_binarization_dims_and_values():
    qs = _radio_qs()
    arr = binarize_label_file(os.path.join(FIXTURES, "utt001.lab"), qs)
    # 7 phones x 5 states x 4 frames
    assert arr.shape == (140, qs.dim + 9)
    assert np.isfinite(arr).all()
    names = [q.name for q in qs.questions]

    def col(name):
        return names.index(name)

    # phone 2 of utt001 is 's' (frames 20..39): check identity + class rows
    fr = 25
    assert arr[fr, col("C-s")] == 1.0
    assert arr[fr, col("C-Fricative")] == 1.0
    assert arr[fr, col("C-Vowel")] == 0.0
    assert arr[fr, col("L-sil")] == 1.0
    assert arr[fr, col("R-aa")] == 1.0
    # CQS values for that phone's label:
    # .../A:1_2_3/B:1-0-3@...$1-1!4-3;2-5|7/C:1+1+2/... /J:8+3-1
    assert arr[fr, col("Seg_Fw")] == 2.0  # @2_
    assert arr[fr, col("Seg_Bw")] == 6.0  # _6/A:
    assert arr[fr, col("L-Syl_Stress")] == 1.0
    assert arr[fr, col("L-Syl_Accent")] == 2.0
    assert arr[fr, col("L-Syl_NumSegs")] == 3.0
    assert arr[fr, col("C-Syl_Stress")] == 1.0
    assert arr[fr, col("C-Syl_NumSegs")] == 3.0
    assert arr[fr, col("Syl_NumAccent_Before")] == 1.0  # $1-
    assert arr[fr, col("Syl_DistStress_Prev")] == 4.0  # !4-
    assert arr[fr, col("Syl_DistAccent_Prev")] == 2.0  # ;2-
    assert arr[fr, col("R-Syl_Stress")] == 1.0  # /C:1+
    assert arr[fr, col("Utt_NumSyls2")] == 8.0  # /J:8+  ('+' escaped)
    assert arr[fr, col("Utt_NumWords2")] == 3.0  # /J:8+3-
    assert arr[fr, col("Stressed-Syl")] == 1.0  # /B:1-


def test_radio_second_file_parses():
    qs = _radio_qs()
    arr = binarize_label_file(os.path.join(FIXTURES, "utt002.lab"), qs)
    assert arr.shape == (9 * 5 * 3, qs.dim + 9)
    assert np.isfinite(arr).all()


def test_cqs_metacharacters_are_literal():
    """'+', '$', '|', ';', '!' in CQS patterns are label delimiters, not
    regex operators."""
    import tempfile

    hed = tempfile.NamedTemporaryFile("w", suffix=".hed", delete=False)
    hed.write('CQS "J1" {/J:(\\d+)+}\n')  # literal '+' after the capture
    hed.write('CQS "DollarBefore" {$(\\d+)-}\n')
    hed.write('CQS "PipeAfter" {=(\\d+)|}\n')
    hed.close()
    qs = QuestionSet.from_hed(hed.name)
    a = qs.answer("a-b+c/J:12+3-1$7-2 h=5|0")
    assert a[0] == 12.0
    assert a[1] == 7.0
    assert a[2] == 5.0
    # '+' must NOT act as a quantifier: "/J:123" alone (no '+') must fail
    b = qs.answer("x/J:123 end")
    assert b[0] == 0.0


def test_cqs_multiple_and_no_captures():
    import tempfile

    hed = tempfile.NamedTemporaryFile("w", suffix=".hed", delete=False)
    # two captures: first one wins
    hed.write('CQS "Two" {@(\\d+)_(\\d+)/}\n')
    # no capture: degenerates to a binary match
    hed.write('CQS "None" {*-foo+*}\n')
    hed.close()
    qs = QuestionSet.from_hed(hed.name)
    a = qs.answer("x^y-foo+z@4_9/A:0")
    assert a[0] == 4.0
    assert a[1] == 1.0
    b = qs.answer("x^y-bar+z@4_9/A:0")
    assert b[1] == 0.0
