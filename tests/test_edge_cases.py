"""Edge-case robustness: tiny/degenerate inputs get clean behavior or clean
errors, never cryptic numpy/XLA failures."""

import numpy as np
import pytest

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.data.dataset import Dataset
from percivaltts_tpu.vocoders import get_vocoder


@pytest.mark.parametrize("kind", ["pml", "world", "melspec"])
def test_empty_waveform_clean_error(kind):
    voc = get_vocoder(VocoderConfig(kind=kind, spec_size=33, nm_size=17, mel_size=24))
    with pytest.raises(ValueError, match="non-empty 1-D waveform"):
        voc.analyze(np.zeros(0, np.float32))
    with pytest.raises(ValueError, match="non-empty 1-D waveform"):
        voc.analyze(np.zeros((10, 2), np.float32))


def test_sub_frame_waveform_analyzes():
    voc = get_vocoder(VocoderConfig(kind="pml", spec_size=33, nm_size=17))
    f = voc.analyze(np.zeros(100, np.float32))  # shorter than one frame
    assert f.shape == (2, voc.feature_size)
    assert np.isfinite(f).all()


def test_silent_and_clipped_waveforms_finite():
    voc = get_vocoder(VocoderConfig(kind="pml", spec_size=33, nm_size=17))
    assert np.isfinite(voc.analyze(np.zeros(8000, np.float32))).all()
    assert np.isfinite(voc.analyze(np.full(8000, 10.0, np.float32))).all()


def test_zero_frame_synthesis():
    voc = get_vocoder(VocoderConfig(kind="pml", spec_size=33, nm_size=17))
    y = voc.synthesize(np.zeros((0, voc.feature_size), np.float32))
    assert y.shape == (0,)


def test_single_utterance_dataset_batches():
    ds = Dataset(
        labs=[np.zeros((10, 3), np.float32)], cmps=[np.zeros((10, 2), np.float32)]
    )
    batches = list(ds.batches(2, (16,), drop_remainder=False))
    assert len(batches) == 1
    assert batches[0]["lab"].shape == (2, 16, 3)
