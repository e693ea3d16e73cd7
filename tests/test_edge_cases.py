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


@pytest.mark.slow
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


@pytest.mark.slow
def test_estimate_f0_very_short_signal():
    """Tracks shorter than the median filters must not crash the jitted
    analysis (truncated/glitch utterances in a corpus)."""
    import jax.numpy as jnp

    from percivaltts_tpu.ops.f0 import estimate_f0

    for n in (90, 200, 350):
        res = estimate_f0(jnp.asarray(np.random.default_rng(0).normal(size=n).astype(np.float32)), 16000, 80)
        assert np.isfinite(np.asarray(res.f0)).all()


def test_frame_signal_short_frames_large_hop():
    """frame_length < 2*hop with n not a multiple of hop exercised the old
    pad-deficit reshape failure."""
    import jax.numpy as jnp

    from percivaltts_tpu.ops.stft import frame_signal

    for n, fl, hop in [(9, 4, 4), (17, 4, 8), (33, 6, 16)]:
        x = jnp.arange(n, dtype=jnp.float32)
        fr = frame_signal(x, fl, hop)
        assert fr.shape == (int(np.ceil(n / hop)), fl)


def test_batches_fill_batch_from_tiny_bucket():
    """A bucket smaller than the pad deficit must still yield full-size
    batches (sharded meshes need divisible row counts)."""
    from percivaltts_tpu.data.dataset import Dataset

    rng = np.random.default_rng(0)
    labs = [rng.normal(size=(20, 3)).astype(np.float32) for _ in range(3)]
    ds = Dataset(labs=labs, cmps=[l * 2 for l in labs])
    batches = list(ds.batches(8, (32,), drop_remainder=False))
    assert len(batches) == 1
    b = batches[0]
    assert b["lab"].shape[0] == 8
    # exactly 3 real rows carry mask; the 5 cycled pad rows are zero-masked
    assert int((b["lengths"] > 0).sum()) == 3
