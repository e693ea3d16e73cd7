"""Pallas kernel tests — interpret mode on CPU, against the XLA oracles
in ops/stft.py (SURVEY.md §4: numeric parity tests per DSP op)."""

import numpy as np
import pytest

from percivaltts_tpu.ops import pallas_kernels as pk
from percivaltts_tpu.ops.stft import frame_signal, hann_window, overlap_add


@pytest.mark.parametrize("n,fl,hop", [(4000, 400, 80), (1000, 400, 80), (777, 320, 64)])
def test_frame_window_matches_oracle(n, fl, hop):
    rng = np.random.default_rng(0)
    x = rng.normal(size=n).astype(np.float32)
    w = np.asarray(hann_window(fl))
    ours = np.asarray(pk.frame_window(x, fl, hop, w, interpret=True))
    oracle = np.asarray(frame_signal(x, fl, hop)) * w[None, :]
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_frame_window_no_window():
    rng = np.random.default_rng(1)
    x = rng.normal(size=2000).astype(np.float32)
    ours = np.asarray(pk.frame_window(x, 400, 80, None, interpret=True))
    oracle = np.asarray(frame_signal(x, 400, 80))
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


@pytest.mark.parametrize("nf,fl,hop", [(50, 400, 80), (13, 320, 64), (257, 400, 80)])
def test_overlap_add_matches_oracle(nf, fl, hop):
    rng = np.random.default_rng(2)
    frames = rng.normal(size=(nf, fl)).astype(np.float32)
    out_length = nf * hop
    ours = np.asarray(pk.overlap_add(frames, hop, out_length, interpret=True))
    oracle = np.asarray(overlap_add(frames, hop, out_length))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_roundtrip_through_pallas():
    rng = np.random.default_rng(3)
    x = rng.normal(size=1600).astype(np.float32)
    fl, hop = 320, 80
    frames = np.asarray(pk.frame_window(x, fl, hop, None, interpret=True))
    y = np.asarray(pk.overlap_add(frames, hop, len(x), interpret=True))
    np.testing.assert_allclose(y[fl:-fl], x[fl:-fl] * (fl // hop), rtol=1e-4, atol=1e-4)
