"""jit-vs-eager consistency of the vocoder analysis/synthesis cores
(SURVEY.md §4 rebuild implications)."""

import jax
import numpy as np
import pytest

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.data.dataset import Dataset
from percivaltts_tpu.vocoders import get_vocoder

pytestmark = pytest.mark.slow  # minutes-tier integration (VERDICT r3 item 9)

FS = 16000


def _sig(dur=0.3, f0=150.0, seed=0):
    t = np.arange(int(dur * FS)) / FS
    rng = np.random.default_rng(seed)
    x = sum(
        np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
        for k in range(1, 20)
    )
    return (x / np.abs(x).max() * 0.7).astype(np.float32)


@pytest.mark.parametrize("kind", ["pml", "melspec"])
def test_analysis_jit_matches_eager(kind):
    cfg = VocoderConfig(kind=kind, fs=FS, spec_size=33, nm_size=9, mel_size=24)
    voc = get_vocoder(cfg)
    x = _sig()
    jit_feats = voc.analyze(x)
    with jax.disable_jit():
        eager_feats = voc.analyze(x)
    # fp reassociation under fusion differs; log-domain features amplify it
    # at near-silent bins — demand tight *typical* agreement and bounded
    # worst case (0.5 log units ≈ 4 dB at the noise floor)
    diff = np.abs(jit_feats - eager_feats)
    assert np.median(diff) < 1e-3
    assert diff.max() < 0.5, diff.max()


def test_synthesis_jit_matches_eager():
    import dataclasses

    cfg = VocoderConfig(kind="pml", fs=FS, spec_size=33, nm_size=9)
    feats = get_vocoder(cfg).analyze(_sig())

    # open-loop render: one pass of pure spectral ops — strict tolerance
    voc_open = get_vocoder(dataclasses.replace(cfg, closed_loop=0))
    y_jit = voc_open.synthesize(feats, seed=3)
    with jax.disable_jit():
        y_eager = voc_open.synthesize(feats, seed=3)
    np.testing.assert_allclose(y_jit, y_eager, rtol=2e-3, atol=2e-4)

    # closed loop re-analyzes its own render, so fp reassociation passes
    # through discrete gates (voicing bits, correction gating) and can move
    # individual corrections — demand signal-level agreement instead
    voc = get_vocoder(cfg)
    y_jit = voc.synthesize(feats, seed=3)
    with jax.disable_jit():
        y_eager = voc.synthesize(feats, seed=3)
    err = np.sqrt(np.mean((y_jit - y_eager) ** 2))
    ref = np.sqrt(np.mean(y_jit**2))
    # a single flipped gate/correction decision on this fixture measures
    # ~0.6% signal RMS (the jit and eager graphs disagree on one frame's
    # near-threshold voicing read); bound at 1% so one such flip passes
    # but systematic divergence does not
    assert err < 1e-2 * ref, (err, ref)


def test_dataset_shard_partition():
    rng = np.random.default_rng(0)
    labs = [rng.normal(size=(20, 3)).astype(np.float32) for _ in range(10)]
    cmps = [rng.normal(size=(20, 2)).astype(np.float32) for _ in range(10)]
    ds = Dataset(labs=labs, cmps=cmps)
    shards = [ds.shard(3, i) for i in range(3)]
    ids = [u for s in shards for u in s.ids]
    assert sorted(ids) == sorted(ds.ids)  # complete, disjoint partition
    assert len(set(ids)) == len(ids)
    with pytest.raises(ValueError):
        ds.shard(3, 3)
