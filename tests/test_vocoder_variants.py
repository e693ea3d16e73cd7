import numpy as np
import pytest

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.eval import mcd
from percivaltts_tpu.vocoders import get_vocoder

FS = 16000


def _voiced_signal(f0=140.0, dur=0.5, fs=FS, seed=0):
    t = np.arange(int(dur * fs)) / fs
    x = np.zeros_like(t)
    rng = np.random.default_rng(seed)
    for k in range(1, int(fs / 2 / f0)):
        fk = k * f0
        x += 1.0 / (1.0 + (fk / 800.0) ** 2) * np.sin(
            2 * np.pi * fk * t + rng.uniform(0, 2 * np.pi)
        )
    x += 0.01 * rng.normal(size=len(t))
    return (x / np.abs(x).max() * 0.7).astype(np.float32)


def test_world_schema_and_roundtrip():
    cfg = VocoderConfig(kind="world", fs=FS, spec_size=65, nm_size=17)
    voc = get_vocoder(cfg)
    x = _voiced_signal()
    feats = voc.analyze(x)
    assert feats.shape[1] == cfg.feature_size == 1 + 1 + 65 + 17
    f0, vuv = voc.f0_vuv(feats)
    n = len(f0)
    core = slice(n // 4, 3 * n // 4)
    assert vuv[core].mean() > 0.8
    assert abs(np.median(f0[core]) - 140.0) / 140.0 < 0.03
    y = voc.synthesize(feats)
    assert y.shape == (feats.shape[0] * cfg.shift_samples,)
    assert np.isfinite(y).all()
    # voicing stream gates harmonics: silence frames stay quiet
    feats_uv = feats.copy()
    feats_uv[:, 1] = 0.0  # force unvoiced
    y_uv = voc.synthesize(feats_uv)
    # unvoiced synthesis has no strong harmonic periodicity: spectral flatness up
    assert np.isfinite(y_uv).all()


def test_melspec_analysis_and_griffin_lim():
    cfg = VocoderConfig(kind="melspec", fs=FS, mel_size=48)
    voc = get_vocoder(cfg)
    x = _voiced_signal()
    feats = voc.analyze(x)
    assert feats.shape[1] == 48
    assert np.isfinite(feats).all()
    y = voc.synthesize(feats)
    assert y.shape == (feats.shape[0] * cfg.shift_samples,)
    assert np.isfinite(y).all()
    # Griffin-Lim copy-synthesis: re-analyzed mels close to originals (MCD)
    feats2 = voc.analyze(y)
    n = min(len(feats), len(feats2))
    core = slice(n // 4, 3 * n // 4)
    c1 = voc.cepstra(feats[:n])[core]
    c2 = voc.cepstra(feats2[:n])[core]
    d = float(mcd(c1, c2))
    assert d < 4.5, d  # fast-GL copy-synthesis floor ≈ 3.9 at 5 ms hop
    with pytest.raises(NotImplementedError):
        voc.f0_vuv(feats)


def test_melspec_synthesize_batch_matches_single():
    from percivaltts_tpu.config import VocoderConfig
    from percivaltts_tpu.vocoders import get_vocoder

    voc = get_vocoder(VocoderConfig(kind="melspec", mel_size=20, fs=16000))
    rng = np.random.default_rng(3)
    feats = [rng.normal(-6.0, 1.0, size=(n, 20)).astype(np.float32) for n in (40, 90, 130)]
    singles = [voc.synthesize(f) for f in feats]
    batched = voc.synthesize_batch(feats, chunk=2)
    assert len(batched) == len(singles)
    for a, b in zip(batched, singles):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_world_batched_paths_match_single():
    from percivaltts_tpu.config import VocoderConfig
    from percivaltts_tpu.vocoders import get_vocoder

    voc = get_vocoder(VocoderConfig(kind="world", spec_size=17, nm_size=9, fs=16000))
    rng = np.random.default_rng(5)
    t = np.arange(9000) / 16000.0
    wavs = [
        (0.4 * np.sin(2 * np.pi * 150 * t[:n]) + 0.02 * rng.normal(size=n)).astype(np.float32)
        for n in (6000, 9000)
    ]
    singles = [voc.analyze(w) for w in wavs]
    batched = voc.analyze_batch(wavs)
    for a, b in zip(batched, singles):
        np.testing.assert_allclose(a, b, atol=2e-3)
    syn_single = [voc.synthesize(f, seed=2) for f in singles]
    syn_batched = voc.synthesize_batch(singles, seed=2, chunk=2)
    for a, b in zip(syn_batched, syn_single):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)
