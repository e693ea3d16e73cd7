"""Golden-array regression tests (SURVEY.md §4: golden arrays in
tests/golden/ checked against each DSP change). The golden file pins the
exact PML features of a fixed deterministic signal; loosening these
tolerances intentionally requires regenerating the file (see the generator
snippet in git history) and saying why in the commit."""

import pytest
import os

import numpy as np

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.vocoders import get_vocoder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pml_features.npz")
GOLDEN_CT = os.path.join(
    os.path.dirname(__file__), "golden", "pml_features_cheaptrick.npz"
)
GOLDEN_H = os.path.join(
    os.path.dirname(__file__), "golden", "pml_features_harmonic.npz"
)


def _check(golden_path, envelope):
    z = np.load(golden_path)
    wav, expected = z["wav"], z["feats"]
    voc = get_vocoder(
        VocoderConfig(
            kind="pml", fs=16000, spec_size=33, nm_size=17, envelope=envelope
        )
    )
    feats = voc.analyze(wav)
    assert feats.shape == expected.shape
    # lf0 stream: tight (YIN is deterministic)
    np.testing.assert_allclose(feats[:, 0], expected[:, 0], atol=1e-3)
    # spec/nm streams: small fp drift allowed across jax versions
    np.testing.assert_allclose(feats[:, 1:], expected[:, 1:], atol=5e-3)


def test_pml_features_match_golden_te():
    _check(GOLDEN, "te")


@pytest.mark.slow
def test_pml_features_match_golden_cheaptrick():
    # regenerated round-3 session 7: the nm stream moved when the
    # aperiodicity reader's default became the pitch-synchronous exact-bin
    # estimator (AnalysisParams.psync=True, ps_periods=4 — see the
    # attribution record there); the envelope path is unchanged
    _check(GOLDEN_CT, "cheaptrick")


def test_pml_features_match_golden_harmonic():
    # pins the production DEFAULT analysis path (harmonic envelope +
    # psync-4 aperiodicity), added round-3 session 7
    _check(GOLDEN_H, "harmonic")


GOLDEN_W_GD = os.path.join(
    os.path.dirname(__file__), "golden", "world_features_d4c_gd.npz"
)


def test_world_features_match_golden_d4c_gd():
    """Pins the D4C-family group-delay bap estimator's conventions
    (AnalysisParams.bap_method="d4c_gd", added round 4) on the same
    deterministic fixture signal as the PML goldens."""
    import dataclasses

    z = np.load(GOLDEN_W_GD)
    wav, expected = z["wav"], z["feats"]
    cfg = VocoderConfig(kind="world", fs=16000, spec_size=33, nm_size=17)
    cfg = dataclasses.replace(
        cfg, analysis=dataclasses.replace(cfg.analysis, bap_method="d4c_gd")
    )
    feats = get_vocoder(cfg).analyze(wav)
    assert feats.shape == expected.shape
    np.testing.assert_allclose(feats[:, 0], expected[:, 0], atol=1e-3)
    np.testing.assert_allclose(feats[:, 1:], expected[:, 1:], atol=5e-3)
