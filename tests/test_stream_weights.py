import jax.numpy as jnp
import numpy as np

from percivaltts_tpu.config import Configuration, TrainConfig, VocoderConfig
from percivaltts_tpu.training.losses import masked_mse, stream_weight_vector

VOC = VocoderConfig(spec_size=9, nm_size=5)


def test_stream_weight_vector_layout():
    w = stream_weight_vector(
        VOC.streams, (("f0", 10.0), ("nm", 0.5)), VOC.feature_size
    )
    w = np.asarray(w)
    assert w.shape == (VOC.feature_size,)
    assert w[0] == 10.0  # f0
    assert np.all(w[1 : 1 + 9] == 1.0)  # spec untouched
    assert np.all(w[10:] == 0.5)  # nm
    assert stream_weight_vector(VOC.streams, (), VOC.feature_size) is None


def test_weighted_masked_mse():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(2, 4, VOC.feature_size)).astype(np.float32))
    targ = jnp.zeros_like(pred)
    mask = jnp.ones((2, 4), jnp.float32)
    base = float(masked_mse(pred, targ, mask))
    w = stream_weight_vector(VOC.streams, (("f0", 0.0), ("spec", 0.0), ("nm", 0.0)), VOC.feature_size)
    assert float(masked_mse(pred, targ, mask, w)) == 0.0
    w2 = stream_weight_vector(VOC.streams, (("f0", 2.0), ("spec", 2.0), ("nm", 2.0)), VOC.feature_size)
    np.testing.assert_allclose(float(masked_mse(pred, targ, mask, w2)), 2 * base, rtol=1e-6)


def test_config_ignores_unknown_fields(tmp_path):
    import json
    import warnings

    d = Configuration().to_dict()
    d["data"]["legacy_field"] = 7
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as f:
        json.dump(d, f)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = Configuration.load(p)
    assert any("legacy_field" in str(x.message) for x in w)
    assert cfg.data.batch_size == Configuration().data.batch_size


def test_config_roundtrip_with_stream_weights(tmp_path):
    cfg = Configuration(
        workdir=str(tmp_path),
        train=TrainConfig(stream_weights=(("f0", 4.0), ("spec", 1.0))),
    )
    p = cfg.dump()
    cfg2 = Configuration.load(p)
    assert cfg2.train.stream_weights == (("f0", 4.0), ("spec", 1.0))
