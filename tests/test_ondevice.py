import pytest
import jax
import jax.numpy as jnp
import numpy as np

from percivaltts_tpu.config import (
    Configuration,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)
from percivaltts_tpu.data.normalize import NormStats
from percivaltts_tpu.training.lse import lse_eval_step, lse_step
from percivaltts_tpu.training.ondevice import make_normalizing_step
from percivaltts_tpu.training.state import make_gan_state
from percivaltts_tpu.training.wgan import make_wgan_step

VOC = VocoderConfig(spec_size=9, nm_size=5)
LDIM = 7


def _cfg(trainer="lse"):
    return Configuration(
        data=DataConfig(batch_size=4, bucket_bounds=(32,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(generator="fc", hidden_size=16, num_layers=1,
                          critic_channels=2, critic_blocks=2, critic_hidden=16,
                          compute_dtype="float32"),
        train=TrainConfig(trainer=trainer, n_critic=2, lr_gen=1e-3, lr_critic=1e-3),
    )


def _stats(dim, seed):
    rng = np.random.default_rng(seed)
    return NormStats(
        shift=rng.normal(size=dim).astype(np.float32),
        scale=rng.uniform(0.5, 2.0, size=dim).astype(np.float32),
    )


def _raw_batch(B=4, T=32, seed=0, lead=()):
    rng = np.random.default_rng(seed)
    mask = np.ones(lead + (B, T), np.float32)
    mask[..., -1, T // 2 :] = 0.0
    return {
        "lab": rng.normal(size=lead + (B, T, LDIM)).astype(np.float32),
        "cmp": rng.normal(size=lead + (B, T, VOC.feature_size)).astype(np.float32),
        "mask": mask,
        "lengths": np.full(lead + (B,), T, np.int32),
    }


def _host_norm(batch, ins, outs):
    m = batch["mask"][..., None]
    return {
        **batch,
        "lab": (ins.normalize(batch["lab"]) * m).astype(np.float32),
        "cmp": (outs.normalize(batch["cmp"]) * m).astype(np.float32),
    }


def test_ondevice_norm_matches_host_lse():
    cfg = _cfg()
    ins, outs = _stats(LDIM, 1), _stats(VOC.feature_size, 2)
    raw = _raw_batch()
    host = _host_norm(raw, ins, outs)

    s1 = make_gan_state(cfg, LDIM)
    s2 = make_gan_state(cfg, LDIM)
    step_h = jax.jit(lse_step)
    step_d = jax.jit(make_normalizing_step(lse_step, ins, outs))
    s1, m1 = step_h(s1, {k: jnp.asarray(v) for k, v in host.items()})
    s2, m2 = step_d(s2, {k: jnp.asarray(v) for k, v in raw.items()})
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    p1 = jax.tree.leaves(s1.gen.params)[0]
    p2 = jax.tree.leaves(s2.gen.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)

    e1 = float(jax.jit(lse_eval_step)(s1, {k: jnp.asarray(v) for k, v in host.items()}))
    e2 = float(jax.jit(make_normalizing_step(lse_eval_step, ins, outs))(
        s2, {k: jnp.asarray(v) for k, v in raw.items()}))
    np.testing.assert_allclose(e1, e2, rtol=1e-5)


def test_ondevice_norm_padding_cannot_leak():
    """Garbage in masked frames of the raw batch must not change the loss
    (normalization shifts zeros to nonzero — the wrapper re-masks)."""
    cfg = _cfg()
    ins, outs = _stats(LDIM, 3), _stats(VOC.feature_size, 4)
    raw = _raw_batch(seed=5)
    raw2 = {k: v.copy() for k, v in raw.items()}
    raw2["lab"][-1, 16:] = 123.0
    raw2["cmp"][-1, 16:] = -77.0
    step = jax.jit(make_normalizing_step(lse_eval_step, ins, outs))
    s = make_gan_state(cfg, LDIM)
    l1 = float(step(s, {k: jnp.asarray(v) for k, v in raw.items()}))
    l2 = float(step(s, {k: jnp.asarray(v) for k, v in raw2.items()}))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


@pytest.mark.slow
def test_ondevice_norm_wgan_runs():
    cfg = _cfg("wgan")
    ins, outs = _stats(LDIM, 6), _stats(VOC.feature_size, 7)
    step = jax.jit(make_normalizing_step(make_wgan_step(cfg.train), ins, outs))
    s = make_gan_state(cfg, LDIM)
    cb = _raw_batch(seed=8, lead=(cfg.train.n_critic,))
    gb = _raw_batch(seed=9)
    s, m = step(s, {k: jnp.asarray(v) for k, v in cb.items()},
                {k: jnp.asarray(v) for k, v in gb.items()})
    assert np.isfinite(float(m["loss"]))
