import jax
import jax.numpy as jnp
import numpy as np
import pytest

from percivaltts_tpu.config import (
    Configuration,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)
from percivaltts_tpu.parallel import make_mesh, replicate_state, shard_batch
from percivaltts_tpu.parallel.mesh import shard_stacked_batch
from percivaltts_tpu.training import make_gan_state
from percivaltts_tpu.training.lse import lse_step
from percivaltts_tpu.training.wgan import make_wgan_step

VOC = VocoderConfig(spec_size=17, nm_size=9)
LDIM = 11


def _cfg(trainer="lse"):
    return Configuration(
        data=DataConfig(batch_size=8, bucket_bounds=(64,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(
            generator="fc", hidden_size=32, num_layers=2,
            critic_channels=4, critic_blocks=2, critic_hidden=32,
            compute_dtype="float32",
        ),
        train=TrainConfig(trainer=trainer, n_critic=2, lr_gen=1e-3, lr_critic=1e-3),
    )


def _batch(B=8, T=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lab": rng.normal(size=(B, T, LDIM)).astype(np.float32),
        "cmp": rng.normal(size=(B, T, VOC.feature_size)).astype(np.float32),
        "mask": np.ones((B, T), dtype=np.float32),
        "lengths": np.full((B,), T, dtype=np.int32),
    }


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(data_parallel=4)
    assert mesh2.devices.shape == (4, 1)
    with pytest.raises(ValueError):
        make_mesh(data_parallel=64)


def test_lse_step_dp_matches_single_device():
    cfg = _cfg("lse")
    batch = _batch()

    s1 = make_gan_state(cfg, LDIM)
    s1, m1 = jax.jit(lse_step)(s1, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh()
    s8 = replicate_state(make_gan_state(cfg, LDIM), mesh)
    sb = shard_batch(batch, mesh)
    # batch axis really is sharded over 8 devices
    assert len(sb["lab"].sharding.device_set) == 8
    s8, m8 = jax.jit(lse_step)(s8, sb)

    assert np.allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5)
    p1 = jax.tree.leaves(s1.gen.params)[0]
    p8 = jax.tree.leaves(s8.gen.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


@pytest.mark.slow
def test_wgan_step_dp_matches_single_device():
    cfg = _cfg("wgan")
    n = cfg.train.n_critic
    critic_b = {
        k: np.stack([_batch(seed=i)[k] for i in range(n)]) for k in _batch()
    }
    gen_b = _batch(seed=99)
    step = jax.jit(make_wgan_step(cfg.train))

    s1 = make_gan_state(cfg, LDIM)
    s1, m1 = step(
        s1,
        {k: jnp.asarray(v) for k, v in critic_b.items()},
        {k: jnp.asarray(v) for k, v in gen_b.items()},
    )

    mesh = make_mesh()
    s8 = replicate_state(make_gan_state(cfg, LDIM), mesh)
    s8, m8 = step(s8, shard_stacked_batch(critic_b, mesh), shard_batch(gen_b, mesh))

    for k in m1:
        assert np.allclose(float(m1[k]), float(m8[k]), rtol=2e-4, atol=2e-5), k
    p1 = jax.tree.leaves(s1.critic.params)[0]
    p8 = jax.tree.leaves(s8.critic.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-4)


def test_dp_step_scales_to_uneven_mesh_subset():
    # 4-device data mesh with model axis present but unused
    cfg = _cfg("lse")
    mesh = make_mesh(data_parallel=4)
    s = replicate_state(make_gan_state(cfg, LDIM), mesh)
    s, m = jax.jit(lse_step)(s, shard_batch(_batch(), mesh))
    assert np.isfinite(float(m["loss"]))
