"""Sharded device corpus: the corpus partitioned over the mesh data axis,
gathered per device via shard_map (corpora beyond one chip's HBM)."""

import jax
import numpy as np
import pytest

from percivaltts_tpu.config import (
    Configuration,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)
from percivaltts_tpu.data.dataset import Dataset
from percivaltts_tpu.data.device_corpus import DeviceCorpus, make_sharded_gather
from percivaltts_tpu.parallel import make_mesh
from percivaltts_tpu.training import Trainer

pytestmark = pytest.mark.slow  # minutes-tier integration (VERDICT r3 item 9)

VOC = VocoderConfig(spec_size=9, nm_size=5)
LDIM = 7


def _ds(n=32, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(LDIM, VOC.feature_size)).astype(np.float32) * 0.5
    labs = [rng.normal(size=(int(rng.integers(20, 60)), LDIM)).astype(np.float32) for _ in range(n)]
    return Dataset(labs=labs, cmps=[(l @ W) for l in labs])


def test_sharded_gather_picks_local_rows():
    mesh = make_mesh()
    ds = _ds(n=32)
    dc = DeviceCorpus(ds, bound=64, mesh=mesh, shard_corpus=True)
    assert dc.n_shards == 8
    local_n = dc.num_utts_padded // 8  # = 4
    # idx column block d holds LOCAL indices into shard d
    idx = np.zeros((1, 8), np.int32)  # B=8 → 1 per device
    idx[0, :] = 2  # local row 2 of every shard → global rows 2, 6, 10, ...
    gather = jax.jit(make_sharded_gather(mesh))
    out = gather(dc.data, dc.shard_indices(idx))
    got = np.asarray(out["lab"][0])  # (8, 64, LDIM)
    for d in range(8):
        expect = np.asarray(dc.data["lab"][d * local_n + 2])
        np.testing.assert_array_equal(got[d], expect)


def test_sharded_epoch_indices_are_local():
    mesh = make_mesh()
    dc = DeviceCorpus(_ds(n=33), bound=64, mesh=mesh, shard_corpus=True)
    # 33 utts pad to 40 → 5 per shard
    assert dc.num_utts_padded == 40
    local_n = 5
    steps = list(dc.epoch_indices(batch_size=8, group=2, epoch=0))
    for s in steps:
        assert s.shape == (2, 8)
        assert s.max() < local_n
    with pytest.raises(ValueError):
        next(dc.epoch_indices(batch_size=6, group=1, epoch=0))  # 6 % 8 != 0


@pytest.mark.parametrize("trainer", ["lse", "wgan"])
def test_trainer_with_sharded_corpus(tmp_path, trainer):
    mesh = make_mesh()
    cfg = Configuration(
        workdir=str(tmp_path / "exp"),
        data=DataConfig(batch_size=8, bucket_bounds=(64,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(generator="fc", hidden_size=16, num_layers=1,
                          critic_channels=2, critic_blocks=2, critic_hidden=16,
                          compute_dtype="float32"),
        train=TrainConfig(trainer=trainer, n_critic=2, epochs=3, lr_gen=2e-3,
                          device_corpus=True, shard_corpus=True,
                          steps_per_epoch=4, patience=10),
    )
    ds = _ds(n=32)
    t = Trainer(cfg, ds, mesh=mesh)
    # the corpus really is partitioned: each leaf sharded over 8 devices
    shard_shapes = {s.data.shape for s in t.dcorpus.data["lab"].addressable_shards}
    assert shard_shapes == {(4, 64, LDIM)}
    hist = t.train()
    losses = [h["loss"] for h in hist["train"]]
    assert np.isfinite(losses).all()
    if trainer == "lse":
        assert losses[-1] < losses[0]
    t.close()
