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
from percivaltts_tpu.data.device_corpus import DeviceCorpus, gather_batch
from percivaltts_tpu.training import Trainer

pytestmark = pytest.mark.slow  # minutes-tier integration (VERDICT r3 item 9)

VOC = VocoderConfig(spec_size=9, nm_size=5)
LDIM = 7


def _ds(n=20, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(LDIM, VOC.feature_size)).astype(np.float32) * 0.5
    labs = [rng.normal(size=(int(rng.integers(20, 70)), LDIM)).astype(np.float32) for _ in range(n)]
    return Dataset(labs=labs, cmps=[(l @ W) for l in labs])


def test_upload_pad_and_gather():
    ds = _ds()
    dc = DeviceCorpus(ds, bound=64)
    assert dc.data["lab"].shape == (20, 64, LDIM)
    assert dc.data["mask"].shape == (20, 64)
    # row i, valid region matches the source utterance
    i = 3
    n = ds.labs[i].shape[0]
    got = np.asarray(dc.data["lab"][i])
    np.testing.assert_array_equal(got[:n], ds.labs[i])
    assert np.all(got[n:] == 0.0)
    b = gather_batch(dc.data, np.array([[3, 5], [0, 1]], np.int32))
    assert b["lab"].shape == (2, 2, 64, LDIM)
    np.testing.assert_array_equal(np.asarray(b["lab"][0, 0][:n]), ds.labs[i])


def test_long_utterances_cropped_to_bound():
    rng = np.random.default_rng(1)
    labs = [rng.normal(size=(100, LDIM)).astype(np.float32) for _ in range(3)]
    cmps = [rng.normal(size=(100, VOC.feature_size)).astype(np.float32) for _ in range(3)]
    dc = DeviceCorpus(Dataset(labs=labs, cmps=cmps), bound=32)
    assert dc.data["lab"].shape == (3, 32, LDIM)
    assert np.all(np.asarray(dc.data["mask"]) == 1.0)


def test_epoch_indices_cover_and_cycle():
    ds = _ds(n=13)
    dc = DeviceCorpus(ds, bound=64)
    steps = list(dc.epoch_indices(batch_size=2, group=3, epoch=0))
    assert len(steps) == 13 // 6
    for s in steps:
        assert s.shape == (3, 2) and s.dtype == np.int32
    # corpus smaller than one group: still one full-size step
    tiny = DeviceCorpus(_ds(n=4), bound=64)
    steps = list(tiny.epoch_indices(batch_size=4, group=3, epoch=0))
    assert len(steps) == 1 and steps[0].shape == (3, 4)
    # different epochs shuffle differently
    a = next(iter(dc.epoch_indices(2, 3, epoch=0)))
    b = next(iter(dc.epoch_indices(2, 3, epoch=1)))
    assert not np.array_equal(a, b)


def test_device_corpus_resume(tmp_path):
    cfg = Configuration(
        workdir=str(tmp_path / "exp"),
        data=DataConfig(batch_size=4, bucket_bounds=(64,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(generator="fc", hidden_size=16, num_layers=1,
                          compute_dtype="float32"),
        train=TrainConfig(trainer="lse", epochs=2, lr_gen=2e-3,
                          device_corpus=True, steps_per_epoch=3, patience=10),
    )
    ds = _ds(n=16)
    t = Trainer(cfg, ds)
    t.train()
    t.close()
    t2 = Trainer(cfg, ds)
    assert t2.resume()
    assert int(t2.state.epoch) == 2
    hist = t2.train(epochs=4)  # continues from epoch 2
    assert len(hist["train"]) == 2
    t2.close()


def test_device_corpus_with_ondevice_norm(tmp_path):
    """All flagship input-path features composed: raw features resident in
    HBM, normalization fused into the jitted step, WGAN trainer."""
    from percivaltts_tpu.data.normalize import compute_meanstd, compute_minmax

    ds = _ds(n=16)
    in_stats = compute_minmax(ds.labs)
    out_stats = compute_meanstd(ds.cmps)
    cfg = Configuration(
        workdir=str(tmp_path / "exp"),
        data=DataConfig(batch_size=4, bucket_bounds=(64,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(generator="fc", hidden_size=16, num_layers=1,
                          critic_channels=2, critic_blocks=2, critic_hidden=16,
                          compute_dtype="float32"),
        train=TrainConfig(trainer="wgan", n_critic=2, epochs=2, lr_gen=1e-3,
                          device_corpus=True, steps_per_epoch=3, patience=10),
    )
    t = Trainer(cfg, ds, in_stats=in_stats, out_stats=out_stats)
    hist = t.train()
    assert all(np.isfinite(h["loss"]) for h in hist["train"])
    t.close()


def test_device_corpus_on_mesh(tmp_path):
    """DP mesh: corpus replicated, per-step indices sharded over 'data'."""
    from percivaltts_tpu.parallel import make_mesh

    cfg = Configuration(
        workdir=str(tmp_path / "exp"),
        data=DataConfig(batch_size=8, bucket_bounds=(64,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(generator="fc", hidden_size=16, num_layers=1,
                          critic_channels=2, critic_blocks=2, critic_hidden=16,
                          compute_dtype="float32"),
        train=TrainConfig(trainer="wgan", n_critic=2, epochs=2, lr_gen=1e-3,
                          device_corpus=True, steps_per_epoch=3, patience=10),
    )
    ds = _ds(n=30)
    mesh = make_mesh()
    t = Trainer(cfg, ds, mesh=mesh)
    assert len(t.dcorpus.data["lab"].sharding.device_set) == 8  # replicated
    hist = t.train()
    assert all(np.isfinite(h["loss"]) for h in hist["train"])
    assert all(h["steps"] == 3 for h in hist["train"])
    t.close()


@pytest.mark.parametrize("trainer", ["lse", "wgan"])
def test_trainer_with_device_corpus(tmp_path, trainer):
    cfg = Configuration(
        workdir=str(tmp_path / "exp"),
        data=DataConfig(batch_size=4, bucket_bounds=(64,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(generator="fc", hidden_size=16, num_layers=1,
                          critic_channels=2, critic_blocks=2, critic_hidden=16,
                          compute_dtype="float32"),
        train=TrainConfig(trainer=trainer, n_critic=2, epochs=3, lr_gen=2e-3,
                          lr_critic=1e-3, device_corpus=True, patience=10),
    )
    ds = _ds(n=24)
    t = Trainer(cfg, ds, Dataset(labs=ds.labs[:4], cmps=ds.cmps[:4]))
    hist = t.train()
    losses = [h["loss"] for h in hist["train"]]
    assert np.isfinite(losses).all()
    if trainer == "lse":
        assert losses[-1] < losses[0]
    assert all(h["steps"] >= 1 for h in hist["train"])
    t.close()
