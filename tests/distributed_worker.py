"""Worker for the multi-host (2-process CPU) training test.

Runs a short deterministic LSE training through the process-aware batch
placement (``parallel.distributed``) and prints the final loss and a
parameter checksum. The test launches it once single-process (4 local CPU
devices) and once as two processes (2 devices each, joined via
``jax.distributed.initialize`` over a local TCP coordinator), and asserts
both runs produce the same numbers — multi-host data parallelism must be a
pure re-partitioning of the same computation.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
       <devices_per_proc> [mode] [phase] [workdir]

``mode``:
- "stream" (default): LSE through ``global_batch`` placement.
- "devcorpus": HBM-resident sharded corpus — each process uploads only its
  ``Dataset.shard`` and the in-jit shard_map gather assembles batches.
- "wgan": the FULL ``Trainer`` with trainer="wgan" — drives
  ``make_wgan_step`` through ``global_stacked_batch`` (the (n_critic, B,
  ...) axis-1 row slice) and the multi-process Orbax save at epoch end.
- "wgan_resume": kill-and-resume. ``phase`` = "part1" (train 2 epochs,
  checkpoint, then simulate a crash via os._exit without cleanup),
  "part2" (fresh processes resume from the Orbax checkpoint in
  ``workdir`` and finish), or "full" (uninterrupted run) — part2's final
  trajectory must equal full's.
"""

import os
import sys

pid, nproc, port, dev_per = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    int(sys.argv[4]),
)
mode = sys.argv[5] if len(sys.argv) > 5 else "stream"
phase = sys.argv[6] if len(sys.argv) > 6 else "full"
workdir = sys.argv[7] if len(sys.argv) > 7 else None
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dev_per}"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

if nproc > 1:
    from percivaltts_tpu.parallel import distributed as dist

    dist.initialize(f"localhost:{port}", nproc, pid)

import numpy as np

from percivaltts_tpu.config import (
    Configuration,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)
from percivaltts_tpu.data.dataset import Dataset
from percivaltts_tpu.parallel.distributed import (
    global_batch,
    replicate_state_global,
)
from percivaltts_tpu.parallel.mesh import make_mesh
from percivaltts_tpu.training.lse import lse_step
from percivaltts_tpu.training.state import make_gan_state

VOC = VocoderConfig(spec_size=9, nm_size=5)
LDIM = 7
cfg = Configuration(
    data=DataConfig(batch_size=8, bucket_bounds=(32,), label_dim=LDIM),
    vocoder=VOC,
    model=ModelConfig(
        generator="fc", hidden_size=16, num_layers=2, compute_dtype="float32"
    ),
    train=TrainConfig(trainer="lse", lr_gen=1e-3, seed=7),
)

# identical deterministic data on every process
rng = np.random.default_rng(0)
W = rng.normal(size=(LDIM, VOC.feature_size)).astype(np.float32) * 0.5
labs = [rng.normal(size=(32, LDIM)).astype(np.float32) for _ in range(16)]
ds = Dataset(labs=labs, cmps=[l @ W for l in labs])

mesh = make_mesh(data_parallel=0, model_parallel=1)

loss = None
if mode in ("wgan", "wgan_resume"):
    import tempfile

    from percivaltts_tpu.training.loop import Trainer

    if workdir is None:
        workdir = tempfile.mkdtemp(prefix="wgan_dist_")
    # 16 utts / batch 4 = exactly one (n_critic+1)=4-batch group per epoch:
    # groups never straddle epochs, so a resumed run regenerates the same
    # group sequence as the uninterrupted one.
    wcfg = Configuration(
        data=DataConfig(batch_size=4, bucket_bounds=(32,), label_dim=LDIM),
        vocoder=VOC,
        model=ModelConfig(
            generator="fc",
            hidden_size=16,
            num_layers=2,
            critic_channels=4,
            critic_blocks=2,
            critic_hidden=8,
            compute_dtype="float32",
        ),
        train=TrainConfig(
            trainer="wgan",
            n_critic=3,
            lr_gen=1e-3,
            lr_critic=1e-3,
            checkpoint_every=1,
            keep_checkpoints=8,
            patience=10**6,
            seed=7,
        ),
        workdir=workdir,
    )
    valid = Dataset(labs=labs[:4], cmps=[l @ W for l in labs[:4]])
    trainer = Trainer(wcfg, ds, valid_ds=valid, mesh=mesh, workdir=workdir)
    if mode == "wgan":
        hist = trainer.train(epochs=3)
    elif phase == "part1":
        trainer.train(epochs=2)
        # simulate a crash: no close(), no cleanup — the relaunched
        # processes must resume purely from the Orbax checkpoint
        print("PART1_SAVED", flush=True)
        os._exit(0)
    else:
        if phase == "part2":
            assert trainer.resume(), "no checkpoint to resume from"
            assert int(trainer.state.epoch) == 2, int(trainer.state.epoch)
        hist = trainer.train(epochs=4)
    loss = hist["train"][-1]["loss"]
    _sum = lambda t: sum(
        float(jax.numpy.sum(jax.numpy.abs(x))) for x in jax.tree.leaves(t)
    )
    checksum = _sum(trainer.state.gen.params) + _sum(trainer.state.critic.params)
    print(f"RESULT loss={float(loss):.8f} checksum={checksum:.6f}", flush=True)
    sys.exit(0)

state = replicate_state_global(make_gan_state(cfg, LDIM), mesh)

if mode == "devcorpus":
    from percivaltts_tpu.data.device_corpus import (
        DeviceCorpus,
        make_device_lse_step,
    )

    if nproc > 1:
        local_ds = ds.shard(nproc, pid)
    else:
        # emulate the 2-process shard assignment so the single-process
        # contiguous device sharding holds the same utterances per shard:
        # global order = proc0's strided shard then proc1's
        order = list(range(0, len(ds), 2)) + list(range(1, len(ds), 2))
        local_ds = Dataset(
            labs=[ds.labs[i] for i in order],
            cmps=[ds.cmps[i] for i in order],
        )
    dc = DeviceCorpus(local_ds, bound=32, mesh=mesh, shard_corpus=True)
    dstep = jax.jit(
        make_device_lse_step(lse_step, sharded_mesh=mesh), donate_argnums=(0,)
    )
    for epoch in range(3):
        for idx in dc.epoch_indices(batch_size=8, group=1, epoch=epoch, seed=1):
            state, m = dstep(state, dc.data, dc.shard_indices(idx))
            loss = m["loss"]
else:
    step = jax.jit(lse_step, donate_argnums=(0,))
    for epoch in range(3):
        for b in ds.batches(8, (32,), shuffle=True, seed=1, epoch=epoch):
            state, m = step(state, global_batch(b, mesh))
            loss = m["loss"]

checksum = sum(
    float(jax.numpy.sum(jax.numpy.abs(x))) for x in jax.tree.leaves(state.gen.params)
)
print(f"RESULT loss={float(loss):.8f} checksum={checksum:.6f}", flush=True)
