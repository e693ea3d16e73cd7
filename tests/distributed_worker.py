"""Worker for the multi-host (2-process CPU) training test.

Runs a short deterministic LSE training through the process-aware batch
placement (``parallel.distributed``) and prints the final loss and a
parameter checksum. The test launches it once single-process (4 local CPU
devices) and once as two processes (2 devices each, joined via
``jax.distributed.initialize`` over a local TCP coordinator), and asserts
both runs produce the same numbers — multi-host data parallelism must be a
pure re-partitioning of the same computation.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
       <devices_per_proc> [mode]

``mode`` = "stream" (default; global_batch placement) or "devcorpus"
(HBM-resident sharded corpus: each process uploads only its
``Dataset.shard`` and the in-jit shard_map gather assembles batches).
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
state = replicate_state_global(make_gan_state(cfg, LDIM), mesh)

loss = None
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
