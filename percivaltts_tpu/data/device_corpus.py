"""HBM-resident corpus: upload once, gather batches on device.

Reference parity: percivaltts streams every batch from host memory through
the framework per step (data.py; SURVEY.md §1 "file-mediated design").
Measured on this v5e, that design is catastrophic for TPU training: the
fused WGAN-GP step computes in ~29 ms but shipping its ~200 MB of batches
host→device costs ~4 s — the pipeline is 99% transfer-bound.

TPU-first redesign: a TTS acoustic corpus is small by HBM standards (1 h of
16 kHz speech at 525 feature dims ≈ 1.5 GB f32, 0.75 GB bf16 — v5e has
16 GB), so the *entire training set* is padded to the bucket bound, uploaded
to HBM once, and every step receives only a tiny int32 index array; the
batch gather happens on device inside the jit region (an HBM→HBM copy,
~0.5 ms). Epoch shuffling stays host-side (a permutation of utterance
indices — bytes, not features).

For data-parallel meshes the corpus is replicated and the index array is
sharded over ``data``, so each device gathers its own batch shard locally.

For corpora beyond one chip's HBM, ``shard_corpus=True`` partitions the
utterance axis across the ``data`` mesh axis instead (capacity scales with
device count): each device samples its batch shard from its *local* corpus
shard via a ``shard_map`` gather inside the jit region — no cross-device
feature movement, ever. Shuffling becomes per-shard (each device permutes
its own utterances), the standard per-host sampling semantics of sharded
input pipelines. Multi-host composes with ``Dataset.shard`` per process.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from percivaltts_tpu.data.dataset import Dataset


class DeviceCorpus:
    """All utterances padded to ``bound`` and resident on device."""

    def __init__(
        self,
        ds: Dataset,
        bound: int,
        dtype: str = "float32",
        mesh=None,
        crop_seed: int = 0,
        shard_corpus: bool = False,
    ):
        if shard_corpus and mesh is None:
            raise ValueError("shard_corpus=True requires a mesh")
        N = len(ds)
        L, F = ds.label_dim, ds.feat_dim
        rng = np.random.default_rng(crop_seed)
        self.n_shards = int(mesh.shape["data"]) if (mesh is not None and shard_corpus) else 1
        n_proc = jax.process_count()

        # Local padded row count. Each device shard must be equal-sized; the
        # padding rows are CYCLIC DUPLICATES of real utterances (real masks)
        # so a shard never degenerates to all-masked rows and the sampler may
        # draw any row (bounded duplicate-sampling dilution instead of dead
        # devices). Multi-process + shard_corpus: ``ds`` is this process's
        # ``Dataset.shard``; the per-shard size must agree globally, so it is
        # derived from the all-gathered max local count.
        if self.n_shards > 1 and n_proc > 1:
            from jax.experimental import multihost_utils

            if self.n_shards % n_proc != 0:
                raise ValueError(
                    f"data axis ({self.n_shards}) must divide evenly across "
                    f"{n_proc} processes"
                )
            local_shards = self.n_shards // n_proc
            all_n = np.asarray(multihost_utils.process_allgather(np.int32(N)))
            per_shard = -(-int(all_n.max()) // local_shards)
            N_local = per_shard * local_shards
            N_pad = per_shard * self.n_shards  # global
        elif self.n_shards > 1:
            N_local = -(-N // self.n_shards) * self.n_shards
            N_pad = N_local
        else:
            N_local = N_pad = N

        lab = np.zeros((N_local, bound, L), np.float32)
        cmp_ = np.zeros((N_local, bound, F), np.float32)
        mask = np.zeros((N_local, bound), np.float32)
        for i in range(N_local):
            src = i % N
            l, c = ds.labs[src], ds.cmps[src]
            n = l.shape[0]
            off = 0
            if n > bound:
                # long utterances get one fixed random crop at upload time
                off = int(rng.integers(0, n - bound + 1))
                n = bound
            lab[i, :n] = l[off : off + n]
            cmp_[i, :n] = c[off : off + n]
            mask[i, :n] = 1.0

        if dtype == "bfloat16":
            import ml_dtypes

            lab = lab.astype(ml_dtypes.bfloat16)
            cmp_ = cmp_.astype(ml_dtypes.bfloat16)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P("data") if shard_corpus else P()
            sh = lambda x: NamedSharding(mesh, spec if x.ndim else P())
            if n_proc > 1:
                # multi-process: device_put would treat the local value as
                # the global array; assemble from process-local rows instead
                # (sharded: these ARE the local rows; replicated: every
                # process must hold the identical full corpus)
                def put(x):
                    gshape = (N_pad,) + x.shape[1:] if shard_corpus else x.shape
                    return jax.make_array_from_process_local_data(
                        sh(x), np.ascontiguousarray(x), gshape
                    )
            else:
                put = lambda x: jax.device_put(x, sh(x))
        else:
            put = jax.device_put
        self.data: Dict[str, jax.Array] = {
            "lab": put(lab),
            "cmp": put(cmp_),
            "mask": put(mask),
        }
        self.num_utts = N
        self.num_utts_padded = N_pad
        self.bound = bound
        self.mesh = mesh
        self.shard_corpus = shard_corpus

    @property
    def frames_per_utt(self) -> int:
        return self.bound

    def epoch_indices(
        self,
        batch_size: int,
        group: int,
        epoch: int,
        seed: int = 0,
        num_steps: int = 0,
    ) -> Iterator[np.ndarray]:
        """Host-side shuffling: yield (group, batch_size) int32 index arrays
        (group = n_critic + 1 for WGAN, 1 for LSE). ``num_steps=0`` → one
        pass over the corpus; otherwise exactly that many steps, re-shuffling
        as needed. Fresh permutations are cycled whenever the corpus tail
        can't fill a group — every step is full-size.

        With a sharded corpus, index values are *local* to each device's
        shard: columns [d·B/n, (d+1)·B/n) hold indices into shard d (each
        device permutes its own utterances — standard sharded-input
        semantics)."""
        rng = np.random.default_rng(np.uint32(seed) + np.uint32(epoch))
        if self.shard_corpus and self.n_shards > 1:
            n = self.n_shards
            if batch_size % n != 0:
                raise ValueError(
                    f"batch_size {batch_size} must be divisible by the "
                    f"corpus shard count ({n})"
                )
            b_local = batch_size // n
            local_n = self.num_utts_padded // n
            per_step = b_local * group
            nsteps = num_steps or max(local_n // per_step, 1)
            need = nsteps * per_step
            reps = -(-need // local_n)
            perms = [
                np.concatenate([rng.permutation(local_n) for _ in range(reps)])
                for _ in range(n)
            ]
            for s in range(nsteps):
                cols = [
                    p[s * per_step : (s + 1) * per_step].reshape(group, b_local)
                    for p in perms
                ]
                yield np.concatenate(cols, axis=1).astype(np.int32)
            return
        per_step = batch_size * group
        nsteps = num_steps or max(self.num_utts // per_step, 1)
        need = nsteps * per_step
        reps = -(-need // self.num_utts)
        perm = np.concatenate([rng.permutation(self.num_utts) for _ in range(reps)])
        for s in range(nsteps):
            chunk = perm[s * per_step : (s + 1) * per_step]
            yield chunk.reshape(group, batch_size).astype(np.int32)

    def shard_indices(self, idx: np.ndarray):
        """Place an index array sharded over the mesh's data axis. Every
        process computes the identical global index array (same seed), so
        multi-process placement contributes the process-local columns."""
        if self.mesh is None:
            return jnp.asarray(idx)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P(None, "data"))
        if jax.process_count() > 1:
            if idx.shape[1] % jax.process_count():
                raise ValueError(
                    f"batch_size={idx.shape[1]} must be divisible by "
                    f"process_count={jax.process_count()} for multi-process "
                    "index sharding (columns are split evenly per process)"
                )
            per = idx.shape[1] // jax.process_count()
            p = jax.process_index()
            local = np.ascontiguousarray(idx[:, p * per : (p + 1) * per])
            return jax.make_array_from_process_local_data(sh, local, idx.shape)
        return jax.device_put(idx, sh)


def gather_batch(corpus_data: Dict[str, jax.Array], idx: jax.Array) -> Dict[str, jax.Array]:
    """On-device gather: idx (..., B) → batch dict with leading idx shape.
    Runs inside the jit region; pure HBM→HBM movement."""
    return {
        "lab": corpus_data["lab"][idx],
        "cmp": corpus_data["cmp"][idx],
        "mask": corpus_data["mask"][idx].astype(jnp.float32),
    }


def make_sharded_gather(mesh):
    """shard_map gather for a corpus partitioned over the ``data`` axis:
    each device looks up its local index block in its local corpus shard —
    the batch comes out sharded over ``data`` with no corpus movement."""
    from jax.sharding import PartitionSpec as P

    corpus_spec = {"lab": P("data"), "cmp": P("data"), "mask": P("data")}
    out_spec = {
        "lab": P(None, "data"),
        "cmp": P(None, "data"),
        "mask": P(None, "data"),
    }

    def local_gather(corpus_data, idx):
        # corpus_data leaves: (N/n, ...) local shard; idx: (group, B/n) local
        return gather_batch(corpus_data, idx)

    return jax.shard_map(
        local_gather,
        mesh=mesh,
        in_specs=(corpus_spec, P(None, "data")),
        out_specs=out_spec,
    )


def make_device_wgan_step(base_step, n_critic: int, sharded_mesh=None):
    """Wrap a WGAN step to take (state, corpus_data, idx) with idx
    (n_critic+1, B): the critic/generator batches are gathered on device.
    ``sharded_mesh``: the corpus is partitioned over the mesh's ``data``
    axis and gathered with shard_map (idx values are shard-local)."""
    gather = make_sharded_gather(sharded_mesh) if sharded_mesh is not None else gather_batch

    def step(state, corpus_data, idx):
        batches = gather(corpus_data, idx)  # leading (n_critic+1, B)
        critic_b = {k: v[:n_critic] for k, v in batches.items()}
        gen_b = {k: v[n_critic] for k, v in batches.items()}
        return base_step(state, critic_b, gen_b)

    return step


def make_device_lse_step(base_step, sharded_mesh=None):
    """Wrap an LSE step to take (state, corpus_data, idx) with idx (1, B)."""
    gather = make_sharded_gather(sharded_mesh) if sharded_mesh is not None else gather_batch

    def step(state, corpus_data, idx):
        batches = gather(corpus_data, idx)
        batch = {k: v[0] for k, v in batches.items()}
        return base_step(state, batch)

    return step
