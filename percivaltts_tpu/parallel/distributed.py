"""Multi-host (multi-process) training support.

Reference parity: **new component** — the reference is single-process
(SURVEY.md §2 "Parallelism strategies"). The TPU-native multi-host story:
``jax.distributed.initialize`` joins the processes into one runtime, the
mesh spans the *global* device set, parameters replicate, and each process
feeds only the rows of the global batch that live on its local devices —
XLA's collectives then run over ICI within a slice and DCN across slices
exactly as in the single-host case (SURVEY.md §5 "Distributed communication
backend").

Batch-order consistency: every process iterates the SAME deterministic
global batch sequence (same dataset order, same shuffle seed, same bucket
bounds — so the jitted shapes and collective schedules match step-for-step)
and contributes its process-local rows via
``jax.make_array_from_process_local_data``. For the HBM-resident corpus
(``TrainConfig.device_corpus`` + ``shard_corpus``) each process instead
uploads only its own corpus partition (``Dataset.shard``) and the in-jit
shard_map gather assembles batches — host memory and HBM both scale with
process count.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the JAX distributed runtime (multi-host training).

    On TPU pods the arguments are discovered from the environment and may
    all be None; for CPU/GPU clusters (and the 2-process CPU test) pass
    them explicitly or via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID."""
    kw: Dict[str, Any] = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        )
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = (
            num_processes
            if num_processes is not None
            else int(os.environ["JAX_NUM_PROCESSES"])
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = (
            process_id
            if process_id is not None
            else int(os.environ["JAX_PROCESS_ID"])
        )
    jax.distributed.initialize(**kw)


def process_info() -> Dict[str, int]:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def _local_rows(n_rows: int, mesh: Mesh) -> slice:
    """Rows of a ``data``-sharded global batch owned by this process.

    Mesh construction orders devices process-major (``jax.devices()`` lists
    process 0's devices first), so each process owns one contiguous row
    range."""
    per = n_rows // jax.process_count()
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def global_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble device arrays for a *global* batch from each process's local
    rows (single-process: equivalent to ``shard_batch``).

    ``batch`` holds the full global arrays (every process iterates the same
    deterministic sequence); only the local row slice is shipped to devices.
    """
    if jax.process_count() == 1:
        from percivaltts_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        spec = P("data") if v.ndim >= 1 else P()
        sh = NamedSharding(mesh, spec)
        rows = _local_rows(v.shape[0], mesh) if v.ndim >= 1 else slice(None)
        out[k] = jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(v[rows]), v.shape
        )
    return out


def global_stacked_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Like ``global_batch`` for stacked (n_critic, B, ...) WGAN batches:
    axis 1 is the data axis."""
    if jax.process_count() == 1:
        from percivaltts_tpu.parallel.mesh import shard_stacked_batch

        return shard_stacked_batch(batch, mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sh = NamedSharding(mesh, P(None, "data"))
        rows = _local_rows(v.shape[1], mesh)
        out[k] = jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(v[:, rows]), v.shape
        )
    return out


def global_scalar(value: Any, mesh: Optional[Mesh], dtype=np.int32) -> jax.Array:
    """A scalar as a globally-replicated array. Under ``process_count>1`` a
    plain ``jnp.asarray`` is a host-local SingleDeviceSharding array, which
    Orbax refuses to serialize in a multi-host save ("Cannot serialize host
    local jax.Array") — the Trainer's per-epoch counter update must build
    the leaf with the global replicated sharding instead."""
    if mesh is None or jax.process_count() == 1:
        return jax.numpy.asarray(value, dtype)
    arr = np.asarray(value, dtype)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), arr, arr.shape
    )


def replicate_state_global(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree across all processes' devices. Single-process
    ``device_put`` cannot place onto non-addressable devices, so the
    multi-process path broadcasts each leaf from its host copy (every
    process holds the same deterministic initialization — states are built
    from the same seed)."""
    if jax.process_count() == 1:
        from percivaltts_tpu.parallel.mesh import replicate_state

        return replicate_state(state, mesh)
    sh = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) and jax.numpy.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            # typed PRNG keys can't cross the numpy boundary directly —
            # place the underlying key data, rewrap under jit
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            placed = jax.make_array_from_process_local_data(sh, data, data.shape)
            return jax.jit(lambda d: jax.random.wrap_key_data(d, impl=impl))(
                placed
            )
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x, x.shape)

    return jax.tree.map(put, state)
