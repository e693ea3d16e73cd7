"""Device mesh + sharding helpers (data parallelism over ICI).

Reference parity: **new component** — the reference has no distributed layer
at all (SURVEY.md §2 "Parallelism strategies": no NCCL/MPI/horovod/
tf.distribute anywhere). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis: batches are sharded over it,
parameters/optimizer state are replicated, and XLA inserts the gradient
all-reduces (psum) over ICI inside the fused train step — "computation
follows data", no hand-written collectives.

A ``model`` axis is reserved in the mesh for tensor-parallel shardings;
Percival-family models are small enough that it stays size 1 (SURVEY.md §2
table), but the plumbing accepts any (data, model) factorization.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: int = 0, model_parallel: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh. ``data_parallel=0`` → use all devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if data_parallel <= 0:
        data_parallel = len(devices) // model_parallel
    n = data_parallel * model_parallel
    if n > len(devices):
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs {n} devices, "
            f"have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(data_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard a host batch over the ``data`` axis (leading batch dimension);
    scalars replicate."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        spec = P("data") if v.ndim >= 1 else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_stacked_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard a stacked (n_critic, B, ...) batch pytree: axis 1 = data."""
    sharding = {
        k: NamedSharding(mesh, P(None, "data")) for k in batch
    }
    return {k: jax.device_put(np.asarray(v), sharding[k]) for k, v in batch.items()}


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)
