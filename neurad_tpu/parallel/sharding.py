"""Data-parallel sharding over a device mesh.

TPU-native counterpart of the reference's ONLY parallelism strategy — DDP over
rays (`nerfstudio/utils/comms.py`, `pipelines/base_pipeline.py:306`,
`scripts/train.py:110-230`). Instead of NCCL process groups, a single jit over a
`Mesh(('data',))`: ray/patch batches are sharded along the ray axis, parameters
are replicated, and XLA inserts the gradient all-reduce (psum over ICI/DCN)
automatically — the backward collective overlaps with compute via the XLA
latency-hiding scheduler, which is what DDP's bucketed all-reduce hand-rolls.

Multi-host: call `jax.distributed.initialize()` before building the mesh; each
host feeds its local shard of rays (`shard_batch` with host-local arrays).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurad_tpu.core.structs import RayBundle


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1D data mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _batch_spec(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = "data") -> Any:
    """Shard every array leaf along its leading (ray/patch) axis.

    Single-host: a plain `device_put` splits the host array across devices.
    Multi-host (jax.process_count() > 1): each host holds only its LOCAL shard
    of the global batch, so the global array must be assembled with
    `jax.make_array_from_process_local_data` — a global `device_put` of
    per-host data would be wrong (every host would place its own copy as if it
    were the whole batch). Matches DDP's per-rank batches + all-reduce
    (`pipelines/base_pipeline.py:306`).
    """
    sharding = _batch_spec(mesh, axis_name)
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())

    if jax.process_count() > 1:

        def put(x):
            local = np.asarray(x)
            if local.ndim == 0 or local.shape[0] % (n_dev // jax.process_count() or 1):
                return jax.device_put(x, repl)
            global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
            return jax.make_array_from_process_local_data(sharding, local, global_shape)

        return jax.tree.map(put, tree)

    def put(x):
        # leaves whose leading dim doesn't divide the mesh (e.g. a handful of
        # GT patches) are replicated — XLA reshards intermediates as needed
        if getattr(x, "ndim", 0) == 0 or x.shape[0] % n_dev:
            return jax.device_put(x, repl)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def host_local_seed(seed: int) -> int:
    """Per-host datamanager seed: each host must sample DIFFERENT rays (its
    share of the global batch) while model-init seeds stay identical across
    hosts. Mirrors the reference's `seed + global_rank` (`scripts/train.py:96`)."""
    return seed + 7919 * jax.process_index()


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """Wrap a jit'd train step with explicit in/out shardings.

    state is replicated; (bundle, batch) sharded along rays. XLA turns the grad
    sum over the sharded batch into a psum over the mesh — the TPU equivalent of
    DDP's all-reduce (`comms.py:65-77`).
    """
    replicated = NamedSharding(mesh, P())
    sharded = _batch_spec(mesh, axis_name)

    def spec_like(tree, sh):
        return jax.tree.map(lambda _: sh, tree)

    def wrapped(state, bundle: RayBundle, batch: Dict):
        state = jax.tree.map(lambda x: jax.device_put(x, replicated), state)
        bundle = shard_batch(mesh, bundle, axis_name)
        batch = shard_batch(mesh, batch, axis_name)
        return train_step(state, bundle, batch)

    return wrapped
