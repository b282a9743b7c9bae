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
import jax.numpy as jnp
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
    """Shard every array leaf along its leading (ray/patch) axis (single-host).

    A plain `device_put` splits the host array across devices. For multi-host
    TRAIN batches (each host holding only its local rays) use
    `assemble_global_train_batch` — per-leaf assembly cannot preserve the
    static `[cam | lidar]` modality layout, so mixed-modality leaves need the
    structured path.
    """
    sharding = _batch_spec(mesh, axis_name)
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())

    if jax.process_count() > 1:

        def put(x):
            # Each host passes a GLOBAL-SHAPED array and contributes its own
            # process block of rows. Two valid callers: host-identical arrays
            # (eval/render — the assembled global equals the array), and
            # per-host sample lists of global size (splat pipelines — host i's
            # block comes from host i's sampler, i.e. per-host feeding; rows
            # outside the block are built but unused). Mixed-modality NeuRAD
            # ray batches need assemble_global_train_batch instead.
            local = np.asarray(x)
            if local.ndim == 0 or local.shape[0] % n_dev:
                return _put_replicated(mesh, local)
            return jax.make_array_from_process_local_data(
                sharding, _local_rows(local, mesh, axis_name), local.shape
            )

        return jax.tree.map(put, tree)

    def put(x):
        # leaves whose leading dim doesn't divide the mesh (e.g. a handful of
        # GT patches) are replicated — XLA reshards intermediates as needed
        if getattr(x, "ndim", 0) == 0 or x.shape[0] % n_dev:
            return jax.device_put(x, repl)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def _local_rows(full: np.ndarray, mesh: Mesh, axis_name: str) -> np.ndarray:
    """This process's contiguous row block of a full (host-identical) array
    sharded along `axis_name` (mesh device order = process order)."""
    per_proc = full.shape[0] // jax.process_count()
    start = jax.process_index() * per_proc
    return full[start : start + per_proc]


def _put_replicated(mesh: Mesh, local: np.ndarray):
    """Replicate a host-identical array across a (possibly multi-host) mesh."""
    return jax.make_array_from_process_local_data(NamedSharding(mesh, P()), local, local.shape)


def _assemble_leaf(mesh: Mesh, local, axis_name: str = "data"):
    """Global array = concat of the per-host local leaves along axis 0.

    Uses `jax.make_array_from_process_local_data` when the local rows divide
    this host's devices (mesh device order is process order, so host h's rows
    land in the h-th contiguous block); otherwise falls back to an allgather +
    replicate, which has identical semantics at extra bandwidth.
    """
    local = np.asarray(local)
    n_local = jax.local_device_count()
    gshape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
    if local.ndim and local.shape[0] and local.shape[0] % n_local == 0:
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(axis_name)), local, gshape
        )
    from jax.experimental import multihost_utils

    full = multihost_utils.process_allgather(local, tiled=True)
    return _put_replicated(mesh, full)


def assemble_global_train_batch(
    mesh: Mesh, bundle: Any, batch: Any, num_cam_rays: int, axis_name: str = "data"
) -> Tuple[Any, Any]:
    """Assemble the GLOBAL structured train batch from per-host local batches.

    Each host samples a full structured local batch `[cam rays | lidar rays]`
    (`host_local_seed` decorrelates them). The model's static-modality layout
    requires the GLOBAL batch to be `[all cam | all lidar]`, so mixed-modality
    bundle leaves are split at `num_cam_rays`, each modality is assembled
    host-block-wise, and one jit'd concat restores the global layout
    (`[cam_0..cam_{P-1} | lidar_0..lidar_{P-1}]`). GT leaves in `batch` are
    single-modality (patch-major images / per-lidar-ray returns) and assemble
    directly. The reference's counterpart is DDP per-rank batches
    (`nerfstudio/pipelines/base_pipeline.py:306`) where the "global batch" is
    implicit in the gradient all-reduce.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, bundle, axis_name), shard_batch(mesh, batch, axis_name)

    cam_g = jax.tree.map(lambda x: _assemble_leaf(mesh, np.asarray(x)[:num_cam_rays], axis_name), bundle)
    lid_g = jax.tree.map(lambda x: _assemble_leaf(mesh, np.asarray(x)[num_cam_rays:], axis_name), bundle)
    batch_g = jax.tree.map(lambda x: _assemble_leaf(mesh, x, axis_name), batch)
    concat = jax.jit(
        lambda c, l: jax.tree.map(lambda a, b: jnp.concatenate([a, b]), c, l),
        out_shardings=NamedSharding(mesh, P(axis_name)),
    )
    return concat(cam_g, lid_g), batch_g


def host_local_seed(seed: int) -> int:
    """Per-host datamanager seed: each host must sample DIFFERENT rays (its
    share of the global batch) while model-init seeds stay identical across
    hosts. Mirrors the reference's `seed + global_rank` (`scripts/train.py:96`)."""
    return seed + 7919 * jax.process_index()


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(
    train_step, mesh: Mesh, axis_name: str = "data", num_cam_rays: Optional[int] = None
):
    """Wrap a jit'd train step with explicit in/out shardings.

    state is replicated; (bundle, batch) sharded along rays. XLA turns the grad
    sum over the sharded batch into a psum over the mesh — the TPU equivalent of
    DDP's all-reduce (`comms.py:65-77`).

    Multi-host (`jax.process_count() > 1`): each host passes its LOCAL
    structured batch and `num_cam_rays` (the per-host camera-ray count) must be
    given so `assemble_global_train_batch` can rebuild the global
    `[all cam | all lidar]` layout. The wrapped step then runs SPMD across
    hosts, and the loss must split at the GLOBAL camera-ray count
    (`ADPipeline._train_num_cam_rays`).
    """
    replicated = NamedSharding(mesh, P())

    def put_state(state):
        if jax.process_count() > 1:

            def put(x):
                # outputs of a previous sharded step are already global
                # replicated arrays — re-placing them would force a host pull
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    return x
                return _put_replicated(mesh, np.asarray(x))

            return jax.tree.map(put, state)
        return jax.tree.map(lambda x: jax.device_put(x, replicated), state)

    def wrapped(state, bundle: RayBundle, batch: Dict):
        state = put_state(state)
        if jax.process_count() > 1:
            if num_cam_rays is None:
                raise ValueError("multi-host sharded step needs num_cam_rays for structured assembly")
            bundle, batch = assemble_global_train_batch(mesh, bundle, batch, num_cam_rays, axis_name)
        else:
            bundle = shard_batch(mesh, bundle, axis_name)
            batch = shard_batch(mesh, batch, axis_name)
        return train_step(state, bundle, batch)

    return wrapped
