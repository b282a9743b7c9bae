"""Worker for the TRUE 2-process multi-host test (test_multihost_2proc.py).

Each process owns 4 virtual CPU devices and runs `jax.distributed.initialize`
against a local coordinator — the same rendezvous path a real multi-machine
TPU pod uses (`scripts/train.py --multihost`; reference counterpart:
`nerfstudio/scripts/train.py:110-230` DDP TCP rendezvous). The two processes
then run 2 sharded NeuRAD train steps over the SAME deterministic global batch
(each host feeding only its local half) and process 0 dumps the resulting
params + loss for comparison with the single-process 8-device run.

Run via the pytest driver, not directly.
"""

import os
import pickle
import sys

import numpy as np


def main():
    coord, pid, out_path, batch_path = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
    import jax

    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert jax.local_device_count() == 4

    import jax.numpy as jnp  # noqa: F401

    from neurad_tpu.data.datamanager import ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.parallel.sharding import make_mesh, make_sharded_train_step
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig
    from tests.test_e2e_train import TINY_MODEL

    parser = SyntheticDataParserConfig(num_frames=4, image_height=24, image_width=24).setup()
    outputs = parser.get_dataparser_outputs()
    config = ADPipelineConfig(
        datamanager=ADDataManagerConfig(num_cam_patches=4, patch_size=6, num_lidar_rays=112),
        model_overrides=TINY_MODEL,
        train_ray_chunk=0,
    )
    pipe = ADPipeline(outputs, config)
    assert pipe._train_num_cam_rays == 2 * pipe.num_cam_rays

    state, tx = pipe.init_state(jax.random.PRNGKey(0))
    step = make_sharded_train_step(
        pipe.make_train_step(tx), make_mesh(), num_cam_rays=pipe.num_cam_rays
    )

    # deterministic global batches from the driver (flat leaf lists; the
    # treedef comes from this process's own next_train so nothing jax-internal
    # is pickled); this host slices ITS half of each modality (global layout
    # [cam0|cam1|lidar0|lidar1])
    with open(batch_path, "rb") as f:
        batches = pickle.load(f)
    C = pipe.num_cam_rays
    treedef = jax.tree.structure(pipe.datamanager.next_train())

    def local_half(global_tree_flat):
        def split(x):
            x = np.asarray(x)
            if x.shape[0] == 2 * (C + 112):  # bundle leaf: [cam(2C) | lidar(224)]
                cam = x[pid * C : (pid + 1) * C]
                lid = x[2 * C + pid * 112 : 2 * C + (pid + 1) * 112]
                return np.concatenate([cam, lid])
            half = x.shape[0] // 2  # single-modality GT leaf: host blocks
            return x[pid * half : (pid + 1) * half]

        return jax.tree.unflatten(treedef, [split(x) for x in global_tree_flat])

    metrics = None
    for flat in batches:
        bundle, batch = local_half(flat)
        state, metrics = step(state, bundle, batch)

    if pid == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # force-replicate outputs so addressable shard 0 holds full values
        # (GSPMD is free to leave some train-step outputs sharded)
        repl = NamedSharding(make_mesh(), P())
        pull = jax.jit(lambda t: t, out_shardings=repl)
        params_repl = pull(state.params)
        loss_repl = pull(metrics["total_loss"])
        leaves = [np.asarray(x.addressable_data(0)) for x in jax.tree.leaves(params_repl)]
        with open(out_path, "wb") as f:
            pickle.dump({"loss": float(np.asarray(loss_repl.addressable_data(0))),
                         "param_leaves": leaves}, f)
    # make sure both processes finish before the coordinator dies
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
