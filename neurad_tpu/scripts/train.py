"""nt-train: train a method on a dataset.

TPU-native counterpart of `nerfstudio/scripts/train.py` (entrypoint 265, launch
167). No mp.spawn / process groups: multi-chip = one process per host with a jit
over the device mesh (`neurad_tpu/parallel/sharding.py`); multi-host adds
`jax.distributed.initialize()` (--multihost).

Usage:
  nt-train neurad-tiny                          # synthetic scene smoke run
  nt-train neurad --dataparser synthetic --max-iterations 1000
  nt-train neurad --set trainer.steps_per_log=50
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def _apply_override(obj, dotted: str, value: str):
    """Set cfg.a.b.c = parsed(value) for '--set a.b.c=value'."""
    parts = dotted.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    cur = getattr(obj, parts[-1])
    if isinstance(cur, bool):
        parsed = value.lower() in ("1", "true", "yes")
    elif isinstance(cur, int):
        parsed = int(value)
    elif isinstance(cur, float):
        parsed = float(value)
    else:
        parsed = value
    setattr(obj, parts[-1], parsed)


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Train a neurad_tpu method")
    parser.add_argument("method", help="method name (e.g. neurad, neurad-tiny)")
    parser.add_argument("--dataparser", default=None, help="dataparser name (default: method preset)")
    parser.add_argument("--data", default=None, help="dataset root path")
    parser.add_argument("--sequence", default=None, help="sequence id (dataset-specific)")
    parser.add_argument("--max-iterations", type=int, default=None)
    parser.add_argument("--output-dir", default="outputs")
    parser.add_argument("--experiment-name", default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--multihost", action="store_true", help="jax.distributed.initialize() for pods")
    parser.add_argument("--no-mesh", action="store_true", help="disable ray-batch sharding over devices (sharded by default when >1 device)")
    parser.add_argument("--viewer", action="store_true", help="serve the live browser viewer during training")
    parser.add_argument("--viewer-port", type=int, default=7007)
    parser.add_argument("--set", action="append", default=[], metavar="PATH=VALUE", help="config override")
    args = parser.parse_args(argv)

    import jax

    if args.multihost:
        jax.distributed.initialize()

    from neurad_tpu.configs.method_configs import get_dataparser, get_method_config
    from neurad_tpu.engine.trainer import Trainer
    from neurad_tpu.utils.writer import LocalWriter, TensorboardWriter, MultiWriter

    cfg = get_method_config(args.method)
    if args.max_iterations is not None:
        cfg.trainer.max_num_iterations = args.max_iterations
    for ov in args.set:
        path, _, value = ov.partition("=")
        _apply_override(cfg, path, value)

    dp_kwargs = {}
    if args.data:
        dp_kwargs["data"] = args.data
    if args.sequence:
        dp_kwargs["sequence"] = args.sequence
    dataparser = get_dataparser(args.dataparser or cfg.dataparser, **dp_kwargs)
    outputs = dataparser.get_dataparser_outputs("train")

    exp_name = args.experiment_name or f"{args.method}-{time.strftime('%Y%m%d-%H%M%S')}"
    run_dir = Path(args.output_dir) / exp_name
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg.trainer.checkpoint_dir = str((run_dir / "checkpoints").absolute())
    (run_dir / "config.json").write_text(
        json.dumps({"method": args.method, "dataparser": args.dataparser or cfg.dataparser,
                    "overrides": args.set, "seed": args.seed}, indent=2)
    )

    cfg.pipeline.seed = args.seed
    pipeline = cfg.build_pipeline(outputs)
    writer = MultiWriter([LocalWriter(), TensorboardWriter(str(run_dir / "tb"))])
    print(f"[nt-train] {args.method} on {args.dataparser or cfg.dataparser}: "
          f"{cfg.trainer.max_num_iterations} iters, backend={jax.default_backend()}")

    def _start_viewer(pipeline, get_state, run_dir, args):
        # live viewer against the CURRENT train state, under a lock shared with
        # the step loop (the reference's train_lock, `trainer.py:171`)
        import numpy as np

        from neurad_tpu.viewer.server import ViewerServer

        def _edits_vec(edits):
            if not edits:
                return None
            return np.asarray([
                edits.get("lateral", 0.0), edits.get("longitudinal", 0.0),
                edits.get("rotation", 0.0), edits.get("height", 0.0),
                edits.get("rs", 0.0),  # rolling-shutter slider (splatad only)
            ], dtype=np.float32)

        def render_fn(c2w, width, height, t01, edits=None):
            return pipeline.render_viewer_image(
                get_state().params, c2w, width, height,
                t01 * pipeline.outputs.duration, _edits_vec(edits),
            )

        lidar_fn = None
        if hasattr(pipeline, "render_virtual_lidar"):

            def lidar_fn(t01, channels, azim_res, drop_threshold, edits=None):
                # virtual lidar mounted at the mean train-camera position
                origin = np.asarray(pipeline.outputs.cameras.camera_to_worlds)[:, :3, 3].mean(0)
                origin[2] += 0.5
                return pipeline.render_virtual_lidar(
                    get_state().params, origin, t01 * pipeline.outputs.duration,
                    channels=channels, azim_res_deg=azim_res,
                    drop_threshold=drop_threshold, edits_vec=_edits_vec(edits),
                )

        def export_fn():
            if type(pipeline).__name__ == "SplatADPipeline":
                from neurad_tpu.scripts.export import export_gaussian_splat

                path = run_dir / "viewer_export_splat.ply"
                export_gaussian_splat(get_state().params, path)
            else:
                from neurad_tpu.scripts.export import export_pointcloud

                path = run_dir / "viewer_export_pointcloud.ply"
                export_pointcloud(pipeline, get_state(), path)
            return str(path)

        ViewerServer(
            render_fn, port=args.viewer_port, lidar_fn=lidar_fn, export_fn=export_fn
        ).start(background=True)

    def _make_ckpt_manager():
        import orbax.checkpoint as ocp

        return ocp.CheckpointManager(
            cfg.trainer.checkpoint_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=cfg.trainer.keep_last_n_checkpoints),
        )

    def _save_ckpt(mngr, step, state):
        import orbax.checkpoint as ocp

        mngr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": state.params, "opt_state": state.opt_state, "rng": state.rng}
            ),
        )

    if cfg.pipeline_type == "splatfacto":
        # camera-only splatting: pipeline samples its own train cameras
        state, _ = pipeline.init_state(jax.random.PRNGKey(args.seed))
        mngr = _make_ckpt_manager()
        metrics = {}
        for i in range(cfg.trainer.max_num_iterations):
            state, m = pipeline.train_step(state)
            if i % cfg.trainer.steps_per_log == 0:
                metrics = {k: float(v) for k, v in m.items()}
                metrics["num_gaussians"] = pipeline.num_alive(state)
                writer.write_scalars(i, metrics)
            if i > 0 and i % cfg.trainer.steps_per_eval_batch == 0:
                metrics["eval/psnr"] = pipeline.eval_psnr(state)
                writer.write_scalars(i, {"eval/psnr": metrics["eval/psnr"]})
            if i > 0 and i % cfg.trainer.steps_per_save == 0:
                _save_ckpt(mngr, i, state)
        _save_ckpt(mngr, cfg.trainer.max_num_iterations, state)
        mngr.wait_until_finished()
        print(f"[nt-train] done: {json.dumps(metrics)}")
        return state

    if cfg.pipeline_type == "splatad":
        # full-sensor loop: the pipeline dispatches per-modality jit steps itself
        state = pipeline.init_state(jax.random.PRNGKey(args.seed))
        mngr = _make_ckpt_manager()
        state_ref = {"state": state}
        if args.viewer:
            _start_viewer(pipeline, lambda: state_ref["state"], run_dir, args)
        metrics = {}
        for i in range(cfg.trainer.max_num_iterations):
            sample = pipeline.datamanager.next_train()
            state, m = pipeline.train_step(state, sample)
            state_ref["state"] = state
            if i % cfg.trainer.steps_per_log == 0:
                metrics = {k: float(v) for k, v in m.items()}
                writer.write_scalars(i, metrics)
            if i > 0 and i % cfg.trainer.steps_per_eval_batch == 0:
                ev = pipeline.eval_metrics(state)
                writer.write_scalars(i, {f"eval/{k}": v for k, v in ev.items()})
                metrics.update({f"eval/{k}": v for k, v in ev.items()})
            if i > 0 and i % cfg.trainer.steps_per_save == 0:
                _save_ckpt(mngr, i, state)
        _save_ckpt(mngr, cfg.trainer.max_num_iterations, state)
        mngr.wait_until_finished()
        print(f"[nt-train] done: {json.dumps(metrics)}")
        return state

    state, tx = pipeline.init_state(jax.random.PRNGKey(args.seed))
    step_fn = pipeline.make_train_step(tx)
    if not args.no_mesh and len(jax.devices()) > 1:
        # data-parallel by DEFAULT on any multi-device topology (the reference
        # wraps in DDP whenever world_size > 1, base_pipeline.py:306)
        from neurad_tpu.parallel.sharding import make_mesh, make_sharded_train_step

        step_fn = make_sharded_train_step(step_fn, make_mesh())

    trainer = Trainer(
        step_fn,
        state,
        pipeline.datamanager.iter_train(),
        cfg.trainer,
        eval_fn=pipeline.eval_metrics,
        writer=writer,
    )
    # host sampler state rides the checkpoint for bit-exact resume
    trainer.datamanager = pipeline.datamanager

    if args.viewer:
        _start_viewer(pipeline, lambda: trainer.state, run_dir, args)

    metrics = trainer.train()
    print(f"[nt-train] done: {json.dumps(metrics)}")
    return trainer


if __name__ == "__main__":
    entrypoint()
