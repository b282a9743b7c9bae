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
    parser.add_argument(
        "--load-dir", default=None,
        help="checkpoints dir of a previous run to resume from (reference --load-dir)",
    )
    parser.add_argument("--multihost", action="store_true", help="jax.distributed.initialize() for pods")
    parser.add_argument("--no-mesh", action="store_true", help="disable ray-batch sharding over devices (sharded by default when >1 device)")
    parser.add_argument("--viewer", action="store_true", help="serve the live browser viewer during training")
    parser.add_argument("--viewer-port", type=int, default=7007)
    parser.add_argument("--set", action="append", default=[], metavar="PATH=VALUE", help="config override")
    parser.add_argument(
        "--dp-set", action="append", default=[], metavar="KEY=VALUE",
        help="dataparser config override (e.g. image_height=480); ints/floats auto-coerced",
    )
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
    for ov in args.dp_set:
        k, _, v = ov.partition("=")
        try:
            dp_kwargs[k] = int(v)
        except ValueError:
            try:
                dp_kwargs[k] = float(v)
            except ValueError:
                dp_kwargs[k] = v
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

        server = ViewerServer(
            render_fn, port=args.viewer_port, lidar_fn=lidar_fn, export_fn=export_fn
        )
        server.start(background=True)
        return server

    def _make_ckpt_manager():
        import orbax.checkpoint as ocp

        return ocp.CheckpointManager(
            cfg.trainer.checkpoint_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=cfg.trainer.keep_last_n_checkpoints),
        )

    def _save_ckpt(mngr, step, state, host_source=None):
        import orbax.checkpoint as ocp

        mngr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": state.params, "opt_state": state.opt_state, "rng": state.rng}
            ),
        )
        # host sampler state rides the checkpoint for bit-exact resume
        # (same contract as Trainer.save_checkpoint / host_state_{step}.json)
        if host_source is not None and hasattr(host_source, "rng_state"):
            from pathlib import Path as _Path

            (_Path(cfg.trainer.checkpoint_dir) / f"host_state_{step}.json").write_text(
                json.dumps(host_source.rng_state(), default=int)
            )

    def _load_ckpt(mngr_dir, state, host_source=None):
        """Restore (state, start_step) from a previous run's checkpoints dir."""
        import jax.numpy as jnp
        import orbax.checkpoint as ocp
        from pathlib import Path as _Path

        mngr = ocp.CheckpointManager(str(_Path(mngr_dir).absolute()))
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {mngr_dir}")
        tmpl = {"params": state.params, "opt_state": state.opt_state, "rng": state.rng}
        restored = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
        state = state.replace(
            step=jnp.asarray(step), params=restored["params"],
            opt_state=restored["opt_state"], rng=restored["rng"],
        )
        host = _Path(mngr_dir) / f"host_state_{step}.json"
        if host_source is not None and host.exists() and hasattr(host_source, "set_rng_state"):
            host_source.set_rng_state(json.loads(host.read_text()))
        return state, int(step)

    if cfg.pipeline_type == "splatfacto":
        # camera-only splatting: pipeline samples its own train cameras
        state, _ = pipeline.init_state(jax.random.PRNGKey(args.seed))
        start = 0
        if args.load_dir:
            state, start = _load_ckpt(args.load_dir, state, host_source=pipeline)
        mngr = _make_ckpt_manager()
        sharded_step = None
        if not args.no_mesh and len(jax.devices()) > 1:
            # data-parallel by default: one camera per device, grads psum'd
            # (the reference DDP-wraps splat pipelines too, base_pipeline.py:306)
            from neurad_tpu.parallel.sharding import make_mesh

            sharded_step = pipeline.make_sharded_train_step(make_mesh())
        metrics = {}
        for i in range(start, cfg.trainer.max_num_iterations):
            state, m = sharded_step(state) if sharded_step is not None else pipeline.train_step(state)
            if i % cfg.trainer.steps_per_log == 0:
                metrics = {k: float(v) for k, v in m.items()}
                metrics["num_gaussians"] = pipeline.num_alive(state)
                writer.write_scalars(i, metrics)
            if i > 0 and i % cfg.trainer.steps_per_eval_batch == 0:
                metrics["eval/psnr"] = pipeline.eval_psnr(state)
                writer.write_scalars(i, {"eval/psnr": metrics["eval/psnr"]})
            if i > 0 and i % cfg.trainer.steps_per_save == 0:
                _save_ckpt(mngr, i, state, host_source=pipeline)
        _save_ckpt(mngr, cfg.trainer.max_num_iterations, state, host_source=pipeline)
        mngr.wait_until_finished()
        print(f"[nt-train] done: {json.dumps(metrics)}")
        return state

    if cfg.pipeline_type == "splatad":
        # full-sensor loop: the pipeline dispatches per-modality jit steps itself
        state = pipeline.init_state(jax.random.PRNGKey(args.seed))
        start = 0
        if args.load_dir:
            state, start = _load_ckpt(args.load_dir, state, host_source=pipeline.datamanager)
        mngr = _make_ckpt_manager()
        state_ref = {"state": state}
        viewer = None
        if args.viewer:
            viewer = _start_viewer(pipeline, lambda: state_ref["state"], run_dir, args)
        sharded_step = None
        n_dev = len(jax.devices())
        if not args.no_mesh and n_dev > 1:
            # data-parallel by default: one camera frame / lidar scan per
            # device, per-sample losses averaged, grads psum'd over the mesh
            # (the reference DDP-wraps SplatAD too, splatad_pipeline.py:172)
            from neurad_tpu.parallel.sharding import make_mesh

            sharded_step = pipeline.make_sharded_train_step(make_mesh())
        metrics = {}
        for i in range(start, cfg.trainer.max_num_iterations):
            if viewer is not None:
                viewer.train_gate()
            if sharded_step is not None:
                samples = pipeline.datamanager.next_train_batch(n_dev)
                state, m = sharded_step(state, samples)
            else:
                sample = pipeline.datamanager.next_train()
                state, m = pipeline.train_step(state, sample)
            state_ref["state"] = state
            if i % cfg.trainer.steps_per_log == 0:
                metrics = {k: float(v) for k, v in m.items()}
                writer.write_scalars(i, metrics)
                if viewer is not None:
                    viewer.update_train_stats(i, loss=metrics.get("loss") or metrics.get("total_loss"))
            if i > 0 and i % cfg.trainer.steps_per_eval_batch == 0:
                ev = pipeline.eval_metrics(state)
                writer.write_scalars(i, {f"eval/{k}": v for k, v in ev.items()})
                metrics.update({f"eval/{k}": v for k, v in ev.items()})
            if i > 0 and i % cfg.trainer.steps_per_save == 0:
                _save_ckpt(mngr, i, state, host_source=pipeline.datamanager)
        _save_ckpt(mngr, cfg.trainer.max_num_iterations, state, host_source=pipeline.datamanager)
        mngr.wait_until_finished()
        print(f"[nt-train] done: {json.dumps(metrics)}")
        return state

    state, tx = pipeline.init_state(jax.random.PRNGKey(args.seed))
    step_fn = pipeline.make_train_step(tx)
    if not args.no_mesh and len(jax.devices()) > 1:
        # data-parallel by DEFAULT on any multi-device topology (the reference
        # wraps in DDP whenever world_size > 1, base_pipeline.py:306)
        from neurad_tpu.parallel.sharding import make_mesh, make_sharded_train_step

        step_fn = make_sharded_train_step(
            step_fn, make_mesh(), num_cam_rays=pipeline.num_cam_rays
        )

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
    if args.load_dir:
        trainer.load_checkpoint(from_dir=args.load_dir)

    if args.viewer:
        trainer.viewer = _start_viewer(pipeline, lambda: trainer.state, run_dir, args)

    metrics = trainer.train()
    print(f"[nt-train] done: {json.dumps(metrics)}")
    return trainer


if __name__ == "__main__":
    entrypoint()
