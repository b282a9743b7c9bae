"""nt-eval: load a checkpoint and compute eval metrics -> JSON.

TPU-native counterpart of `nerfstudio/scripts/eval.py:35-69` (ComputePSNR.main →
eval_setup → get_average_eval_image_metrics → JSON dump).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load_run(run_dir: str):
    """Rebuild pipeline + restore latest checkpoint from an nt-train run dir
    (counterpart of `utils/eval_utils.py:eval_setup`)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from neurad_tpu.configs.method_configs import get_dataparser, get_method_config

    run = Path(run_dir)
    meta = json.loads((run / "config.json").read_text())
    cfg = get_method_config(meta["method"])
    from neurad_tpu.scripts.train import _apply_override

    for ov in meta.get("overrides", []):
        path, _, value = ov.partition("=")
        _apply_override(cfg, path, value)

    dataparser = get_dataparser(meta["dataparser"])
    outputs = dataparser.get_dataparser_outputs("test")
    # same dispatch as training: ray (ADPipeline) vs full-sensor
    # (SplatAD/Splatfacto) pipelines restore from the same run layout
    pipeline = cfg.build_pipeline(outputs)
    ret = pipeline.init_state(jax.random.PRNGKey(meta.get("seed", 42)))
    state = ret[0] if isinstance(ret, tuple) else ret  # splat pipelines return bare state

    mngr = ocp.CheckpointManager(str((run / "checkpoints").absolute()))
    step = mngr.latest_step()
    if step is not None:
        tmpl = {"params": state.params, "opt_state": state.opt_state, "rng": state.rng}
        try:
            restored = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
        except ValueError:  # older 2-field checkpoints (no rng)
            tmpl.pop("rng")
            restored = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
        state = state.replace(
            step=jnp.asarray(step),
            params=restored["params"],
            opt_state=restored["opt_state"],
            rng=restored.get("rng", state.rng),
        )
    return pipeline, state, step


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a trained neurad_tpu run")
    parser.add_argument("run_dir", help="nt-train output directory")
    parser.add_argument("--output", default=None, help="JSON output path (default: <run_dir>/eval.json)")
    parser.add_argument(
        "--fid", action="store_true",
        help="also run the novel-view FID suite (lane/vertical shifts + actor edits;"
        " the reference computes these at ns-eval, ad_pipeline.py:348-357)",
    )
    parser.add_argument("--fid-max-images", type=int, default=None)
    args = parser.parse_args(argv)

    pipeline, state, step = load_run(args.run_dir)
    metrics = pipeline.eval_metrics(state)
    if args.fid and hasattr(pipeline, "eval_fid_suite"):
        metrics.update(pipeline.eval_fid_suite(state, max_images=args.fid_max_images))
    result = {"checkpoint_step": step, "results": metrics}
    out_path = Path(args.output or (Path(args.run_dir) / "eval.json"))
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    entrypoint()
