"""Diagnose the prop-hashgrid training divergence (VERDICT r4 Weak #3 / #2).

Trains the quality-A/B `prop-hashgrid` configuration while logging, every N
steps: per-optimizer-group gradient norms, per-proposal-level table-gradient
norms, proposal density statistics, and the loss decomposition. The goal is a
NAMED root cause: if proposal hash-table grads blow up first, it's the
bf16-table x lr-1e-2 interaction (cross-check: --fp32 flag); if the interlevel
loss leads the divergence, it's proposal-supervision dynamics; if the field's
own groups diverge first, the proposal is a bystander.

Usage: python benchmarks/prop_instability.py [--steps 2000] [--fp32] [--log-every 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--arm", default=None, help="explicit quality_ab arm name")
    ap.add_argument(
        "--reduced", action="store_true",
        help="CPU-sized config matching benchmarks/ref_dynamics.py (4x16 patches, "
        "1024 lidar rays, log2 19/18 tables, actors empty)",
    )
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from benchmarks.quality_ab import build_overrides, scaled_groups
    from neurad_tpu.data.datamanager import ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.engine.optimizers import label_params
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig

    overrides = build_overrides(args.arm or ("prop-hashgrid-fp32" if args.fp32 else "prop-hashgrid"))
    dm_cfg = ADDataManagerConfig(num_cam_patches=16, patch_size=32, num_lidar_rays=4096)
    if args.reduced:
        from benchmarks.ref_dynamics import N_LIDAR, N_PATCHES, PATCH, PROP, STATIC
        from neurad_tpu.fields.neurad_encoding import ActorSettings, StaticSettings
        from neurad_tpu.model_components.dynamic_actors import empty_actor_data

        dm_cfg = ADDataManagerConfig(
            num_cam_patches=N_PATCHES, patch_size=PATCH, num_lidar_rays=N_LIDAR
        )
        overrides = dict(
            overrides,
            actor_data=empty_actor_data(),
            field_static=StaticSettings(**STATIC),
            field_actor=ActorSettings(flip_prob=0.0),
            proposal_static=(StaticSettings(**PROP),) * 2,
            proposal_actor=ActorSettings(flip_prob=0.0, hashgrid_dim=1),
            loss=None,  # replaced below
        )
        from neurad_tpu.models.neurad import LossSettings

        overrides["loss"] = LossSettings(vgg_mult=0.0)
    parser = SyntheticDataParserConfig(num_frames=10, image_height=96, image_width=144).setup()
    config = ADPipelineConfig(
        datamanager=dm_cfg,
        model_overrides=overrides,
        optimizer_groups=scaled_groups(args.steps),
        seed=args.seed,
    )
    pipe = ADPipeline(parser.get_dataparser_outputs(), config)
    state, tx = pipe.init_state()

    labels = label_params(state.params)

    @jax.jit
    def grad_stats(params, bundle, batch, rng):
        grads = jax.grad(lambda p: pipe.loss_fn(p, bundle, batch, rng)[0])(params)
        flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
        flat_l = jax.tree.leaves(labels)
        by_group = {}
        per_leaf = {}
        for (path, g), lab in zip(flat_g, flat_l):
            nrm = jnp.sum(g.astype(jnp.float32) ** 2)
            by_group[lab] = by_group.get(lab, 0.0) + nrm
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            if "proposal" in p or "hash_table" in p:
                per_leaf[p] = jnp.sqrt(nrm)
        return {f"g2/{k}": jnp.sqrt(v) for k, v in by_group.items()}, per_leaf

    step_fn = pipe.make_train_step(tx)
    print(f"[prop_instability] fp32={args.fp32} steps={args.steps}", flush=True)
    t0 = time.perf_counter()
    for i in range(args.steps):
        bundle, batch = pipe.datamanager.next_train()
        if i % args.log_every == 0:
            gs, leaf = grad_stats(state.params, bundle, batch, jax.random.PRNGKey(1000 + i))
            rec = {"step": i, **{k: round(float(v), 5) for k, v in gs.items()}}
            top = sorted(leaf.items(), key=lambda kv: -float(kv[1]))[:4]
            rec["top_prop_leaves"] = {k.split("params/")[-1]: round(float(v), 4) for k, v in top}
            print(json.dumps(rec), flush=True)
        state, metrics = step_fn(state, bundle, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            keys = ["total_loss", "rgb_loss", "interlevel_loss", "depth_loss", "distortion_loss"]
            print(
                f"[step {i}] " + " ".join(f"{k}={float(metrics[k]):.5f}" for k in keys if k in metrics),
                flush=True,
            )
    jax.block_until_ready(state.params)
    print(f"[prop_instability] done in {time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
