"""Does the REFERENCE's interlevel loss also explode with hashgrid proposals?

The prop-hashgrid quality-A/B arm diverges (interlevel 0.003 -> ~6 within 50
steps, then a slow tail; VERDICT r4 Weak #3). Point-wise grad oracles can't
see training dynamics, so this harness trains the REFERENCE NeuRAD model
(torch, CPU, heavy deps stubbed exactly as tests/test_full_model_parity.py)
on the SAME synthetic-scene ray batches with its own optimizer groups and
schedules, logging the interlevel trajectory. If the reference exhibits the
same spike, the behavior is architecture-intrinsic (hashgrid+linear proposal
density vs smooth MLP proposal) and not an implementation bug.

Run the matching OURS-side config with:
  python benchmarks/prop_instability.py --arm prop-hashgrid --reduced
Usage: python benchmarks/ref_dynamics.py [--steps 400] [--log-every 25]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

# reduced config shared with prop_instability --reduced
N_PATCHES, PATCH, N_LIDAR = 4, 16, 1024
UPSAMPLE = 3
STATIC = dict(hashgrid_dim=4, num_levels=8, base_res=32, max_res=8192, log2_hashmap_size=19)
PROP = dict(hashgrid_dim=1, num_levels=6, base_res=128, max_res=4096, log2_hashmap_size=18)
GROUPS = {
    "trajectory_opt": dict(lr=1e-3, lr_final=1e-4, warmup_steps=2500),
    "cnn": dict(lr=1e-3, lr_final=1e-4, warmup_steps=2500),
    "fields": dict(lr=1e-2, lr_final=1e-3, warmup_steps=500),
    "hashgrids": dict(lr=1e-2, lr_final=1e-3, warmup_steps=500),
    "camera_opt": dict(lr=1e-4, lr_final=1e-5, warmup_steps=2500),
}


def sched_factor(step, lr, lr_final, warmup, max_steps, lr_pre_warmup=1e-8):
    """nerfstudio ExponentialDecayScheduler (schedulers.py:109-142), as a
    multiplier for torch LambdaLR."""
    if warmup > 0 and step < warmup:
        v = lr_pre_warmup + (lr - lr_pre_warmup) * math.sin(0.5 * math.pi * min(step / warmup, 1.0))
    else:
        t = min(max((step - warmup) / max(max_steps - warmup, 1), 0.0), 1.0)
        v = math.exp(math.log(lr) * (1.0 - t) + math.log(lr_final) * t)
    return v / lr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--log-every", type=int, default=25)
    args = ap.parse_args()

    from test_full_model_parity import ref as _reffix

    ref = _reffix.__wrapped__()
    torch = ref.torch
    torch.manual_seed(3)

    from neurad_tpu.data.datamanager import ADDataManager, ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig

    parser = SyntheticDataParserConfig(num_frames=10, image_height=96, image_width=144).setup()
    outputs = parser.get_dataparser_outputs()
    dm = ADDataManager(
        outputs,
        ADDataManagerConfig(num_cam_patches=N_PATCHES, patch_size=PATCH, num_lidar_rays=N_LIDAR),
        seed=0,
    )
    n_cam = dm.num_cam_rays

    # ---- reference model at the reduced config, actors empty ----
    static = ref.RefStaticSettings(**STATIC)
    prop_grid = lambda: ref.RefGridConfig(
        static=ref.RefStaticSettings(**PROP),
        actor=ref.RefActorSettings(flip_prob=0.0),
        require_actor_grad=False,
    )
    config = ref.ref_neurad.NeuRADModelConfig(
        implementation="torch",
        enable_collider=False,
        field=ref.RefFieldConfig(
            grid=ref.RefGridConfig(
                static=static, actor=ref.RefActorSettings(flip_prob=0.0), require_actor_grad=False
            ),
        ),
        sampling=ref.ref_neurad.SamplingSettings(
            proposal_field_1=ref.RefPropConfig(grid=prop_grid()),
            proposal_field_2=ref.RefPropConfig(grid=prop_grid()),
        ),
        loss=ref.ref_neurad.LossSettings(vgg_mult=0.0),
        rgb_upsample_factor=UPSAMPLE,
    )
    aabb_val = float(np.abs(np.asarray(outputs.scene_box.aabb)).max())
    aabb = torch.tensor([[-aabb_val] * 3, [aabb_val] * 3], dtype=torch.float32)
    model = ref.ref_neurad.NeuRADModel(
        config=config,
        scene_box=ref.SceneBox(aabb=aabb),
        num_train_data=len(outputs.images),
        metadata={
            "trajectories": [],
            "duration": outputs.duration,
            "sensor_idx_to_name": outputs.sensor_idx_to_name,
        },
    )
    model.train()
    # intended (correctly-bound) density_fns, as in the oracle
    import functools

    model.density_fns = [
        functools.partial(lambda f, x: f.get_density(x)[0], f) for f in model.proposal_fields
    ]

    # ---- optimizer: reference groups + schedules compressed to --steps ----
    param_groups = model.get_param_groups()
    ratio = args.steps / 20000.0
    opts, scheds = [], []
    for gname, params in param_groups.items():
        if not params:
            continue
        g = GROUPS[gname]
        opt = torch.optim.Adam(params, lr=g["lr"], eps=1e-15)
        warm = max(1, int(g["warmup_steps"] * ratio))
        lam = functools.partial(
            sched_factor, lr=g["lr"], lr_final=g["lr_final"], warmup=warm, max_steps=args.steps + 1
        )
        scheds.append(torch.optim.lr_scheduler.LambdaLR(opt, lambda s, _l=lam: _l(s)))
        opts.append(opt)

    from nerfstudio.cameras.rays import RayBundle

    def to_ref(bundle, batch):
        t = lambda x: torch.from_numpy(np.asarray(x))
        md = bundle.metadata
        rb = RayBundle(
            origins=t(bundle.origins), directions=t(bundle.directions),
            pixel_area=t(bundle.pixel_area), camera_indices=t(bundle.camera_indices).long(),
            nears=None, fars=None, times=t(bundle.times),
            metadata=dict(
                is_lidar=t(md["is_lidar"]), sensor_idxs=t(md["sensor_idxs"]).long(),
                directions_norm=t(md["directions_norm"]), did_return=t(md["did_return"]),
            ),
        )
        n_l = int(np.asarray(md["is_lidar"]).sum())
        lidar_pts = np.concatenate(
            [np.zeros((n_l, 3), np.float32), np.asarray(batch["intensity"]),
             np.zeros((n_l, 1), np.float32)], axis=1,
        )
        bt = {
            "image": t(batch["image"]),
            "lidar": torch.from_numpy(lidar_pts),
            "is_lidar": t(md["is_lidar"]),
            "did_return": t(md["did_return"]),
            "distance": t(batch["distance"]),
        }
        return rb, bt

    print(f"[ref_dynamics] steps={args.steps} rays={n_cam}+{N_LIDAR}", flush=True)
    for i in range(args.steps):
        bundle, batch = dm.next_train()
        rb, bt = to_ref(bundle, batch)
        out = model.get_outputs(rb, (PATCH, PATCH))
        metrics = model.get_metrics_dict(out, bt)
        losses = model.get_loss_dict(out, bt, metrics)
        total = sum(losses.values())
        for o in opts:
            o.zero_grad()
        total.backward()
        for o in opts:
            o.step()
        for s in scheds:
            s.step()
        if i % args.log_every == 0 or i == args.steps - 1:
            keys = ["rgb_loss", "interlevel_loss", "depth_loss", "distortion_loss"]
            msg = " ".join(f"{k}={float(losses[k]):.5f}" for k in keys if k in losses)
            print(f"[step {i}] total={float(total):.5f} {msg}", flush=True)


if __name__ == "__main__":
    main()
