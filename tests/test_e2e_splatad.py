"""End-to-end SplatAD: synthetic scene -> camera/lidar steps -> loss drops, MCMC refines."""

import jax
import numpy as np
import pytest

from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
from neurad_tpu.data.full_image_datamanager import FullImageLidarDataManagerConfig
from neurad_tpu.model_components.strategy import MCMCStrategyConfig
from neurad_tpu.models.splatad import SplatADConfig
from neurad_tpu.pipelines.splatad_pipeline import SplatADPipeline, SplatADPipelineConfig


@pytest.fixture(scope="module")
def pipeline():
    parser = SyntheticDataParserConfig(num_frames=5, image_height=32, image_width=48,
                                       lidar_channels=8, lidar_azimuths=90).setup()
    outputs = parser.get_dataparser_outputs()
    config = SplatADPipelineConfig(
        datamanager=FullImageLidarDataManagerConfig(max_lidar_points=512),
        model=SplatADConfig(num_downscales=0, feature_dim=8, appearance_dim=4, max_per_tile=64, lidar_max_per_tile=32),
        mcmc=MCMCStrategyConfig(cap_max=1024, refine_start_iter=5, refine_stop_iter=100, refine_every=10),
        cap_max=1024,
    )
    return SplatADPipeline(outputs, config)


def test_splatad_trains(pipeline):
    state = pipeline.init_state()
    cam_losses, lid_losses = [], []
    for i in range(150):
        sample = pipeline.datamanager.next_train()
        state, metrics = pipeline.train_step(state, sample)
        loss = float(metrics["total_loss"])
        assert np.isfinite(loss), f"step {i}: loss not finite"
        if "psnr" in metrics:
            cam_losses.append(float(metrics["main_loss"]))
        else:
            lid_losses.append(float(metrics["depth_loss"]))
    assert cam_losses and lid_losses, "both modalities should be exercised"
    # losses must REALLY decrease (same spirit as test_e2e_train.py's 0.9 bar;
    # measured trajectory here reaches ~0.46x by step 150)
    assert np.mean(cam_losses[-3:]) < np.mean(cam_losses[:3]) * 0.7, (
        f"camera loss did not drop: first3={cam_losses[:3]} last3={cam_losses[-3:]}"
    )
    pipeline._test_state = state


def test_splatad_eval(pipeline):
    state = getattr(pipeline, "_test_state", None) or pipeline.init_state()
    metrics = pipeline.eval_metrics(state)
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])
    assert "depth_median_l2" in metrics and np.isfinite(metrics["depth_median_l2"])


def test_splatad_fid_suite(pipeline):
    """SplatAD novel-view FID suite: lane/vertical pose shifts + actor edits
    produce finite FID values with the reference's metric keys."""
    state = getattr(pipeline, "_test_state", None) or pipeline.init_state()
    metrics = pipeline.eval_fid_suite(state, max_images=2)
    for key in ("fid_lane_shift_2m", "fid_vertical_shift_1m"):
        assert any(k.startswith("fid_") for k in metrics)
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    # the synthetic scene has actors -> actor-edit FIDs present
    assert "fid_actor_shift_rot" in metrics and "fid_actor_shift_trans" in metrics


def test_splatad_viewer_render_paths(pipeline):
    """SplatAD viewer rendering: camera image at an arbitrary pose with traced
    actor-edit values (no recompile per slider move) and the virtual-lidar
    point cloud path (counterpart of the reference's render_state_machine +
    splatad RS/actor-edit sliders)."""
    state = getattr(pipeline, "_test_state", None) or pipeline.init_state()
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:3, 3] = [5.0, 0.0, 2.0]

    img0 = pipeline.render_viewer_image(state.params, c2w, 48, 32, time=1.0)
    assert img0.shape == (32, 48, 3) and np.isfinite(img0).all()
    img1 = pipeline.render_viewer_image(
        state.params, c2w, 48, 32, time=1.0, edits_vec=[3.0, 0.0, 0.5, 0.0, 0.02]
    )
    assert len(pipeline._viewer_applies) == 1  # traced edits (incl. RS): same jit cache entry
    assert img1.shape == img0.shape and np.isfinite(img1).all()

    pts = pipeline.render_virtual_lidar(
        state.params, np.array([5.0, 0.0, 2.0]), time=1.0,
        channels=8, azim_res_deg=20.0, drop_threshold=1.1,
    )
    assert pts.ndim == 2 and pts.shape[1] == 4
    assert pts.shape[0] > 0  # threshold > 1 keeps every ray


def test_default_strategy_camera_training():
    """splatad with ADDefaultStrategy: camera steps accumulate absgrad stats and
    refine runs grow/prune without shape changes."""
    from neurad_tpu.model_components.strategy import DefaultStrategyConfig, alive_mask
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipeline, SplatADPipelineConfig
    from neurad_tpu.data.full_image_datamanager import FullImageLidarDataManagerConfig
    from neurad_tpu.models.splatad import SplatADConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.data.full_image_datamanager import CameraSample

    parser = SyntheticDataParserConfig(num_frames=4, image_height=48, image_width=64).setup()
    outputs = parser.get_dataparser_outputs()
    config = SplatADPipelineConfig(
        datamanager=FullImageLidarDataManagerConfig(max_lidar_points=256),
        model=SplatADConfig(num_downscales=0, feature_dim=8, appearance_dim=4, max_per_tile=32, lidar_max_per_tile=16),
        strategy="default",
        default_strategy=DefaultStrategyConfig(
            refine_start_iter=2, refine_stop_iter=100, refine_every=6, reset_every=10_000,
            grow_grad2d=1e-8, max_grow_per_refine=256,
        ),
        cap_max=1024,
    )
    pipe = SplatADPipeline(outputs, config)
    state = pipe.init_state(jax.random.PRNGKey(0))
    n0 = int(alive_mask({**{k: state.params["params"][k] for k in ("scales", "opacities")}}).sum())

    losses = []
    for i in range(14):
        # force camera samples (absgrad only accumulates on camera steps)
        sample = pipe.datamanager.next_train()
        while not isinstance(sample, CameraSample):
            sample = pipe.datamanager.next_train()
        state, m = pipe.train_step(state, sample)
        losses.append(float(m["total_loss"]))

    assert np.isfinite(losses).all()
    p = state.params["params"]
    assert p["means"].shape[0] == 1024, "capacity must not change"
    n1 = int(alive_mask({k: p[k] for k in ("scales", "opacities")}).sum())
    assert n1 != n0 or n0 == 1024, "expected densification activity"


def test_resolution_downscale_schedule():
    """Coarse-to-fine schedule (`splatad.py:806-810`): early steps train at
    reduced resolution, ramping to full."""
    import dataclasses as dc

    from neurad_tpu.data.full_image_datamanager import CameraSample
    from neurad_tpu.models.splatad import SplatADConfig
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipeline, SplatADPipelineConfig

    pipe = object.__new__(SplatADPipeline)  # only needs .config for this method
    pipe.config = SplatADPipelineConfig(model=SplatADConfig(num_downscales=2, resolution_schedule=100))
    img = np.zeros((64, 96, 3), np.float32)
    s = CameraSample(c2w=np.eye(4)[:3], K=np.diag([100.0, 100.0, 1.0]), width=96, height=64,
                     image=img, time=0.0, sensor_idx=0, cam_idx=0,
                     linear_velocity=np.zeros(3), rolling_shutter_time=0.0, time_to_center_pixel=0.0)
    s0 = pipe._downscale_sample(s, 0)
    assert (s0.height, s0.width) == (16, 24)
    assert abs(s0.K[0, 0] - 25.0) < 1e-6
    s1 = pipe._downscale_sample(s, 100)
    assert (s1.height, s1.width) == (32, 48)
    s2 = pipe._downscale_sample(s, 200)
    assert (s2.height, s2.width) == (64, 96)


def test_seed_gaussians_per_time_mirror_and_rgb():
    """Seeding: per-time box assignment, symmetric mirror duplication, painted
    RGB feature init (`splatad.py:632-689` + paint_points)."""
    from neurad_tpu.models.splatad import seed_gaussians

    # actor moves from x=0 (t=0) to x=10 (t=1); symmetric
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    poses[1, 0, 3] = 10.0
    traj = {"poses": poses, "timestamps": np.array([0.0, 1.0]), "dims": np.array([2.0, 2.0, 2.0]),
            "symmetric": True, "deformable": False}
    # a point at x=10 at t=1 is INSIDE the box only with per-time assignment
    pts = np.array([
        [10.5, 0.5, 0.0, 0.8, 1.0, 0.0, 0.0, 1.0],   # in box at t=1, red
        [50.0, 0.0, 0.0, 0.2, 0.0, 1.0, 0.0, 0.0],   # static, green
    ], dtype=np.float32)
    init = seed_gaussians(pts, [traj], cap_max=64, feature_dim=8, n_far_points=4, seed=0)
    actor_rows = init.ids == 0
    assert actor_rows.sum() >= 2, "expected in-box point + its mirror"
    actor_means = init.means[actor_rows]
    # mirror: both +y offsets at x=+0.5 (local ~ (0, 0.5)) and x=-0.5 present... x mirrored
    xs = np.sort(np.round(actor_means[:, 0], 2))
    assert (xs < 0).any() and (xs > 0).any(), f"no mirrored x: {xs}"
    # painted red color seeds features of the in-box rows
    red_rows = init.features[actor_rows][:, 0]
    assert (red_rows > 0.9).all()
