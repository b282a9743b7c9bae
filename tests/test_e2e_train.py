"""End-to-end: synthetic scene -> datamanager -> NeuRAD -> jit train step -> loss drops.

The reference has NO e2e train test (SURVEY.md §4); this is the framework's core
integration guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurad_tpu.data.datamanager import ADDataManagerConfig
from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
from neurad_tpu.engine.optimizers import OptimizerGroupConfig
from neurad_tpu.fields.neurad_encoding import ActorSettings, StaticSettings
from neurad_tpu.models.neurad import LossSettings, SamplingSettings
from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig

TINY_MODEL = dict(
    loss=LossSettings(vgg_mult=0.0),  # VGG exercised by test_vgg_loss_fires; off here for CPU speed
    sampling=SamplingSettings(num_proposal_samples=(12, 8), num_nerf_samples=6, sky_distance=1000.0),
    field_static=StaticSettings(num_levels=4, base_res=16, max_res=256, log2_hashmap_size=13, hashgrid_dim=4),
    field_actor=ActorSettings(num_levels=2, base_res=16, max_res=64, log2_hashmap_size=11, hashgrid_dim=4),
    proposal_static=(
        StaticSettings(num_levels=2, base_res=16, max_res=128, log2_hashmap_size=11, hashgrid_dim=1),
        StaticSettings(num_levels=2, base_res=16, max_res=128, log2_hashmap_size=11, hashgrid_dim=1),
    ),
    proposal_actor=ActorSettings(num_levels=2, base_res=16, max_res=64, log2_hashmap_size=9, hashgrid_dim=1),
    appearance_dim=4,
    max_actors_per_ray=1,
)


@pytest.fixture(scope="module")
def pipeline():
    parser = SyntheticDataParserConfig(num_frames=6, image_height=36, image_width=48).setup()
    outputs = parser.get_dataparser_outputs()
    config = ADPipelineConfig(
        datamanager=ADDataManagerConfig(num_cam_patches=4, patch_size=6, num_lidar_rays=256),
        model_overrides=TINY_MODEL,
        optimizer_groups={
            "fields": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
            "hashgrids": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
            "cnn": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
            "trajectory_opt": OptimizerGroupConfig(lr=1e-4, warmup_steps=0),
            "camera_opt": OptimizerGroupConfig(lr=1e-4, warmup_steps=0),
        },
        eval_chunk=2048,
        train_ray_chunk=128,  # exercise the chunked-NFF train path
    )
    return ADPipeline(outputs, config)


def test_train_loss_decreases(pipeline):
    state, tx = pipeline.init_state()
    step = pipeline.make_train_step(tx)
    losses = []
    for i in range(60):
        bundle, batch = pipeline.datamanager.next_train()
        state, metrics = step(state, bundle, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.9, f"loss did not decrease: {first} -> {last}"
    # stash for the eval test
    pipeline._test_state = state


def test_eval_renders(pipeline):
    state = getattr(pipeline, "_test_state", None)
    if state is None:
        state, _ = pipeline.init_state()
    metrics = pipeline.eval_metrics(state)
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])
    assert "depth_median_l2" in metrics and np.isfinite(metrics["depth_median_l2"])
    pred, gt = pipeline.render_eval_camera(state, pipeline.outputs.eval_camera_indices[0])
    assert pred.shape == gt.shape


def test_eval_metrics_full_suite(pipeline):
    """eval_metrics emits the reference metric dictionary keys
    (`neurad.py:584-620`): camera PSNR/SSIM/LPIPS (+actor-coverage-weighted),
    lidar depth/intensity/ray-drop/chamfer."""
    state, _ = pipeline.init_state(jax.random.PRNGKey(1))
    m = pipeline.eval_metrics(state)
    for k in ("psnr", "ssim", "lpips", "depth_median_l2", "depth_mean_rel_l2",
              "intensity_rmse", "ray_drop_accuracy", "chamfer_distance"):
        assert k in m, f"missing eval metric {k}"
        assert np.isfinite(m[k]), f"non-finite {k}"
    # synthetic scene has actors -> coverage metrics must appear
    assert "actor_coverage" in m and 0.0 < m["actor_coverage"] <= 1.0
    assert "actor_psnr" in m


def test_actor_edit_changes_nff(pipeline):
    """ActorEdits must flow through the full model: with samples inside the
    (shifted) actor box, the NFF output changes. Uses hand-aimed rays through
    the actor so the test needs no trained proposal network."""
    from neurad_tpu.core.structs import RayBundle
    from neurad_tpu.model_components.dynamic_actors import ActorEdits
    from neurad_tpu.models.neurad import NeuRADModel

    state, _ = pipeline.init_state(jax.random.PRNGKey(2))
    # rays from the ego position straight through the actor at t=5 (x=23,y=2,z=1)
    n = 8
    origins = jnp.broadcast_to(jnp.array([10.0, 0.0, 1.6]), (n, 3))
    target = jnp.array([23.0, 2.0, 1.0])
    dirs = jnp.broadcast_to((target - origins[0]) / jnp.linalg.norm(target - origins[0]), (n, 3))
    bundle = RayBundle(
        origins=origins,
        directions=dirs,
        pixel_area=jnp.full((n, 1), 1e-5),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        times=jnp.full((n, 1), 5.0),
        nears=jnp.full((n, 1), 11.0),
        fars=jnp.full((n, 1), 16.0),  # bracket the actor box along the ray
        metadata={"directions_norm": jnp.full((n, 1), 13.2), "is_lidar": jnp.zeros((n, 1), bool),
                  "sensor_idxs": jnp.zeros((n, 1), jnp.int32)},
    )
    o1 = pipeline.model.apply(state.params, bundle, n, False, None, edits=None,
                              method=NeuRADModel.get_nff_outputs)
    o2 = pipeline.model.apply(state.params, bundle, n, False, None, edits=ActorEdits(lateral=4.0),
                              method=NeuRADModel.get_nff_outputs)
    diff = float(jnp.abs(o1["features"] - o2["features"]).max())
    assert diff > 1e-7, f"actor edit had no effect on the NFF (diff={diff})"


def test_viewer_render_paths(pipeline):
    """Viewer render: traced edit values (no recompile per slider move) and the
    virtual-lidar point cloud path (`render_state_machine.py:361-451`)."""
    state, _ = pipeline.init_state(jax.random.PRNGKey(3))
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:3, 3] = [5.0, 0.0, 2.0]

    img0 = pipeline.render_viewer_image(state.params, c2w, 48, 32, time=1.0)
    # the CNN decoder upsamples by rgb_upsample_factor (3): features at the
    # requested res decode to a 3x sharper frame
    assert img0.shape == (96, 144, 3) and np.isfinite(img0).all()
    # same jit with different edit values: must not retrace (cache size stays 1)
    img1 = pipeline.render_viewer_image(state.params, c2w, 48, 32, time=1.0,
                                        edits_vec=[3.0, 0.0, 0.5, 0.0])
    assert len(pipeline._viewer_applies) == 1
    assert img1.shape == img0.shape

    pts = pipeline.render_virtual_lidar(state.params, np.array([5.0, 0.0, 2.0]), time=1.0,
                                        channels=8, azim_res_deg=20.0, drop_threshold=1.0)
    assert pts.ndim == 2 and pts.shape[1] == 4
    assert pts.shape[0] > 0


def test_field_mesh_export(pipeline, tmp_path):
    """field-mesh export: SDF grid query + marching tetrahedra produce a
    non-degenerate watertight-ish surface even from an untrained field
    (counterpart of the reference's ExportMarchingCubesMesh)."""
    from neurad_tpu.models.neurad import NeuRADModel
    from neurad_tpu.scripts.export import export_field_mesh

    state, _ = pipeline.init_state(jax.random.PRNGKey(5))
    # direct query API
    pts = jnp.array([[5.0, 0.0, 1.0], [20.0, 2.0, 1.0]])
    sdf = pipeline.model.apply(state.params, pts, 1.0, method=NeuRADModel.query_geometry)
    assert sdf.shape == (2,) and np.isfinite(np.asarray(sdf)).all()

    out = tmp_path / "mesh.ply"
    nv, nf = export_field_mesh(pipeline, state, out, resolution=24, time=1.0, chunk=4096)
    assert out.exists()
    # untrained SDF still has a zero crossing somewhere in the box
    assert nv > 0 and nf > 0


def test_poisson_mesh_export(pipeline, tmp_path):
    """poisson export end-to-end: depth render -> oriented points -> FFT
    indicator solve -> mesh (counterpart of ExportPoissonMesh; geometric
    accuracy is covered by tests/exporter/test_poisson.py)."""
    from neurad_tpu.scripts.export import export_poisson_mesh

    state, _ = pipeline.init_state(jax.random.PRNGKey(6))
    out = tmp_path / "poisson.ply"
    nv, nf = export_poisson_mesh(pipeline, state, out, resolution=32, num_points=20000)
    assert out.exists()
    assert nv >= 0 and nf >= 0  # untrained depth may produce a sparse surface
