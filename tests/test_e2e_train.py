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
