"""End-to-end nerfacto through the AD pipeline on the synthetic scene."""

import numpy as np
import pytest

from neurad_tpu.data.datamanager import ADDataManagerConfig
from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
from neurad_tpu.engine.optimizers import OptimizerGroupConfig
from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig


def test_nerfacto_pipeline_trains():
    parser = SyntheticDataParserConfig(num_frames=4, image_height=24, image_width=36).setup()
    outputs = parser.get_dataparser_outputs()
    config = ADPipelineConfig(
        datamanager=ADDataManagerConfig(num_cam_patches=8, patch_size=4, num_lidar_rays=0,
                                        rgb_upsample_factor=1),
        model="nerfacto",
        model_overrides=dict(num_proposal_samples=(12, 8), num_nerf_samples=8, appearance_embedding_dim=4),
        optimizer_groups={
            "fields": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
            "hashgrids": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
            "camera_opt": OptimizerGroupConfig(lr=1e-4, warmup_steps=0),
            "trajectory_opt": OptimizerGroupConfig(lr=1e-4, warmup_steps=0),
            "cnn": OptimizerGroupConfig(lr=1e-3, warmup_steps=0),
        },
    )
    pipe = ADPipeline(outputs, config)
    state, tx = pipe.init_state()
    step = pipe.make_train_step(tx)
    losses = []
    for _ in range(25):
        bundle, batch = pipe.datamanager.next_train()
        state, metrics = step(state, bundle, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
