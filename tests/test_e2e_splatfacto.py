"""End-to-end splatfacto: random init -> camera train steps -> Default-strategy
densification (grow/prune) -> loss decreases. The reference's splatfacto trains
with gsplat DefaultStrategy (`nerfstudio/models/splatfacto.py:150-760`)."""

import jax
import numpy as np
import pytest

from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
from neurad_tpu.model_components.strategy import DefaultStrategyConfig
from neurad_tpu.pipelines.splatfacto_pipeline import SplatfactoPipeline, SplatfactoPipelineConfig


@pytest.fixture(scope="module")
def pipeline():
    parser = SyntheticDataParserConfig(num_frames=6, image_height=48, image_width=64).setup()
    outputs = parser.get_dataparser_outputs()
    config = SplatfactoPipelineConfig(
        capacity=4096,
        num_init=1024,
        strategy=DefaultStrategyConfig(
            refine_start_iter=4,
            refine_stop_iter=100,
            refine_every=8,
            reset_every=10_000,
            grow_grad2d=1e-7,  # low threshold so growth triggers on a tiny run
            max_grow_per_refine=512,
        ),
    )
    return SplatfactoPipeline(outputs, config)


def test_splatfacto_trains_and_densifies(pipeline):
    state, _ = pipeline.init_state(jax.random.PRNGKey(0))
    n0 = pipeline.num_alive(state)
    assert n0 == 1024

    losses = []
    for _ in range(30):
        state, metrics = pipeline.train_step(state)
        losses.append(float(metrics["total_loss"]))

    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), f"loss did not decrease: {losses[:3]} -> {losses[-3:]}"
    n1 = pipeline.num_alive(state)
    assert n1 != n0, "densification never changed the gaussian count"
    assert n1 <= 4096
    psnr = pipeline.eval_psnr(state)
    assert np.isfinite(psnr)
