"""Optimizer/scheduler tests (`nerfstudio/engine/{optimizers,schedulers}.py` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurad_tpu.engine.optimizers import (
    NEURAD_OPTIMIZER_GROUPS,
    OptimizerGroupConfig,
    build_optimizer,
    label_params,
)
from neurad_tpu.engine.schedulers import (
    cosine_decay_schedule,
    exponential_decay_schedule,
    multistep_schedule,
)


def test_exponential_decay_schedule():
    s = exponential_decay_schedule(1e-2, 1e-3, max_steps=1000, warmup_steps=100, lr_pre_warmup=1e-8)
    assert float(s(0)) < 1e-6  # pre-warmup
    np.testing.assert_allclose(float(s(100)), 1e-2, rtol=1e-4)  # ramped to lr_init
    np.testing.assert_allclose(float(s(1000)), 1e-3, rtol=1e-4)  # decayed to final
    # monotone decay after warmup
    assert float(s(500)) < float(s(100))


def test_multistep_schedule():
    s = multistep_schedule(1.0, milestones=(10, 20), gamma=0.1)
    np.testing.assert_allclose(float(s(5)), 1.0)
    np.testing.assert_allclose(float(s(15)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(s(25)), 0.01, rtol=1e-5)


def test_cosine_decay_schedule():
    s = cosine_decay_schedule(1.0, warm_up_end=10, learning_rate_alpha=0.05, max_steps=110)
    np.testing.assert_allclose(float(s(5)), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(s(110)), 0.05, rtol=1e-4)


def test_param_group_labels():
    params = {
        "params": {
            "field": {"static_hash_table": jnp.zeros(3), "mlp_geo": {"kernel": jnp.zeros(3)}},
            "actors": {"actor_positions": jnp.zeros(3)},
            "rgb_decoder": {"Conv_0": {"kernel": jnp.zeros(3)}},
            "camera_optimizer": {"pose_adjustment": jnp.zeros(3)},
        }
    }
    labels = label_params(params)
    flat = labels["params"]
    assert flat["field"]["static_hash_table"] == "hashgrids"
    assert flat["field"]["mlp_geo"]["kernel"] == "fields"
    assert flat["actors"]["actor_positions"] == "trajectory_opt"
    assert flat["rgb_decoder"]["Conv_0"]["kernel"] == "cnn"
    assert flat["camera_optimizer"]["pose_adjustment"] == "camera_opt"


def test_build_optimizer_updates_groups_differently():
    params = {
        "static_hash_table": jnp.ones(4),
        "mlp": jnp.ones(4),
    }
    groups = {
        "hashgrids": OptimizerGroupConfig(lr=1e-1, warmup_steps=0),
        "fields": OptimizerGroupConfig(lr=1e-3, warmup_steps=0),
    }
    tx, opt_state = build_optimizer(params, groups)
    grads = {"static_hash_table": jnp.ones(4), "mlp": jnp.ones(4)}
    updates, _ = tx.update(grads, opt_state, params)
    # adam first step = -lr * sign-ish; hashgrid step should be ~100x the fields step
    ratio = float(jnp.abs(updates["static_hash_table"]).mean() / jnp.abs(updates["mlp"]).mean())
    assert ratio > 50
