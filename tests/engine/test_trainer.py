"""Trainer loop + Orbax checkpoint save/load tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurad_tpu.engine.trainer import Trainer, TrainerConfig, TrainState, make_train_step


def _setup(tmp_dir=None):
    def loss_fn(params, bundle, batch, rng):
        pred = bundle @ params["w"]
        loss = jnp.mean((pred - batch) ** 2)
        return loss, {"mse": loss}

    tx = optax.adam(1e-1)
    params = {"w": jnp.ones((3, 1))}
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), rng=jax.random.PRNGKey(0)
    )
    step = make_train_step(loss_fn, tx, donate=False)

    rng = np.random.default_rng(0)
    w_true = np.array([[2.0], [-1.0], [0.5]])

    def batches():
        while True:
            x = rng.normal(size=(16, 3)).astype(np.float32)
            yield jnp.asarray(x), jnp.asarray(x @ w_true)

    return step, state, batches()


def test_train_step_reduces_loss():
    step, state, batches = _setup()
    losses = []
    for _ in range(50):
        b, y = next(batches)
        state, metrics = step(state, b, y)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0] * 0.1
    assert int(state.step) == 50


def test_trainer_loop_and_checkpoint(tmp_path):
    step, state, batches = _setup()
    cfg = TrainerConfig(
        max_num_iterations=20, steps_per_eval_batch=10**9, steps_per_save=10,
        steps_per_log=5, checkpoint_dir=str(tmp_path / "ckpts"),
    )
    trainer = Trainer(step, state, batches, cfg)
    metrics = trainer.train()
    assert "total_loss" in metrics and "train_rays_per_sec" in metrics
    saved_w = np.asarray(trainer.state.params["w"])

    # restore into a fresh trainer
    step2, state2, batches2 = _setup()
    trainer2 = Trainer(step2, state2, batches2, cfg)
    trainer2.load_checkpoint()
    np.testing.assert_allclose(np.asarray(trainer2.state.params["w"]), saved_w, atol=1e-6)
    assert int(trainer2.state.step) == 20
