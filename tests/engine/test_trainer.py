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


def test_metric_tracker_semantics():
    """MetricTracker (`trainer.py:71-103`): degradation with margin."""
    from neurad_tpu.engine.trainer import MetricTracker, MetricTrackerConfig

    t = MetricTracker(MetricTrackerConfig(metric="psnr", higher_is_better=True, margin=0.1))
    t.update({"psnr": 20.0})
    assert not t.did_degrade()
    t.update({"psnr": 19.0})  # within 10% margin of best=20
    assert not t.did_degrade()
    t.update({"psnr": 15.0})  # below 18.0 margin line
    assert t.did_degrade()
    t.update({"psnr": 25.0})  # new best
    assert not t.did_degrade()

    # lower-is-better
    t2 = MetricTracker(MetricTrackerConfig(metric="loss", higher_is_better=False, margin=0.1))
    t2.update({"loss": 1.0})
    t2.update({"loss": 1.05})
    assert not t2.did_degrade()
    t2.update({"loss": 1.5})
    assert t2.did_degrade()


def test_per_group_gradient_accumulation():
    """camera_opt-style groups update every k steps with accumulated grads
    (`trainer.py:143,536-582`)."""
    import jax
    import jax.numpy as jnp

    from neurad_tpu.engine.optimizers import OptimizerGroupConfig, build_optimizer

    params = {"params": {"fields": {"w": jnp.ones(3)}, "camera_opt": {"w": jnp.ones(2)}}}
    tx, st = build_optimizer(
        params,
        {"fields": OptimizerGroupConfig(warmup_steps=0), "camera_opt": OptimizerGroupConfig(warmup_steps=0, accum_steps=3)},
        rules=(("camera_opt", "camera_opt"),),
    )
    g = jax.tree.map(jnp.ones_like, params)
    cam_updates = []
    for _ in range(3):
        up, st = tx.update(g, st, params)
        cam_updates.append(float(jnp.abs(up["params"]["camera_opt"]["w"]).sum()))
        assert float(jnp.abs(up["params"]["fields"]["w"]).sum()) > 0  # every step
    assert cam_updates[0] == 0.0 and cam_updates[1] == 0.0 and cam_updates[2] > 0.0


def test_early_stopping_and_gated_checkpoints(tmp_path):
    """Trainer stops after patience degraded evals; checkpoints skip on
    degradation (`trainer.py:349-356`)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from neurad_tpu.engine.trainer import (
        MetricTrackerConfig,
        Trainer,
        TrainerConfig,
        TrainState,
        make_train_step,
    )
    import optax

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones(2)}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=jax.random.PRNGKey(0))
    step = make_train_step(lambda p, b, batch, rng: (jnp.sum(p["w"] ** 2), {}), tx, donate=False)

    evals = itertools.chain([{"psnr": 20.0}], itertools.repeat({"psnr": 5.0}))
    cfg = TrainerConfig(
        max_num_iterations=100, steps_per_eval_batch=5, steps_per_save=10**9,
        steps_per_log=50,
        early_stopping_tracker=MetricTrackerConfig(metric="psnr", margin=0.1),
        early_stop_patience=2,
    )
    batches = itertools.repeat((jnp.zeros((4, 3)), {}))
    tr = Trainer(step, state, batches, cfg, eval_fn=lambda s: next(evals))
    metrics = tr.train()
    # evals at 5 (20.0), 10 (5.0, degraded#1), 15 (5.0, degraded#2) -> stop
    assert metrics.get("early_stopped_at") == 15.0


def test_checkpoint_roundtrip_with_rng_and_host_state(tmp_path):
    """save/load restores params, opt_state, device rng AND the datamanager's
    host sampler state -> bit-exact resume (`trainer.py:456-533`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from neurad_tpu.engine.trainer import Trainer, TrainerConfig, TrainState, make_train_step

    class FakeDM:
        def __init__(self):
            self._rng = np.random.default_rng(7)

        def rng_state(self):
            return self._rng.bit_generator.state

        def set_rng_state(self, state):
            self._rng.bit_generator.state = state

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones(2)}
    state = TrainState(step=jnp.asarray(3, jnp.int32), params={"w": jnp.full(2, 2.5)},
                       opt_state=tx.init(params), rng=jax.random.PRNGKey(42))
    step = make_train_step(lambda p, b, batch, rng: (jnp.sum(p["w"] ** 2), {}), tx, donate=False)
    cfg = TrainerConfig(checkpoint_dir=str(tmp_path / "ckpt"))
    tr = Trainer(step, state, iter([]), cfg)
    dm = FakeDM()
    dm._rng.integers(0, 100, size=13)  # advance the host sampler
    tr.datamanager = dm
    saved_host = dm.rng_state()
    tr.save_checkpoint()

    # fresh trainer with different state restores everything
    state2 = TrainState(step=jnp.zeros((), jnp.int32), params={"w": jnp.zeros(2)},
                        opt_state=tx.init(params), rng=jax.random.PRNGKey(0))
    tr2 = Trainer(step, state2, iter([]), cfg)
    dm2 = FakeDM()
    tr2.datamanager = dm2
    tr2.load_checkpoint()
    np.testing.assert_allclose(np.asarray(tr2.state.params["w"]), 2.5)
    assert int(tr2.state.step) == 3
    np.testing.assert_array_equal(np.asarray(tr2.state.rng), np.asarray(jax.random.PRNGKey(42)))
    assert dm2.rng_state() == saved_host


def test_training_callbacks_locations():
    """BEFORE/AFTER iteration + AFTER_TRAIN hooks fire with the right cadence
    (`engine/callbacks.py:35-76`)."""
    import itertools

    import jax
    import jax.numpy as jnp
    import optax

    from neurad_tpu.engine.callbacks import TrainingCallback, TrainingCallbackLocation
    from neurad_tpu.engine.trainer import Trainer, TrainerConfig, TrainState, make_train_step

    calls = []
    cb_before = TrainingCallback(
        (TrainingCallbackLocation.BEFORE_TRAIN_ITERATION,),
        lambda s, i: calls.append(("b", i)),
        update_every_num_iters=2,
    )
    cb_after = TrainingCallback(
        (TrainingCallbackLocation.AFTER_TRAIN_ITERATION,),
        lambda s, i: calls.append(("a", i)),
        iters=(1, 3),
    )
    cb_end = TrainingCallback(
        (TrainingCallbackLocation.AFTER_TRAIN,), lambda s, i: calls.append(("e", i))
    )

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones(2)}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=jax.random.PRNGKey(0))
    step = make_train_step(lambda p, b, batch, rng: (jnp.sum(p["w"] ** 2), {}), tx, donate=False)
    cfg = TrainerConfig(max_num_iterations=4, steps_per_log=100, steps_per_save=10**9)
    tr = Trainer(step, state, itertools.repeat((jnp.zeros((4, 3)), {})), cfg,
                 callbacks=[cb_before, cb_after, cb_end])
    tr.train()
    assert ("b", 0) in calls and ("b", 2) in calls and ("b", 1) not in calls
    assert ("a", 1) in calls and ("a", 3) in calls and ("a", 0) not in calls
    assert ("e", 4) in calls
