"""Trainer: pure jit'd train step, eval cadence, Orbax checkpointing.

TPU-native counterpart of `nerfstudio/engine/trainer.py` (Trainer 147, train 284,
train_iteration 536, save/load 456-533). The reference mutates module state with
autocast + GradScaler; here the step is a pure function (params, opt_state, rng)
-> (params', opt_state', metrics) compiled once by XLA — mixed precision is
bf16-by-default inside matmuls (no loss scaling needed on TPU), and multi-chip
data parallelism is jit-sharding the ray batch (see parallel/).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from neurad_tpu.core.structs import RayBundle


class TrainState(struct.PyTreeNode):
    """Pure training state (replaces Trainer's mutable members, `trainer.py:147-283`)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass
class MetricTrackerConfig:
    """Degradation tracking for checkpoint gating / early stopping
    (`engine/trainer.py:54-103` MetricTracker)."""

    metric: Optional[str] = None  # eval metric name; None disables tracking
    higher_is_better: bool = True
    margin: float = 0.1  # tolerance vs best (0.1 = 10%); <0 disables


class MetricTracker:
    """Tracks an eval metric to detect degradation (`trainer.py:71-103`)."""

    def __init__(self, config: MetricTrackerConfig):
        self.config = config
        self.best: Optional[float] = None
        self.latest: Optional[float] = None

    def update(self, metrics: Dict[str, float]) -> None:
        self.latest = metrics.get(self.config.metric) if self.config.metric else None
        if self.latest is None:
            return
        if self.best is None or self._is_new_better(self.best, self.latest):
            self.best = self.latest

    def did_degrade(self, fallback: bool = False) -> bool:
        if self.latest is None or self.best is None or self.config.margin < 0:
            return fallback
        sign = -1.0 if self.config.higher_is_better else 1.0
        best = self.best * (1 + sign * self.config.margin)
        return not self._is_new_better(best, self.latest)

    def _is_new_better(self, old: float, new: float) -> bool:
        return new >= old if self.config.higher_is_better else new <= old


@dataclasses.dataclass
class TrainerConfig:
    """Cadences (`engine/trainer.py:104-146`)."""

    max_num_iterations: int = 20001
    steps_per_eval_batch: int = 500
    steps_per_save: int = 2000
    steps_per_log: int = 100
    checkpoint_dir: Optional[str] = None
    keep_last_n_checkpoints: int = 2
    # degraded evals skip checkpoint saving (`trainer.py:349-356,499-533`)
    save_only_on_improvement_tracker: MetricTrackerConfig = dataclasses.field(
        default_factory=MetricTrackerConfig
    )
    # stop training after `early_stop_patience` consecutive degraded evals
    # (`trainer.py:352`); 0 disables
    early_stopping_tracker: MetricTrackerConfig = dataclasses.field(
        default_factory=MetricTrackerConfig
    )
    early_stop_patience: int = 0


def make_train_step(
    loss_fn: Callable[[Any, RayBundle, Dict[str, jnp.ndarray], jax.Array], Tuple[jnp.ndarray, Dict]],
    tx: optax.GradientTransformation,
    donate: bool = True,
) -> Callable[[TrainState, RayBundle, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jit'd train step (`trainer.py:536-582` without scaler machinery).

    loss_fn(params, bundle, batch, rng) -> (loss, metrics dict).
    """

    def step(state: TrainState, bundle: RayBundle, batch: Dict[str, jnp.ndarray]):
        rng, step_rng = jax.random.split(state.rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, bundle, batch, step_rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class Trainer:
    """Thin loop around the jit'd step: logging, eval hooks, checkpoints
    (`engine/trainer.py:284-430`)."""

    def __init__(
        self,
        train_step: Callable,
        state: TrainState,
        batch_iter,
        config: Optional[TrainerConfig] = None,
        eval_fn: Optional[Callable[[TrainState], Dict[str, float]]] = None,
        writer=None,
        callbacks=None,
    ):
        self.train_step = train_step
        self.state = state
        self.batch_iter = batch_iter
        self.config = config or TrainerConfig()
        self.eval_fn = eval_fn
        self.writer = writer
        self.callbacks = list(callbacks or [])
        self.save_tracker = MetricTracker(self.config.save_only_on_improvement_tracker)
        self.early_tracker = MetricTracker(self.config.early_stopping_tracker)
        self._degraded_evals = 0
        # optional host-side RNG state capture for bit-exact resume
        self.datamanager = None
        # optional live viewer: per-step pause/throttle gate + stats push
        # (the reference's train-rate control, `viewer.py:58`)
        self.viewer = None
        self.checkpointer = None
        if self.config.checkpoint_dir:
            import orbax.checkpoint as ocp

            self.checkpointer = ocp.CheckpointManager(
                self.config.checkpoint_dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=self.config.keep_last_n_checkpoints),
            )

    def train(self, num_iterations: Optional[int] = None) -> Dict[str, float]:
        """Run the loop; returns last metrics (incl. train rays/s, `trainer.py:320-345`)."""
        cfg = self.config
        n = num_iterations if num_iterations is not None else cfg.max_num_iterations
        last_metrics: Dict[str, float] = {}
        t_window = time.perf_counter()
        rays_done = 0
        from neurad_tpu.engine.callbacks import TrainingCallbackLocation, run_callbacks

        # resume: a restored checkpoint sets state.step, continue from there
        # (reference `trainer.py:298` starts at `self._start_step`)
        for i in range(int(self.state.step), n):
            if self.viewer is not None:
                self.viewer.train_gate()
            if self.callbacks:
                self.state = run_callbacks(
                    self.callbacks, self.state, i, TrainingCallbackLocation.BEFORE_TRAIN_ITERATION
                )
            bundle, batch = next(self.batch_iter)
            self.state, metrics = self.train_step(self.state, bundle, batch)
            if self.callbacks:
                self.state = run_callbacks(
                    self.callbacks, self.state, i, TrainingCallbackLocation.AFTER_TRAIN_ITERATION
                )
            rays_done += bundle.origins.shape[0] if hasattr(bundle, "origins") else bundle.shape[0]
            step = int(i)

            if step % cfg.steps_per_log == 0 or step == n - 1:
                jax.block_until_ready(self.state.params)
                dt = time.perf_counter() - t_window
                last_metrics = {k: float(v) for k, v in metrics.items()}
                last_metrics["train_rays_per_sec"] = rays_done / max(dt, 1e-9)
                t_window = time.perf_counter()
                rays_done = 0
                if self.writer is not None:
                    self.writer.write_scalars(step, last_metrics)
                if self.viewer is not None:
                    rays_per_step = bundle.origins.shape[0] if hasattr(bundle, "origins") else bundle.shape[0]
                    self.viewer.update_train_stats(
                        step,
                        loss=last_metrics.get("total_loss"),
                        steps_per_sec=last_metrics["train_rays_per_sec"] / max(rays_per_step, 1),
                    )

            if self.eval_fn is not None and step > 0 and step % cfg.steps_per_eval_batch == 0:
                eval_metrics = self.eval_fn(self.state)
                if self.writer is not None:
                    self.writer.write_scalars(step, {f"eval/{k}": v for k, v in eval_metrics.items()})
                last_metrics.update({f"eval/{k}": v for k, v in eval_metrics.items()})
                self.save_tracker.update(eval_metrics)
                self.early_tracker.update(eval_metrics)
                if self.early_tracker.did_degrade():
                    self._degraded_evals += 1
                else:
                    self._degraded_evals = 0
                if cfg.early_stop_patience > 0 and self._degraded_evals >= cfg.early_stop_patience:
                    # early stopping (`trainer.py:352`)
                    last_metrics["early_stopped_at"] = float(step)
                    if self.checkpointer is not None:
                        self.save_checkpoint(force=True)
                    return last_metrics

            if self.checkpointer is not None and step > 0 and step % cfg.steps_per_save == 0:
                # degraded evals skip saving (`trainer.py:349-356`)
                if not self.save_tracker.did_degrade(fallback=False):
                    self.save_checkpoint()
        if self.callbacks:
            self.state = run_callbacks(self.callbacks, self.state, n, TrainingCallbackLocation.AFTER_TRAIN)
        if self.checkpointer is not None:
            self.save_checkpoint()
        return last_metrics

    def save_checkpoint(self, force: bool = False):
        """Save state (step, params, opt_state, rng, host sampler state)
        (`trainer.py:499-533`) — device rng + datamanager rng make resume
        bit-exact."""
        import json as _json
        from pathlib import Path as _Path

        import numpy as _np
        import orbax.checkpoint as ocp

        step = int(self.state.step)
        self.checkpointer.save(
            step,
            args=ocp.args.StandardSave(
                {"params": self.state.params, "opt_state": self.state.opt_state, "rng": self.state.rng}
            ),
        )
        self.checkpointer.wait_until_finished()
        if self.config.checkpoint_dir and self.datamanager is not None:
            rng_state = getattr(self.datamanager, "rng_state", lambda: None)()
            if rng_state is not None:
                (_Path(self.config.checkpoint_dir) / f"host_state_{step}.json").write_text(
                    _json.dumps(rng_state, default=int)
                )

    def load_checkpoint(self, step: Optional[int] = None, from_dir: Optional[str] = None):
        """Restore params/opt_state (`trainer.py:456-497`).

        from_dir: load from a DIFFERENT run's checkpoint directory (the
        reference's `--load-dir`, `scripts/train.py` README:186-192); training
        then continues into this run's own checkpoint dir.
        """
        import orbax.checkpoint as ocp

        import json as _json
        from pathlib import Path as _Path

        mngr = self.checkpointer
        if from_dir is not None:
            mngr = ocp.CheckpointManager(str(_Path(from_dir).absolute()))
        step = step if step is not None else mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {from_dir or self.config.checkpoint_dir}")
        tmpl = {"params": self.state.params, "opt_state": self.state.opt_state, "rng": self.state.rng}
        try:
            restored = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
            rng = restored["rng"]
        except Exception:  # older 2-field checkpoints
            tmpl.pop("rng")
            restored = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
            rng = self.state.rng
        self.state = self.state.replace(
            step=jnp.asarray(step), params=restored["params"], opt_state=restored["opt_state"], rng=rng
        )
        host_dir = from_dir or self.config.checkpoint_dir
        if host_dir and self.datamanager is not None:
            host = _Path(host_dir) / f"host_state_{step}.json"
            if host.exists() and hasattr(self.datamanager, "set_rng_state"):
                self.datamanager.set_rng_state(_json.loads(host.read_text()))
