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
class TrainerConfig:
    """Cadences (`engine/trainer.py:104-146`)."""

    max_num_iterations: int = 20001
    steps_per_eval_batch: int = 500
    steps_per_save: int = 2000
    steps_per_log: int = 100
    checkpoint_dir: Optional[str] = None
    keep_last_n_checkpoints: int = 2


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
    ):
        self.train_step = train_step
        self.state = state
        self.batch_iter = batch_iter
        self.config = config or TrainerConfig()
        self.eval_fn = eval_fn
        self.writer = writer
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
        for i in range(n):
            bundle, batch = next(self.batch_iter)
            self.state, metrics = self.train_step(self.state, bundle, batch)
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

            if self.eval_fn is not None and step > 0 and step % cfg.steps_per_eval_batch == 0:
                eval_metrics = self.eval_fn(self.state)
                if self.writer is not None:
                    self.writer.write_scalars(step, {f"eval/{k}": v for k, v in eval_metrics.items()})
                last_metrics.update({f"eval/{k}": v for k, v in eval_metrics.items()})

            if self.checkpointer is not None and step > 0 and step % cfg.steps_per_save == 0:
                self.save_checkpoint()
        if self.checkpointer is not None:
            self.save_checkpoint()
        return last_metrics

    def save_checkpoint(self):
        """Save state (step, params, opt_state) (`trainer.py:499-533`)."""
        import orbax.checkpoint as ocp

        step = int(self.state.step)
        self.checkpointer.save(
            step, args=ocp.args.StandardSave({"params": self.state.params, "opt_state": self.state.opt_state})
        )
        self.checkpointer.wait_until_finished()

    def load_checkpoint(self, step: Optional[int] = None):
        """Restore params/opt_state (`trainer.py:456-497`)."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.checkpointer.latest_step()
        restored = self.checkpointer.restore(
            step,
            args=ocp.args.StandardRestore({"params": self.state.params, "opt_state": self.state.opt_state}),
        )
        self.state = self.state.replace(
            step=jnp.asarray(step), params=restored["params"], opt_state=restored["opt_state"]
        )
