"""Splatfacto training pipeline: camera-only 3DGS with Default-strategy
densification (grow/split/prune) at fixed capacity.

TPU-native counterpart of the reference's splatfacto training
(`nerfstudio/models/splatfacto.py:150-760` + gsplat `DefaultStrategy`): the
reference reallocates parameter tensors every refine; here the gaussian arrays
are allocated once at `capacity` and dead slots are encoded in-band
(`model_components/strategy.py` ADDefaultStrategy section), so every train step
compiles once. The absgrad densification signal comes from a zeros-valued
`means2d_offset` argument whose gradient equals d(loss)/d(means2d).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurad_tpu.data.dataparsers.base import ADDataparserOutputs
from neurad_tpu.engine.trainer import TrainState
from neurad_tpu.model_components import losses as L
from neurad_tpu.model_components.strategy import (
    DEAD_OPACITY,
    DEAD_SCALE,
    DefaultStrategyConfig,
    alive_mask,
    default_refine,
    reset_opacities,
    should_refine_default,
)
from neurad_tpu.models.splatfacto import SplatfactoConfig, SplatfactoModel, random_init_gaussians


@dataclasses.dataclass
class SplatfactoPipelineConfig:
    model: SplatfactoConfig = dataclasses.field(default_factory=SplatfactoConfig)
    strategy: DefaultStrategyConfig = dataclasses.field(default_factory=DefaultStrategyConfig)
    capacity: int = 100_000
    num_init: int = 30_000
    seed: int = 0
    # per-group lrs (reference `splatfacto.py` optimizer table)
    lr_means: float = 1.6e-4
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 1.25e-4
    lr_opacities: float = 5e-2


def _pad_dead(params: Dict[str, np.ndarray], capacity: int) -> Dict[str, np.ndarray]:
    """Grow arrays to `capacity`, marking the padding as dead slots."""
    n = params["means"].shape[0]
    pad = capacity - n
    if pad <= 0:
        return params
    out = {}
    for k, v in params.items():
        fill = np.zeros((pad,) + v.shape[1:], v.dtype)
        if k == "scales":
            fill[:] = DEAD_SCALE
        elif k == "opacities":
            fill[:] = DEAD_OPACITY
        elif k == "quats":
            fill[:, 0] = 1.0
        out[k] = np.concatenate([v, fill], axis=0)
    return out


class SplatfactoPipeline:
    """Camera-only splatting over a parsed dataset's train cameras."""

    def __init__(self, outputs: ADDataparserOutputs, config: Optional[SplatfactoPipelineConfig] = None):
        self.config = config or SplatfactoPipelineConfig()
        self.outputs = outputs
        cfg = self.config

        extent = float(np.abs(np.asarray(outputs.scene_box.aabb)).max())
        self.scene_scale = extent
        init = random_init_gaussians(
            cfg.num_init, extent=extent, seed=cfg.seed, sh_degree=cfg.model.sh_degree
        )
        init = _pad_dead(init, cfg.capacity)
        self.model = SplatfactoModel(init_params=init, config=cfg.model)

        ev = set(outputs.eval_camera_indices)
        self.train_indices = [i for i in range(len(outputs.images)) if i not in ev] or [0]
        self._order = np.random.default_rng(cfg.seed)
        self._step_count = 0
        n = cfg.capacity
        self._grad2d_sum = jnp.zeros(n)
        self._count = jnp.zeros(n, jnp.int32)

    # ------------------------------------------------------------------

    def _camera(self, idx: int):
        cams = self.outputs.cameras
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3] = np.asarray(cams.camera_to_worlds[idx])
        fx, fy, cx, cy = (
            float(np.asarray(getattr(cams, k)[idx]).reshape(-1)[0]) for k in ("fx", "fy", "cx", "cy")
        )
        K = np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=np.float32)
        img = np.asarray(self.outputs.images[idx], dtype=np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        return jnp.asarray(c2w), jnp.asarray(K), jnp.asarray(img)

    def rng_state(self) -> dict:
        """Host sampler state for bit-exact resume (rides the checkpoint as
        host_state_{step}.json; `_step_count` drives the downscale schedule
        and refine cadence, so it must resume too)."""
        return {"rng": self._order.bit_generator.state, "step_count": self._step_count}

    def set_rng_state(self, state: dict) -> None:
        self._order.bit_generator.state = state["rng"]
        self._step_count = int(state["step_count"])

    def init_state(self, rng: Optional[jax.Array] = None) -> Tuple[TrainState, object]:
        cfg = self.config
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        rng, init_rng, state_rng = jax.random.split(rng, 3)
        c2w, K, img = self._camera(self.train_indices[0])
        h, w = img.shape[:2]
        params = jax.jit(
            lambda r: self.model.init(r, c2w, K, w, h), static_argnums=()
        )(init_rng)

        lrs = {
            "means": cfg.lr_means * self.scene_scale,
            "scales": cfg.lr_scales,
            "quats": cfg.lr_quats,
            "sh_dc": cfg.lr_sh_dc,
            "sh_rest": cfg.lr_sh_rest,
            "opacities": cfg.lr_opacities,
        }
        tx = optax.multi_transform(
            {k: optax.adam(lr, eps=1e-15) for k, lr in lrs.items()},
            param_labels={"params": {k: k for k in lrs}},
        )
        opt_state = tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, rng=state_rng)
        self.tx = tx
        self._steps: Dict[Tuple[int, int], object] = {}
        return state, tx

    def _make_step(self, h: int, w: int):
        model, tx = self.model, self.tx
        n = self.config.capacity

        def loss_fn(params, offset, c2w, K, img):
            out = model.apply(params, c2w, K, w, h, means2d_offset=offset, method=SplatfactoModel.render)
            total, metrics = model.apply(params, out, img, method=SplatfactoModel.loss)
            return total, (metrics, out["radii"])

        def step(state: TrainState, c2w, K, img):
            rng, _ = jax.random.split(state.rng)
            offset = jnp.zeros((n, 2))
            (loss, (metrics, radii)), (grads, g_off) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, offset, c2w, K, img)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["total_loss"] = loss
            # absgrad stats, gsplat _update_state: pixel-space grads scaled by
            # half the image dims, counted where the gaussian was visible
            g2d = jnp.linalg.norm(g_off * jnp.array([w / 2.0, h / 2.0]), axis=-1)
            visible = radii > 0
            aux = (jnp.where(visible, g2d, 0.0), visible.astype(jnp.int32))
            return state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng), metrics, aux

        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, state: TrainState, cam_idx: Optional[int] = None) -> Tuple[TrainState, Dict]:
        cfg = self.config
        if cam_idx is None:
            cam_idx = self.train_indices[int(self._order.integers(len(self.train_indices)))]
        c2w, K, img = self._camera(cam_idx)
        h, w = img.shape[:2]
        if (h, w) not in self._steps:
            self._steps[(h, w)] = self._make_step(h, w)
        state, metrics, (g2d, vis) = self._steps[(h, w)](state, c2w, K, img)
        self._grad2d_sum = self._grad2d_sum + g2d
        self._count = self._count + vis

        step = int(state.step)
        if should_refine_default(step, cfg.strategy):
            state = self._refine(state)
        if step % cfg.strategy.reset_every == 0 and 0 < step < cfg.strategy.refine_stop_iter:
            p = reset_opacities(dict(state.params["params"]), cfg.strategy)
            state = state.replace(params={**state.params, "params": p})
        return state, metrics

    def _make_step_batched(self, h: int, w: int):
        """Leading-sample-axis variant of _make_step: per-sample losses averaged
        (DDP semantics, reference `base_pipeline.py:306`); absgrad stats summed
        over the batch with the 1/n of the mean undone."""
        model, tx = self.model, self.tx
        n_gauss = self.config.capacity

        def step(state: TrainState, c2w, K, img):
            n = img.shape[0]

            def loss_fn(params, offsets):
                def one(c2w_i, K_i, img_i, off_i):
                    out = model.apply(params, c2w_i, K_i, w, h, means2d_offset=off_i, method=SplatfactoModel.render)
                    total, metrics = model.apply(params, out, img_i, method=SplatfactoModel.loss)
                    return total, (metrics, out["radii"])

                totals, (metrics, radii) = jax.vmap(one)(c2w, K, img, offsets)
                return totals.mean(), (metrics, radii)

            rng, _ = jax.random.split(state.rng)
            offsets = jnp.zeros((n, n_gauss, 2))
            (loss, (metrics, radii)), (grads, g_off) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, offsets)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {k: jnp.mean(v) for k, v in metrics.items()}
            metrics["total_loss"] = loss
            g2d = jnp.linalg.norm(g_off * (n * jnp.array([w / 2.0, h / 2.0])), axis=-1)
            visible = radii > 0
            aux = (
                jnp.sum(jnp.where(visible, g2d, 0.0), axis=0),
                jnp.sum(visible.astype(jnp.int32), axis=0),
            )
            return state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng), metrics, aux

        return jax.jit(step, donate_argnums=(0,))

    def make_sharded_train_step(self, mesh):
        """train_step_sharded(state): one camera per device over `mesh`."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from neurad_tpu.parallel.sharding import shard_batch

        repl = NamedSharding(mesh, P())
        steps: Dict[Tuple[int, int], object] = {}
        n_dev = mesh.devices.size

        def run(state: TrainState):
            cfg = self.config
            first = self.train_indices[int(self._order.integers(len(self.train_indices)))]
            c2w0, K0, img0 = self._camera(first)
            h, w = img0.shape[:2]
            pool = [i for i in self.train_indices if self.outputs.images[i].shape[:2] == (h, w)]
            idxs = [first] + [
                self.train_indices[int(self._order.integers(len(self.train_indices)))]
                for _ in range(n_dev - 1)
            ]
            idxs = [i if self.outputs.images[i].shape[:2] == (h, w) else pool[0] for i in idxs]
            cams = [self._camera(i) for i in idxs]
            batch = dict(
                c2w=np.stack([c[0] for c in cams]),
                K=np.stack([c[1] for c in cams]),
                img=np.stack([c[2] for c in cams]),
            )
            state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
            batch = shard_batch(mesh, batch)
            if (h, w) not in steps:
                steps[(h, w)] = self._make_step_batched(h, w)
            state, metrics, (g2d, vis) = steps[(h, w)](state, batch["c2w"], batch["K"], batch["img"])
            self._grad2d_sum = self._grad2d_sum + g2d
            self._count = self._count + vis

            step = int(state.step)
            if should_refine_default(step, cfg.strategy):
                state = self._refine(state)
            if step % cfg.strategy.reset_every == 0 and 0 < step < cfg.strategy.refine_stop_iter:
                p = reset_opacities(dict(state.params["params"]), cfg.strategy)
                state = state.replace(params={**state.params, "params": p})
            return state, metrics

        return run

    def _refine(self, state: TrainState) -> TrainState:
        cfg = self.config
        rng, r = jax.random.split(state.rng)
        p = dict(state.params["params"])
        gauss = {k: p[k] for k in ("means", "scales", "quats", "opacities", "sh_dc", "sh_rest")}
        gauss["id"] = jnp.full((cfg.capacity,), 10**6, jnp.int32)  # all static
        grad_avg = self._grad2d_sum / jnp.clip(self._count.astype(jnp.float32), 1.0, None)
        new_gauss, _ = default_refine(
            r, gauss, grad_avg, cfg.strategy, self.scene_scale, step=int(state.step)
        )
        new_gauss.pop("id")
        p.update(new_gauss)
        self._grad2d_sum = jnp.zeros_like(self._grad2d_sum)
        self._count = jnp.zeros_like(self._count)
        return state.replace(params={**state.params, "params": p}, rng=rng)

    # ------------------------------------------------------------------

    def num_alive(self, state: TrainState) -> int:
        return int(alive_mask(state.params["params"]).sum())

    def eval_psnr(self, state: TrainState) -> float:
        vals = []
        for ci in self.outputs.eval_camera_indices:
            c2w, K, img = self._camera(ci)
            h, w = img.shape[:2]
            out = self.model.apply(state.params, c2w, K, w, h, method=SplatfactoModel.render)
            vals.append(float(L.psnr(out["rgb"], img)))
        return float(np.mean(vals)) if vals else float("nan")

    def render_eval_camera(self, state: TrainState, cam_idx: int, edits=None):
        """(pred rgb, gt rgb) — same contract as the other pipelines, so
        nt-render works on splatfacto runs (edits ignored: static scene)."""
        c2w, K, img = self._camera(cam_idx)
        out = self.model.apply(
            state.params, c2w, K, img.shape[1], img.shape[0], method=SplatfactoModel.render
        )
        return np.asarray(out["rgb"]), np.asarray(img)

    def render_viewer_image(
        self, params, c2w, width: int, height: int, time: float = 0.0, edits_vec=None
    ) -> np.ndarray:
        """Arbitrary-pose viewer render (time/edits ignored: static scene)."""
        if not hasattr(self, "_viewer_applies"):
            self._viewer_applies = {}
        key = (width, height)
        if key not in self._viewer_applies:

            @jax.jit
            def fn(params, c2w):
                focal = 0.7 * width
                K = jnp.array([[focal, 0.0, width / 2.0], [0.0, focal, height / 2.0], [0.0, 0.0, 1.0]])
                return self.model.apply(
                    params, c2w[:3], K, width, height, method=SplatfactoModel.render
                )["rgb"]

            self._viewer_applies[key] = fn
        return np.asarray(self._viewer_applies[key](params, jnp.asarray(c2w, jnp.float32)))

    def eval_metrics(self, state: TrainState) -> Dict[str, float]:
        """Same entry nt-eval uses for every pipeline family."""
        psnrs, ssims = [], []
        for ci in self.outputs.eval_camera_indices:
            c2w, K, img = self._camera(ci)
            h, w = img.shape[:2]
            out = self.model.apply(state.params, c2w, K, w, h, method=SplatfactoModel.render)
            psnrs.append(float(L.psnr(out["rgb"], img)))
            ssims.append(float(L.ssim(out["rgb"], img)))
        if not psnrs:
            return {"num_gaussians": float(self.num_alive(state))}
        return {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "num_gaussians": float(self.num_alive(state)),
        }
