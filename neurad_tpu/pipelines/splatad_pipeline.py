"""SplatAD pipeline: full-sensor training with MCMC densification.

TPU-native counterpart of `nerfstudio/pipelines/splatad_pipeline.py:63` (+ the
strategy callbacks in `models/splatad.py:732-754`). Two jit'd steps — one per
modality — each compiled once per sensor resolution; the MCMC relocation runs
as a pure params/opt-state update every `refine_every` steps.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurad_tpu.data.dataparsers.base import ADDataparserOutputs
from neurad_tpu.data.full_image_datamanager import (
    CameraSample,
    FullImageLidarDataManager,
    FullImageLidarDataManagerConfig,
    LidarSample,
)
from neurad_tpu.engine.optimizers import OptimizerGroupConfig, build_optimizer
from neurad_tpu.engine.trainer import TrainState
from neurad_tpu.model_components import losses as L
from neurad_tpu.model_components.dynamic_actors import actor_data_from_trajectories, empty_actor_data
from neurad_tpu.model_components.strategy import (
    DefaultStrategyConfig,
    MCMCStrategyConfig,
    default_refine,
    mcmc_add_noise,
    mcmc_relocate,
    reset_opacities,
    should_refine,
    should_refine_default,
)
from neurad_tpu.models.splatad import GaussianInit, SplatADConfig, SplatADModel, seed_gaussians

# Per-group lr presets (`configs/method_configs.py` splatad preset uses separate
# lrs per gaussian attribute; grouped here by param path).
SPLATAD_OPTIMIZER_GROUPS = {
    "means": OptimizerGroupConfig(lr=1.6e-4, lr_final=1.6e-6, max_steps=30000),
    "features": OptimizerGroupConfig(lr=2.5e-3),
    "opacities": OptimizerGroupConfig(lr=5e-2),
    "scales": OptimizerGroupConfig(lr=5e-3),
    "quats": OptimizerGroupConfig(lr=1e-3),
    "fields": OptimizerGroupConfig(lr=1e-3, weight_decay=1e-6),  # decoders/embeddings
    "trajectory_opt": OptimizerGroupConfig(lr=1e-3, lr_final=1e-4, warmup_steps=2500),
    "camera_opt": OptimizerGroupConfig(lr=1e-4, lr_final=1e-5, warmup_steps=2500),
}

SPLATAD_GROUP_RULES = (
    ("means", "means"),
    ("features", "features"),
    ("opacities", "opacities"),
    ("scales", "scales"),
    ("quats", "quats"),
    ("actor_positions", "trajectory_opt"),
    ("actor_rotations_6d", "trajectory_opt"),
    ("actor_vel_", "trajectory_opt"),
    ("pose_adjustment", "camera_opt"),
    ("velocity_adjustment", "camera_opt"),
    ("time_to_center_pixel_adjustment", "camera_opt"),
)


@dataclasses.dataclass
class SplatADPipelineConfig:
    datamanager: FullImageLidarDataManagerConfig = dataclasses.field(
        default_factory=FullImageLidarDataManagerConfig
    )
    model: SplatADConfig = SplatADConfig()
    # densification: "mcmc" (fixed-capacity relocation, the SplatAD paper's
    # choice) or "default" (absgrad grow/split/prune, reference
    # ADDefaultStrategy `strategy.py:18-126`)
    strategy: str = "mcmc"
    mcmc: MCMCStrategyConfig = MCMCStrategyConfig()
    default_strategy: DefaultStrategyConfig = DefaultStrategyConfig()
    cap_max: int = 500_000
    optimizer_groups: dict = dataclasses.field(default_factory=lambda: dict(SPLATAD_OPTIMIZER_GROUPS))
    seed: int = 0


class SplatADPipeline:
    def __init__(self, outputs: ADDataparserOutputs, config: Optional[SplatADPipelineConfig] = None):
        self.config = config or SplatADPipelineConfig()
        self.outputs = outputs
        self.datamanager = FullImageLidarDataManager(outputs, self.config.datamanager, seed=self.config.seed)

        seed_pts = self.datamanager.all_seed_points()
        actor_data = (
            actor_data_from_trajectories(outputs.trajectories) if outputs.trajectories else empty_actor_data()
        )
        init = seed_gaussians(
            seed_pts,
            outputs.trajectories,
            cap_max=self.config.cap_max,
            feature_dim=self.config.model.feature_dim,
            scene_aabb=np.asarray(outputs.scene_box.aabb),
            seed=self.config.seed,
        )
        self.model = SplatADModel(
            init_data=init,
            actor_data=actor_data,
            config=self.config.model,
            mcmc=self.config.mcmc,
            num_sensors=len(outputs.sensor_idx_to_name),
            num_train_images=len(outputs.images),
        )
        self._camera_step = None
        self._lidar_step = None
        # absgrad running stats (Default strategy; camera steps only)
        self._grad2d_sum = None
        self._count = None

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        rng, init_rng, state_rng = jax.random.split(rng, 3)
        # jit'd init: eager flax init is pathological over the remote-TPU tunnel
        params = jax.jit(lambda r: self.model.init(r, method=SplatADModel.init_all))(init_rng)
        self.tx, opt_state = build_optimizer(
            params, self.config.optimizer_groups, rules=SPLATAD_GROUP_RULES
        )
        return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, rng=state_rng)

    # ------------------------------------------------------------------

    def _make_camera_step(self):
        use_absgrad = self.config.strategy == "default"
        n_gauss = self.config.cap_max

        def step(state: TrainState, c2w, K, image, time, sensor_idx, cam_idx, lin_vel, rs_time, t_center):
            h, w = image.shape[0], image.shape[1]

            def loss_fn(p, offset):
                out = self.model.apply(
                    p, c2w, K, w, h, time, sensor_idx, cam_idx,
                    cam_linear_vel=lin_vel,
                    rolling_shutter_time=rs_time,
                    time_to_center_pixel=t_center,
                    train=True,
                    means2d_offset=offset,
                    method=SplatADModel.get_camera_outputs,
                )
                total, metrics = self.model.apply(p, out, image, method=SplatADModel.camera_loss)
                return total, (metrics, out["radii"])

            rng, _ = jax.random.split(state.rng)
            offset = jnp.zeros((n_gauss, 2))
            (loss, (metrics, radii)), (grads, g_off) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, offset)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["total_loss"] = loss
            if use_absgrad:
                # gsplat _update_state: pixel grads scaled by half the image dims
                g2d = jnp.linalg.norm(g_off * jnp.array([w / 2.0, h / 2.0]), axis=-1)
                visible = radii > 0
                aux = (jnp.where(visible, g2d, 0.0), visible.astype(jnp.int32))
            else:
                aux = (jnp.zeros(n_gauss), jnp.zeros(n_gauss, jnp.int32))
            new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng)
            return new_state, metrics, aux

        return jax.jit(step, donate_argnums=(0,), static_argnums=())

    def _make_lidar_step(self):
        def step(state: TrainState, l2w, raster_pts, did_return, valid, time, sensor_idx, lin_vel):
            def loss_fn(p):
                out = self.model.apply(
                    p, l2w, raster_pts, time, sensor_idx,
                    lidar_linear_vel=lin_vel, train=True,
                    method=SplatADModel.get_lidar_outputs,
                )
                return self.model.apply(p, out, raster_pts, did_return, valid, method=SplatADModel.lidar_loss)

            rng, _ = jax.random.split(state.rng)
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["total_loss"] = loss
            return state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng), metrics

        return jax.jit(step, donate_argnums=(0,))

    def _downscale_sample(self, sample: CameraSample, step: int) -> CameraSample:
        """Coarse-to-fine: 2^max(0, num_downscales - step//schedule) image
        downscale (`splatad.py:806-810` _get_downscale_factor)."""
        cfg = self.config.model
        if cfg.num_downscales <= 0 or cfg.resolution_schedule <= 0:
            return sample
        d = 2 ** max(0, cfg.num_downscales - step // cfg.resolution_schedule)
        if d <= 1:
            return sample
        img = sample.image[::d, ::d]
        K = sample.K.copy()
        K[:2] /= d
        return dataclasses.replace(
            sample, image=img, K=K, width=img.shape[1], height=img.shape[0]
        )

    def train_step(self, state: TrainState, sample) -> Tuple[TrainState, Dict]:
        if isinstance(sample, CameraSample):
            sample = self._downscale_sample(sample, int(state.step))
            if self._camera_step is None:
                self._camera_step = self._make_camera_step()
            state, metrics, (g2d, vis) = self._camera_step(
                state,
                jnp.asarray(sample.c2w),
                jnp.asarray(sample.K),
                jnp.asarray(sample.image),
                jnp.asarray(sample.time),
                jnp.asarray(sample.sensor_idx),
                jnp.asarray(sample.cam_idx),
                jnp.asarray(sample.linear_velocity),
                sample.rolling_shutter_time,
                sample.time_to_center_pixel,
            )
            if self.config.strategy == "default":
                if self._grad2d_sum is None:
                    self._grad2d_sum = jnp.zeros_like(g2d)
                    self._count = jnp.zeros_like(vis)
                self._grad2d_sum = self._grad2d_sum + g2d
                self._count = self._count + vis
        else:
            assert isinstance(sample, LidarSample)
            if self._lidar_step is None:
                self._lidar_step = self._make_lidar_step()
            state, metrics = self._lidar_step(
                state,
                jnp.asarray(sample.l2w),
                jnp.asarray(sample.raster_pts),
                jnp.asarray(sample.did_return),
                jnp.asarray(sample.valid),
                jnp.asarray(sample.time),
                jnp.asarray(sample.sensor_idx),
                jnp.asarray(sample.linear_velocity),
            )

        return self._maybe_refine(state), metrics

    def _maybe_refine(self, state: TrainState) -> TrainState:
        """Post-step densify/prune/reset dispatch (shared by the single-sample
        and mesh-sharded train steps)."""
        step = int(state.step)
        if self.config.strategy == "default":
            cfg = self.config.default_strategy
            if should_refine_default(step, cfg):
                state = self._refine_default(state)
            if step % cfg.reset_every == 0 and 0 < step < cfg.refine_stop_iter:
                p = dict(state.params["params"])
                keys = ("means", "scales", "quats", "opacities", "features")
                sub = reset_opacities({k: p[k] for k in keys}, cfg)
                p.update({k: sub[k] for k in keys})
                state = state.replace(params={**state.params, "params": p})
        elif should_refine(step, self.config.mcmc):
            state = self._refine(state)
        return state

    # ------------------------------------------------------------------
    # Data-parallel (mesh-sharded) training: one full camera frame / lidar
    # scan PER DEVICE, per-sample losses averaged — exactly the reference's
    # DDP semantics (each rank its own sample, grads all-reduced;
    # `/root/reference/nerfstudio/pipelines/splatad_pipeline.py:172`,
    # `base_pipeline.py:306`). Params replicated over the mesh, sample axis
    # sharded; XLA turns the mean-loss gradient into a psum over ICI.

    def _make_camera_step_batched(self):
        use_absgrad = self.config.strategy == "default"
        n_gauss = self.config.cap_max

        def step(state: TrainState, c2w, K, image, time, sensor_idx, cam_idx, lin_vel, rs_time, t_center):
            n, h, w = image.shape[0], image.shape[1], image.shape[2]

            def loss_fn(p, offsets):
                def one(c2w_i, K_i, img_i, t_i, s_i, ci_i, lv_i, rs_i, tc_i, off_i):
                    out = self.model.apply(
                        p, c2w_i, K_i, w, h, t_i, s_i, ci_i,
                        cam_linear_vel=lv_i,
                        rolling_shutter_time=rs_i,
                        time_to_center_pixel=tc_i,
                        train=True,
                        means2d_offset=off_i,
                        method=SplatADModel.get_camera_outputs,
                    )
                    total, metrics = self.model.apply(p, out, img_i, method=SplatADModel.camera_loss)
                    return total, (metrics, out["radii"])

                totals, (metrics, radii) = jax.vmap(one)(
                    c2w, K, image, time, sensor_idx, cam_idx, lin_vel, rs_time, t_center, offsets
                )
                return totals.mean(), (metrics, radii)

            rng, _ = jax.random.split(state.rng)
            offsets = jnp.zeros((n, n_gauss, 2))
            (loss, (metrics, radii)), (grads, g_off) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, offsets)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {k: jnp.mean(v) for k, v in metrics.items()}
            metrics["total_loss"] = loss
            if use_absgrad:
                # per-sample pixel grads (undo the 1/n of the mean loss), summed
                # over the batch: one sharded step accumulates the same absgrad
                # statistics as n sequential single-sample steps
                g2d = jnp.linalg.norm(g_off * (n * jnp.array([w / 2.0, h / 2.0])), axis=-1)  # [n, G]
                visible = radii > 0
                aux = (
                    jnp.sum(jnp.where(visible, g2d, 0.0), axis=0),
                    jnp.sum(visible.astype(jnp.int32), axis=0),
                )
            else:
                aux = (jnp.zeros(n_gauss), jnp.zeros(n_gauss, jnp.int32))
            new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng)
            return new_state, metrics, aux

        return jax.jit(step, donate_argnums=(0,))

    def _make_lidar_step_batched(self):
        def step(state: TrainState, l2w, raster_pts, did_return, valid, time, sensor_idx, lin_vel):
            def loss_fn(p):
                def one(l2w_i, rp_i, dr_i, v_i, t_i, s_i, lv_i):
                    out = self.model.apply(
                        p, l2w_i, rp_i, t_i, s_i,
                        lidar_linear_vel=lv_i, train=True,
                        method=SplatADModel.get_lidar_outputs,
                    )
                    return self.model.apply(p, out, rp_i, dr_i, v_i, method=SplatADModel.lidar_loss)

                totals, metrics = jax.vmap(one)(l2w, raster_pts, did_return, valid, time, sensor_idx, lin_vel)
                return totals.mean(), metrics

            rng, _ = jax.random.split(state.rng)
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {k: jnp.mean(v) for k, v in metrics.items()}
            metrics["total_loss"] = loss
            return state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng), metrics

        return jax.jit(step, donate_argnums=(0,))

    def make_sharded_train_step(self, mesh):
        """Returns train_step_sharded(state, samples) for a list of same-type
        samples (one per device). Params/opt-state replicated over `mesh`,
        sample axis sharded; gradient psum inserted by GSPMD."""
        import numpy as _np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from neurad_tpu.parallel.sharding import shard_batch

        repl = NamedSharding(mesh, P())
        cam_step = {"fn": None}
        lid_step = {"fn": None}

        def run(state: TrainState, samples):
            state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
            if isinstance(samples[0], CameraSample):
                samples = [self._downscale_sample(s, int(state.step)) for s in samples]
                batch = dict(
                    c2w=_np.stack([s.c2w for s in samples]),
                    K=_np.stack([s.K for s in samples]),
                    image=_np.stack([s.image for s in samples]),
                    time=_np.asarray([s.time for s in samples], _np.float32),
                    sensor_idx=_np.asarray([s.sensor_idx for s in samples], _np.int32),
                    cam_idx=_np.asarray([s.cam_idx for s in samples], _np.int32),
                    lin_vel=_np.stack([s.linear_velocity for s in samples]).astype(_np.float32),
                    rs_time=_np.asarray([s.rolling_shutter_time for s in samples], _np.float32),
                    t_center=_np.asarray([s.time_to_center_pixel for s in samples], _np.float32),
                )
                batch = shard_batch(mesh, batch)
                if cam_step["fn"] is None:
                    cam_step["fn"] = self._make_camera_step_batched()
                state, metrics, (g2d, vis) = cam_step["fn"](
                    state, batch["c2w"], batch["K"], batch["image"], batch["time"],
                    batch["sensor_idx"], batch["cam_idx"], batch["lin_vel"],
                    batch["rs_time"], batch["t_center"],
                )
                if self.config.strategy == "default":
                    if self._grad2d_sum is None:
                        self._grad2d_sum = jnp.zeros_like(g2d)
                        self._count = jnp.zeros_like(vis)
                    self._grad2d_sum = self._grad2d_sum + g2d
                    self._count = self._count + vis
            else:
                batch = dict(
                    l2w=_np.stack([s.l2w for s in samples]),
                    raster_pts=_np.stack([s.raster_pts for s in samples]),
                    did_return=_np.stack([s.did_return for s in samples]),
                    valid=_np.stack([s.valid for s in samples]),
                    time=_np.asarray([s.time for s in samples], _np.float32),
                    sensor_idx=_np.asarray([s.sensor_idx for s in samples], _np.int32),
                    lin_vel=_np.stack([s.linear_velocity for s in samples]).astype(_np.float32),
                )
                batch = shard_batch(mesh, batch)
                if lid_step["fn"] is None:
                    lid_step["fn"] = self._make_lidar_step_batched()
                state, metrics = lid_step["fn"](
                    state, batch["l2w"], batch["raster_pts"], batch["did_return"],
                    batch["valid"], batch["time"], batch["sensor_idx"], batch["lin_vel"],
                )
            return self._maybe_refine(state), metrics

        return run

    def _refine_default(self, state: TrainState) -> TrainState:
        """absgrad grow/split/prune with actor-aware culling (reference
        ADDefaultStrategy, `strategy.py:18-126`)."""
        cfg = self.config.default_strategy
        rng, r = jax.random.split(state.rng)
        p = dict(state.params["params"])
        gauss_keys = ("means", "scales", "quats", "opacities", "features")
        gauss = {k: p[k] for k in gauss_keys}
        gauss["id"] = self.model.init_data.ids

        n_actors = self.model.actor_data.n_actors
        bounds = None
        if n_actors:
            bounds = jnp.asarray(self.model.actor_data.sizes) / 2.0 + jnp.asarray((0.25, 0.25, 0.1))
        scene_scale = float(np.abs(np.asarray(self.outputs.scene_box.aabb)).max())
        grad_avg = self._grad2d_sum / jnp.clip(self._count.astype(jnp.float32), 1.0, None)
        new_gauss, _ = default_refine(
            r, gauss, grad_avg, cfg, scene_scale, step=int(state.step),
            actor_bounds=bounds, n_actors=n_actors,
        )
        for k in gauss_keys:
            p[k] = new_gauss[k]
        self._grad2d_sum = jnp.zeros_like(self._grad2d_sum)
        self._count = jnp.zeros_like(self._count)
        return state.replace(params={**state.params, "params": p}, rng=rng)

    def _refine(self, state: TrainState) -> TrainState:
        """MCMC relocate + exploration noise (post-backward callback,
        `models/splatad.py:732-754`)."""
        rng, r1, r2 = jax.random.split(state.rng, 3)
        gauss_keys = ("means", "scales", "quats", "opacities", "features")
        p = dict(state.params["params"])
        gauss = {k: p[k] for k in gauss_keys}
        gauss["id"] = self.model.init_data.ids

        actors_bounds = None
        n_actors = self.model.actor_data.n_actors
        if n_actors:
            actors_bounds = jnp.asarray(self.model.actor_data.sizes) / 2.0 + jnp.asarray((0.25, 0.25, 0.1))

        new_gauss, _ = mcmc_relocate(r1, gauss, None, self.config.mcmc, actors_bounds, n_actors)
        lr_means = self.config.optimizer_groups["means"].schedule()(state.step)
        new_gauss = mcmc_add_noise(r2, new_gauss, float(lr_means), self.config.mcmc)
        for k in gauss_keys:
            p[k] = new_gauss[k]
        return state.replace(params={**state.params, "params": p}, rng=rng)

    # ------------------------------------------------------------------
    # viewer rendering (traced edit values: sliders don't recompile) — the
    # SplatAD counterpart of ADPipeline.render_viewer_image/render_virtual_lidar
    # (reference: `viewer/render_state_machine.py` + the splatad RS/actor-edit
    # sliders `splatad.py:466-532`)
    # ------------------------------------------------------------------

    def render_viewer_image(
        self, params, c2w: np.ndarray, width: int, height: int, time: float, edits_vec=None
    ) -> np.ndarray:
        from neurad_tpu.model_components.dynamic_actors import ActorEdits

        if not hasattr(self, "_viewer_applies"):
            self._viewer_applies = {}
        key = (width, height)
        if key not in self._viewer_applies:

            @jax.jit
            def fn(params, c2w, t, ev):
                focal = 0.7 * width
                K = jnp.array([[focal, 0.0, width / 2.0], [0.0, focal, height / 2.0], [0.0, 0.0, 1.0]])
                edits = ActorEdits(lateral=ev[0], longitudinal=ev[1], rotation=ev[2], height=ev[3], index=-1)
                out = self.model.apply(
                    params, c2w[:3], K, width, height, t,
                    jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    # RS-edit slider (reference `splatad.py:466-532`): traced
                    # rolling-shutter duration, costs nothing at 0
                    rolling_shutter_time=ev[4],
                    edits=edits,
                    method=SplatADModel.get_camera_outputs,
                )
                return out["rgb"]

            self._viewer_applies[key] = fn

        ev = jnp.zeros(5) if edits_vec is None else jnp.pad(
            jnp.asarray(edits_vec, jnp.float32), (0, max(0, 5 - len(edits_vec)))
        )
        return np.asarray(
            self._viewer_applies[key](params, jnp.asarray(c2w, jnp.float32), float(time), ev)
        )

    def render_eval_camera(self, state: TrainState, cam_idx: int, edits=None):
        """Full-image render -> (pred rgb, gt rgb); same contract as
        ADPipeline.render_eval_camera so nt-render works on splatad runs."""
        s = self.datamanager._camera_sample(cam_idx)
        out = self.model.apply(
            state.params,
            jnp.asarray(s.c2w), jnp.asarray(s.K), s.width, s.height,
            jnp.asarray(s.time), jnp.asarray(s.sensor_idx), jnp.asarray(s.cam_idx),
            cam_linear_vel=jnp.asarray(s.linear_velocity),
            rolling_shutter_time=s.rolling_shutter_time,
            time_to_center_pixel=s.time_to_center_pixel,
            edits=edits,
            method=SplatADModel.get_camera_outputs,
        )
        return np.asarray(out["rgb"]), s.image

    def render_eval_lidar(self, state: TrainState, scan_idx: int) -> Dict[str, np.ndarray]:
        """Lidar scan render with the same output keys as the ray pipeline's
        (depth/intensity/ray_drop_logits/gt_*/origins/directions)."""
        s = self.datamanager._lidar_sample(scan_idx)
        out = self.model.apply(
            state.params,
            jnp.asarray(s.l2w), jnp.asarray(s.raster_pts), jnp.asarray(s.time),
            jnp.asarray(s.sensor_idx), lidar_linear_vel=jnp.asarray(s.linear_velocity),
            method=SplatADModel.get_lidar_outputs,
        )
        azim = np.deg2rad(s.raster_pts[:, 0])
        elev = np.deg2rad(s.raster_pts[:, 1])
        dirs_l = np.stack(
            [np.cos(elev) * np.cos(azim), np.cos(elev) * np.sin(azim), np.sin(elev)], axis=-1
        )
        l2w = np.asarray(s.l2w)
        dirs = dirs_l @ l2w[:3, :3].T
        origins = np.broadcast_to(l2w[:3, 3], dirs.shape)
        valid = np.asarray(s.valid)
        return {
            "depth": np.asarray(out["depth"]),
            "intensity": np.asarray(out["intensity"]),
            "ray_drop_logits": np.asarray(out["ray_drop_logits"]),
            "gt_distance": s.raster_pts[:, 2:3],
            "gt_intensity": s.raster_pts[:, 4:5],
            "did_return": np.asarray(s.did_return & valid)[:, None],
            "origins": np.asarray(origins),
            "directions": dirs,
        }

    def render_virtual_lidar(
        self, params, origin: np.ndarray, time: float, channels: int = 32,
        azim_res_deg: float = 1.0, fov_up: float = 5.0, fov_down: float = -15.0,
        drop_threshold: float = 0.5, edits_vec=None,
    ) -> np.ndarray:
        """Virtual-lidar point cloud at `origin` via the spherical rasterizer;
        keeps points whose predicted ray-drop prob < threshold. [N, 4]."""
        from neurad_tpu.model_components.dynamic_actors import ActorEdits

        elev = np.linspace(fov_down, fov_up, channels)
        azim = np.arange(-180.0, 180.0, azim_res_deg)
        el, azm = np.meshgrid(elev, azim, indexing="ij")
        pts = np.stack(
            [azm.reshape(-1), el.reshape(-1), np.zeros(el.size), np.zeros(el.size), np.zeros(el.size)],
            axis=-1,
        ).astype(np.float32)
        n = pts.shape[0]

        if not hasattr(self, "_viewer_lidar_applies"):
            self._viewer_lidar_applies = {}
        if n not in self._viewer_lidar_applies:

            @jax.jit
            def fn(params, l2w, raster_pts, t, ev):
                edits = ActorEdits(lateral=ev[0], longitudinal=ev[1], rotation=ev[2], height=ev[3], index=-1)
                out = self.model.apply(
                    params, l2w, raster_pts, t, jnp.zeros((), jnp.int32),
                    edits=edits,
                    method=SplatADModel.get_lidar_outputs,
                )
                return out["depth"], out["intensity"], out["ray_drop_logits"]

            self._viewer_lidar_applies[n] = fn

        ev = jnp.zeros(4) if edits_vec is None else jnp.asarray(edits_vec, jnp.float32)[:4]
        l2w = jnp.eye(4)[:3].at[:, 3].set(jnp.asarray(origin, jnp.float32))
        depth, intensity, drop_logits = self._viewer_lidar_applies[n](
            params, l2w, jnp.asarray(pts), float(time), ev
        )
        depth, intensity = np.asarray(depth), np.asarray(intensity)
        keep = 1.0 / (1.0 + np.exp(-np.asarray(drop_logits)[:, 0])) < drop_threshold
        azim_r, elev_r = np.deg2rad(pts[:, 0]), np.deg2rad(pts[:, 1])
        dirs = np.stack(
            [np.cos(elev_r) * np.cos(azim_r), np.cos(elev_r) * np.sin(azim_r), np.sin(elev_r)], axis=-1
        )
        world = np.asarray(origin)[None] + dirs * depth
        return np.concatenate([world, intensity], axis=-1)[keep]

    def eval_fid_suite(self, state: TrainState, max_images=None) -> Dict[str, float]:
        """Novel-view FID for splat runs: lane shift +-2/3 m, vertical +1 m, and
        actor rot/trans edits — the same suite the ray pipeline runs
        (reference `pipelines/splatad_pipeline.py` shares `ad_pipeline.py`'s
        FID machinery, 172-192/376-502). Splatting renders novel views by
        shifting the camera POSE directly."""
        from neurad_tpu.model_components.dynamic_actors import ActorEdits
        from neurad_tpu.utils.eval_metrics import fid, fid_suite_shifts

        lane_sign = 1
        if self.outputs.metadata and "lane_shift_sign" in self.outputs.metadata:
            lane_sign = int(self.outputs.metadata["lane_shift_sign"])
        cams = list(self.outputs.eval_camera_indices)
        if max_images is not None:
            cams = cams[:max_images]
        if not cams:
            return {}
        real = [np.asarray(self.render_eval_camera(state, ci)[1]) for ci in cams]
        metrics: Dict[str, float] = {}

        if self.model.actor_data.n_actors > 0:
            actor_edits = {
                "rot": (ActorEdits(rotation=0.5), ActorEdits(rotation=-0.5)),
                "trans": (ActorEdits(lateral=2.0), ActorEdits(lateral=-2.0)),
            }
            for name, edit_list in actor_edits.items():
                fakes = []
                for edit in edit_list:
                    for ci in cams:
                        fakes.append(np.asarray(self.render_eval_camera(state, ci, edits=edit)[0]))
                metrics[f"fid_actor_shift_{name}"] = fid(real, fakes)

        for name, (lateral, vertical) in fid_suite_shifts(lane_sign).items():
            fakes = []
            for ci in cams:
                s = self.datamanager._camera_sample(ci)
                c2w = np.array(s.c2w, dtype=np.float32)
                c2w[:3, 3] += c2w[:3, 0] * lateral + c2w[:3, 1] * vertical
                out = self.model.apply(
                    state.params,
                    jnp.asarray(c2w), jnp.asarray(s.K), s.width, s.height,
                    jnp.asarray(s.time), jnp.asarray(s.sensor_idx), jnp.asarray(s.cam_idx),
                    method=SplatADModel.get_camera_outputs,
                )
                fakes.append(np.asarray(out["rgb"]))
            metrics[f"fid_{name}"] = fid(real, fakes)
        return metrics

    def eval_metrics(self, state: TrainState) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        cams = self.outputs.eval_camera_indices
        if cams:
            psnrs, ssims = [], []
            for ci in cams:
                s = self.datamanager._camera_sample(ci)
                out = self.model.apply(
                    state.params,
                    jnp.asarray(s.c2w), jnp.asarray(s.K), s.width, s.height,
                    jnp.asarray(s.time), jnp.asarray(s.sensor_idx), jnp.asarray(s.cam_idx),
                    method=SplatADModel.get_camera_outputs,
                )
                psnrs.append(float(L.psnr(out["rgb"], jnp.asarray(s.image))))
                ssims.append(float(L.ssim(out["rgb"], jnp.asarray(s.image))))
            metrics["psnr"] = float(np.mean(psnrs))
            metrics["ssim"] = float(np.mean(ssims))
        scans = self.outputs.eval_lidar_indices
        if scans:
            med, rel = [], []
            for si in scans:
                s = self.datamanager._lidar_sample(si)
                out = self.model.apply(
                    state.params,
                    jnp.asarray(s.l2w), jnp.asarray(s.raster_pts), jnp.asarray(s.time),
                    jnp.asarray(s.sensor_idx),
                    method=SplatADModel.get_lidar_outputs,
                )
                ret = np.asarray(s.valid & s.did_return)
                err2 = (np.asarray(out["depth"][:, 0]) - s.raster_pts[:, 2])[ret] ** 2
                med.append(float(np.median(err2)))
                rel.append(float(np.mean(err2 / np.clip(s.raster_pts[ret, 2] ** 2, 1e-6, None))))
            metrics["depth_median_l2"] = float(np.mean(med))
            metrics["depth_mean_rel_l2"] = float(np.mean(rel))
        return metrics
