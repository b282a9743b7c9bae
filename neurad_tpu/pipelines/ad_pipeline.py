"""AD pipeline: builds the NeuRAD model from parsed data and drives training/eval.

TPU-native counterpart of `nerfstudio/pipelines/ad_pipeline.py:57` +
`base_pipeline.py:226-463`. The pipeline owns the datamanager and the model
*definition*; parameters/optimizer state live in the TrainState (pure functions
everywhere). Evaluation renders full sensors chunk-wise like
`get_average_eval_image_metrics` (`ad_pipeline.py:145-306`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.data.datamanager import ADDataManager, ADDataManagerConfig
from neurad_tpu.data.dataparsers.base import ADDataparserOutputs
from neurad_tpu.engine.optimizers import NEURAD_OPTIMIZER_GROUPS, build_optimizer
from neurad_tpu.engine.trainer import TrainState, make_train_step
from neurad_tpu.model_components import losses as L
from neurad_tpu.model_components.dynamic_actors import actor_data_from_trajectories, empty_actor_data
from neurad_tpu.models.neurad import NeuRADModel


@dataclasses.dataclass
class ADPipelineConfig:
    datamanager: ADDataManagerConfig = dataclasses.field(default_factory=ADDataManagerConfig)
    model: str = "neurad"  # 'neurad' | 'nerfacto' | 'lidar-nerfacto'
    model_overrides: dict = dataclasses.field(default_factory=dict)
    optimizer_groups: dict = dataclasses.field(default_factory=lambda: dict(NEURAD_OPTIMIZER_GROUPS))
    eval_chunk: int = 1 << 15
    # shard eval/render rays over the device mesh when >1 device (multi-chip
    # eval the reference's DDP never had); False = single-device lax.map chunks
    eval_shard: bool = True
    # rays per NFF chunk inside the jit'd train step: bounds the hash-gather
    # intermediates that otherwise exceed one chip's HBM at full batch
    # (0 = no chunking; see ops/chunking.py)
    train_ray_chunk: int = 8192
    seed: int = 0


class ADPipeline:
    """Builds model+datamanager from dataparser outputs (`ad_pipeline.py:60-77`)."""

    def __init__(self, outputs: ADDataparserOutputs, config: Optional[ADPipelineConfig] = None):
        self.config = config or ADPipelineConfig()
        self.outputs = outputs
        # per-host ray sampling; model-init seeds stay identical across hosts
        from neurad_tpu.parallel.sharding import host_local_seed

        self.datamanager = ADDataManager(outputs, self.config.datamanager, seed=host_local_seed(self.config.seed))

        actor_data = (
            actor_data_from_trajectories(outputs.trajectories) if outputs.trajectories else empty_actor_data()
        )
        static_scale = float(np.abs(np.asarray(outputs.scene_box.aabb)).max())
        if self.config.model in ("nerfacto", "lidar-nerfacto"):
            from neurad_tpu.models.nerfacto import NerfactoModel

            aabb = tuple(map(tuple, np.asarray(outputs.scene_box.aabb).tolist()))
            model_kwargs = dict(
                aabb=aabb,
                num_images=len(outputs.images),
                use_lidar_losses=self.config.model == "lidar-nerfacto",
            )
            model_kwargs.update(self.config.model_overrides)
            self.model = NerfactoModel(**model_kwargs)
        else:
            model_kwargs = dict(
                actor_data=actor_data,
                static_scale=static_scale,
                num_sensors=len(outputs.sensor_idx_to_name),
                duration=outputs.duration,
                num_train_images=len(outputs.images),
                rgb_upsample_factor=self.config.datamanager.rgb_upsample_factor,
            )
            model_kwargs.update(self.config.model_overrides)
            self.model = NeuRADModel(**model_kwargs)

        self.num_cam_rays = self.datamanager.num_cam_rays
        # the TRAIN loss sees the GLOBAL batch: under multi-host SPMD
        # (`parallel/sharding.py:assemble_global_train_batch`) every host
        # contributes num_cam_rays camera rays, laid out [all cam | all lidar]
        self._train_num_cam_rays = self.num_cam_rays * jax.process_count()
        self.patch_size = self.datamanager.patch_shape

        # VGG19 perceptual stack (`losses.py:582-625`): loaded ONCE and closed
        # over by the jitted loss so `vgg_loss` actually fires in training.
        # Pretrained weights load from NEURAD_TPU_VGG19_WEIGHTS (.npz of
        # torchvision vgg19.features); otherwise a fixed He-init network.
        self.vgg_params = None
        if not self._is_nerfacto and getattr(self.model, "loss", None) is not None:
            if self.model.loss.vgg_mult > 0.0:
                from neurad_tpu.model_components.perceptual import load_vgg19_params

                self.vgg_params = load_vgg19_params(jax.random.PRNGKey(1234))

    # ------------------------------------------------------------------

    @property
    def _is_nerfacto(self) -> bool:
        return self.config.model in ("nerfacto", "lidar-nerfacto")

    def init_state(self, rng: Optional[jax.Array] = None) -> Tuple[TrainState, object]:
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        rng, init_rng, flip_rng, state_rng = jax.random.split(rng, 4)
        bundle, _ = self.datamanager.next_train()

        # jit the init: flax init otherwise dispatches thousands of tiny eager
        # ops — pathological over the remote-TPU tunnel
        if self._is_nerfacto:
            _init = jax.jit(lambda ir, fr, b: self.model.init(ir, b, True, fr))
        else:

            @jax.jit
            def _init(ir, fr, b):
                return self.model.init(
                    ir, b, self.patch_size, self.num_cam_rays, True, fr, method=NeuRADModel.get_outputs
                )

        params = _init(init_rng, flip_rng, bundle)
        tx, opt_state = build_optimizer(params, self.config.optimizer_groups)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, rng=state_rng)
        return state, tx

    def loss_fn(self, params, bundle: RayBundle, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        if self._is_nerfacto:
            from neurad_tpu.models.nerfacto import NerfactoModel

            out = self.model.apply(params, bundle, True, rng)
            nb = dict(batch)
            if "image" in nb:  # per-ray GT: patches are 1:1 pixels for nerfacto
                nb["image"] = nb["image"].reshape(-1, 3)[: self.num_cam_rays]
                out = {**out, "rgb": out["rgb"][: self.num_cam_rays]}
            return self.model.apply(params, out, nb, method=NerfactoModel.compute_losses)
        if self.vgg_params is not None and "image" in batch:
            batch = {**batch, "vgg_params": self.vgg_params}
        chunk = self.config.train_ray_chunk
        if chunk and bundle.origins.shape[0] > chunk:
            from neurad_tpu.ops.chunking import chunked_map

            # per-ray NFF chunked over rays (modality comes from metadata
            # `is_lidar`, so chunks need no static cam/lidar split)
            nff = chunked_map(
                lambda b, key: self.model.apply(params, b, 0, True, key, method=NeuRADModel.get_nff_outputs),
                bundle,
                chunk,
                rng=rng,
            )
            features = nff.pop("features")
            rgb, intensity, ray_drop_logits = self.model.apply(
                params, features, self.patch_size, self._train_num_cam_rays, True,
                method=NeuRADModel.decode_features,
            )
            out = dict(nff)
            out["rgb"] = rgb
            if intensity is not None:
                out["intensity"] = intensity
                out["ray_drop_logits"] = ray_drop_logits
        else:
            out = self.model.apply(
                params, bundle, self.patch_size, self._train_num_cam_rays, True, rng,
                method=NeuRADModel.get_outputs,
            )
        return self.model.apply(params, out, batch, self._train_num_cam_rays, method=NeuRADModel.compute_losses)

    def make_train_step(self, tx):
        return make_train_step(self.loss_fn, tx)


    # ------------------------------------------------------------------
    # viewer rendering (traced edit values: sliders don't recompile)
    # ------------------------------------------------------------------

    def render_viewer_image(
        self, params, c2w: np.ndarray, width: int, height: int, time: float, edits_vec=None
    ) -> np.ndarray:
        """One-jit full-frame render for the live viewer. edits_vec is a [4]
        array (lateral, longitudinal, rotation, height) of TRACED values — the
        counterpart of the reference's actor-edit ViewerSliders
        (`render_state_machine.py` + `dynamic_actors.py:181-249`)."""
        import jax.numpy as jnp

        from neurad_tpu.cameras.cameras import CameraType, Cameras, full_image_coords, generate_rays
        from neurad_tpu.model_components.dynamic_actors import ActorEdits

        if not hasattr(self, "_viewer_applies"):
            self._viewer_applies = {}
        key = (width, height)
        if key not in self._viewer_applies:

            @jax.jit
            def fn(params, c2w, t, ev):
                focal = 0.7 * width
                cams = Cameras(
                    camera_to_worlds=c2w[None],
                    fx=jnp.full((1, 1), focal), fy=jnp.full((1, 1), focal),
                    cx=jnp.full((1, 1), width / 2.0), cy=jnp.full((1, 1), height / 2.0),
                    width=jnp.full((1, 1), width, dtype=jnp.int32),
                    height=jnp.full((1, 1), height, dtype=jnp.int32),
                    camera_type=jnp.full((1, 1), int(CameraType.PERSPECTIVE), dtype=jnp.int32),
                    times=jnp.full((1, 1), t),
                )
                coords = full_image_coords(height, width)
                bundle = generate_rays(cams, jnp.zeros(coords.shape[0], dtype=jnp.int32), coords)
                edits = ActorEdits(lateral=ev[0], longitudinal=ev[1], rotation=ev[2], height=ev[3], index=-1)
                nff = self.model.apply(
                    params, bundle, bundle.origins.shape[0], False, None, edits=edits,
                    method=NeuRADModel.get_nff_outputs,
                )
                rgb = self.model.apply(
                    params, nff["features"], (height, width), height * width,
                    method=NeuRADModel.decode_features,
                )[0]
                return rgb[0]

            self._viewer_applies[key] = fn

        # accept 4- or 5-element vectors (the 5th is the splatad-only RS edit)
        ev = jnp.zeros(4) if edits_vec is None else jnp.asarray(edits_vec, jnp.float32)[:4]
        return np.asarray(self._viewer_applies[key](params, jnp.asarray(c2w, jnp.float32), float(time), ev))

    def render_virtual_lidar(
        self, params, origin: np.ndarray, time: float, channels: int = 32,
        azim_res_deg: float = 1.0, fov_up: float = 5.0, fov_down: float = -15.0,
        drop_threshold: float = 0.5, edits_vec=None,
    ) -> np.ndarray:
        """Virtual-lidar point cloud for the viewer (the reference's
        LidarRenderer thread, `render_state_machine.py:361-451`): synthesize a
        spherical scan at `origin`, render depth/intensity/ray-drop through the
        model, and keep points whose predicted ray-drop prob < threshold.
        Returns [N, 4] (world xyz + intensity)."""
        import jax.numpy as jnp

        from neurad_tpu.core.structs import RayBundle
        from neurad_tpu.model_components.dynamic_actors import ActorEdits

        elev = np.deg2rad(np.linspace(fov_down, fov_up, channels))
        azim = np.deg2rad(np.arange(-180.0, 180.0, azim_res_deg))
        el, azm = np.meshgrid(elev, azim, indexing="ij")
        dirs = np.stack(
            [np.cos(el) * np.cos(azm), np.cos(el) * np.sin(azm), np.sin(el)], axis=-1
        ).reshape(-1, 3).astype(np.float32)
        n = dirs.shape[0]

        if not hasattr(self, "_viewer_lidar_applies"):
            self._viewer_lidar_applies = {}
        if n not in self._viewer_lidar_applies:

            @jax.jit
            def fn(params, origins, directions, t, ev):
                bundle = RayBundle(
                    origins=origins,
                    directions=directions,
                    pixel_area=jnp.full((n, 1), 1e-6),
                    camera_indices=jnp.zeros((n, 1), jnp.int32),
                    times=jnp.full((n, 1), t),
                    metadata={
                        "directions_norm": jnp.ones((n, 1)),
                        "is_lidar": jnp.ones((n, 1), bool),
                        "sensor_idxs": jnp.zeros((n, 1), jnp.int32),
                    },
                )
                edits = ActorEdits(lateral=ev[0], longitudinal=ev[1], rotation=ev[2], height=ev[3], index=-1)
                nff = self.model.apply(
                    params, bundle, 0, False, None, edits=edits, method=NeuRADModel.get_nff_outputs
                )
                _, intensity, ray_drop = self.model.apply(
                    params, nff["features"], (1, 1), 0, method=NeuRADModel.decode_features
                )
                return nff["depth"], intensity, ray_drop

            self._viewer_lidar_applies[n] = fn

        ev = jnp.zeros(4) if edits_vec is None else jnp.asarray(edits_vec, jnp.float32)[:4]
        origins = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (n, 3))
        depth, intensity, ray_drop = self._viewer_lidar_applies[n](
            params, origins, jnp.asarray(dirs), float(time), ev
        )
        depth, intensity = np.asarray(depth), np.asarray(intensity)
        keep = 1.0 / (1.0 + np.exp(-np.asarray(ray_drop)[:, 0])) < drop_threshold
        pts = np.asarray(origin)[None] + dirs * depth
        return np.concatenate([pts, intensity], axis=-1)[keep]

    # ------------------------------------------------------------------
    # evaluation (`ad_pipeline.py:145-306`)
    # ------------------------------------------------------------------

    def _eval_params(self, params):
        """Mesh-replicate params for eval when ray sharding is active, so every
        downstream apply (NFF + CNN decode) sees consistent placements."""
        if len(jax.devices()) > 1 and getattr(self.config, "eval_shard", True):
            from neurad_tpu.parallel.sharding import make_mesh, replicate

            return replicate(make_mesh(), params)
        return params

    def _chunked_nff(self, params, bundle: RayBundle, all_camera: bool) -> Dict[str, jnp.ndarray]:
        """Chunked NFF forward over a flat bundle (`base_model.py:178-205`).

        `all_camera` decides the pixel-area scaling per chunk (whole bundle is one
        modality at eval). jit caches per (chunk-shape, all_camera).
        """
        if not hasattr(self, "_nff_applies"):
            self._nff_applies = {}
        edits = getattr(self, "_render_edits", None)  # static; one (cached) trace per edit value
        chunk = self.config.eval_chunk

        # multi-device: shard the RAY axis over the mesh (GSPMD partitions the
        # whole NFF — eval/render parallelism the reference's DDP never had);
        # super-chunks of chunk*n_dev rays bound per-device memory like the
        # single-device chunking does.
        n_dev = len(jax.devices())
        if n_dev > 1 and getattr(self.config, "eval_shard", True):
            from neurad_tpu.parallel.sharding import make_mesh, replicate, shard_batch

            key = (edits, bool(all_camera), "sharded")
            if key not in self._nff_applies:

                @functools.partial(jax.jit, static_argnums=(2,))
                def run_sh(p, b, nc):
                    return self.model.apply(
                        p, b, nc, False, None, edits=edits, method=NeuRADModel.get_nff_outputs
                    )

                self._nff_applies[key] = run_sh

            mesh = make_mesh()
            # params may be committed to one device (post-restore / --no-mesh
            # training); replicate onto the mesh (no-op when already placed)
            params = replicate(mesh, params)
            n = bundle.origins.shape[0]
            super_chunk = chunk * n_dev
            outs = []
            for i in range(0, n, super_chunk):
                piece = jax.tree.map(lambda x: x[i : i + super_chunk], bundle)
                m = piece.origins.shape[0]
                pad = (-m) % n_dev
                if pad:
                    piece = jax.tree.map(
                        lambda x: jnp.concatenate(
                            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
                        ),
                        piece,
                    )
                piece = shard_batch(mesh, piece)
                out = self._nff_applies[key](params, piece, (m + pad) if all_camera else 0)
                outs.append(jax.tree.map(lambda x: x[:m], out))
            if len(outs) == 1:
                return outs[0]
            return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

        key = (edits, bool(all_camera))
        if key not in self._nff_applies:

            @jax.jit
            def run(p, b):  # b: bundle leaves reshaped [n_chunks, chunk, ...]
                def one(piece):
                    return self.model.apply(
                        p, piece, chunk if all_camera else 0, False, None, edits=edits,
                        method=NeuRADModel.get_nff_outputs,
                    )

                # ONE dispatch for the whole frame: the host-side chunk loop it
                # replaces paid ~31 ms of tunnel dispatch overhead PER chunk
                return jax.lax.map(one, b)

            self._nff_applies[key] = run

        n = bundle.origins.shape[0]
        pad = (-n) % chunk
        def prep(x):
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            return x.reshape((-1, chunk) + x.shape[1:])

        b = jax.tree.map(prep, bundle)
        out = self._nff_applies[key](params, b)
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:n], out)

    def render_eval_camera(self, state: TrainState, cam_idx: int, edits=None) -> Tuple[np.ndarray, np.ndarray]:
        """Full-image render -> (pred rgb [H', W', 3], gt rgb) (`neurad.py:624-675`).

        edits: optional ActorEdits applied at render time (FID actor edits,
        `ad_pipeline.py:453-502`)."""
        self._render_edits = edits
        bundle, gt, (hs, ws) = self.datamanager.eval_camera_bundle(cam_idx)
        params = self._eval_params(state.params)
        nff = self._chunked_nff(params, bundle, all_camera=True)
        features = nff["features"].reshape(1, hs, ws, -1)
        rgb = self.model.apply(
            params,
            features.reshape(-1, features.shape[-1]),
            (hs, ws),
            hs * ws,
            method=NeuRADModel.decode_features,
        )[0]
        self._render_edits = None
        return np.asarray(rgb[0]), gt

    def render_eval_lidar(self, state: TrainState, scan_idx: int) -> Dict[str, np.ndarray]:
        bundle, pts = self.datamanager.eval_lidar_bundle(scan_idx)
        params = self._eval_params(state.params)
        nff = self._chunked_nff(params, bundle, all_camera=False)
        feats = nff["features"]
        _, intensity, ray_drop = self.model.apply(
            params, feats, (1, 1), 0, method=NeuRADModel.decode_features
        )
        return {
            "depth": np.asarray(nff["depth"]),
            "intensity": np.asarray(intensity),
            "ray_drop_logits": np.asarray(ray_drop),
            "gt_distance": np.asarray(bundle.metadata["directions_norm"]),
            "gt_intensity": pts[:, 3:4],
            "did_return": np.asarray(bundle.metadata["did_return"]),
            "origins": np.asarray(bundle.origins),
            "directions": np.asarray(bundle.directions),
        }

    def eval_fid_suite(self, state: TrainState, max_images: Optional[int] = None) -> Dict[str, float]:
        """Novel-view FID: lane shift +-2/3 m, vertical +1 m (`ad_pipeline.py:172-192,
        376-502`). Renders eval cameras with shifted ray origins and compares the
        feature statistics against the real eval images."""
        import jax as _jax

        from neurad_tpu.models.neurad import NeuRADModel
        from neurad_tpu.utils.eval_metrics import fid, fid_suite_shifts

        lane_sign = 1
        if self.outputs.metadata and "lane_shift_sign" in self.outputs.metadata:
            lane_sign = int(self.outputs.metadata["lane_shift_sign"])
        cams = list(self.outputs.eval_camera_indices)
        if max_images is not None:
            cams = cams[:max_images]  # full eval split by default (`ad_pipeline.py:196`)
        if not cams:
            return {}
        real = [np.asarray(self.render_eval_camera(state, ci)[1]) for ci in cams]
        metrics: Dict[str, float] = {}

        # actor edits: rot +-0.5 rad, trans +-2 m (`ad_pipeline.py:182-186,453-502`)
        if getattr(self.model, "actor_data", None) is not None and self.model.actor_data.n_actors > 0:
            from neurad_tpu.model_components.dynamic_actors import ActorEdits

            actor_edits = {
                "rot": (ActorEdits(rotation=0.5), ActorEdits(rotation=-0.5)),
                "trans": (ActorEdits(lateral=2.0), ActorEdits(lateral=-2.0)),
            }
            for name, edit_list in actor_edits.items():
                fakes = []
                for edit in edit_list:
                    for ci in cams:
                        fakes.append(np.asarray(self.render_eval_camera(state, ci, edits=edit)[0]))
                metrics[f"fid_actor_shift_{name}"] = fid(real, fakes, vgg_params=self.vgg_params)

        eval_params = self._eval_params(state.params)
        for name, (lateral, vertical) in fid_suite_shifts(lane_sign).items():
            fakes = []
            for ci in cams:
                bundle, _, (hs, ws) = self.datamanager.eval_camera_bundle(ci)
                c2w = np.asarray(self.outputs.cameras.camera_to_worlds[ci])
                right, up = c2w[:3, 0], c2w[:3, 1]
                shift = jnp.asarray(right * lateral + up * vertical)
                bundle = bundle.replace(origins=bundle.origins + shift)
                nff = self._chunked_nff(eval_params, bundle, all_camera=True)
                features = nff["features"]
                rgb = self.model.apply(
                    eval_params, features, (hs, ws), hs * ws, method=NeuRADModel.decode_features
                )[0]
                fakes.append(np.asarray(rgb[0]))
            metrics[f"fid_{name}"] = fid(real, fakes)
        return metrics


    def _actor_pixel_mask(self, cam_idx: int, hs: int, ws: int) -> Optional[np.ndarray]:
        """[hs, ws] bool mask of pixels covered by projected actor boxes at the
        camera's timestamp (producer for the reference's actor-coverage-weighted
        metric aggregation, `ad_pipeline.py:330-346`)."""
        ad = getattr(self.model, "actor_data", None)
        if ad is None or ad.n_actors == 0:
            return None
        cams = self.outputs.cameras
        c2w = np.eye(4, dtype=np.float64)
        c2w[:3] = np.asarray(cams.camera_to_worlds[cam_idx])
        t = 0.0
        if cams.times is not None:
            t = float(np.asarray(cams.times[cam_idx]).reshape(-1)[0])
        ti = int(np.argmin(np.abs(ad.unique_timestamps - t)))
        sx = ws / float(np.asarray(cams.width[cam_idx]).reshape(-1)[0])
        sy = hs / float(np.asarray(cams.height[cam_idx]).reshape(-1)[0])
        fx = float(np.asarray(cams.fx[cam_idx]).reshape(-1)[0]) * sx
        fy = float(np.asarray(cams.fy[cam_idx]).reshape(-1)[0]) * sy
        cx = float(np.asarray(cams.cx[cam_idx]).reshape(-1)[0]) * sx
        cy = float(np.asarray(cams.cy[cam_idx]).reshape(-1)[0]) * sy

        r_wc = c2w[:3, :3].T
        t_w = c2w[:3, 3]
        mask = np.zeros((hs, ws), dtype=bool)
        corners_unit = np.array(
            [[sx_, sy_, sz_] for sx_ in (-1, 1) for sy_ in (-1, 1) for sz_ in (-1, 1)], dtype=np.float64
        )
        for a in range(ad.n_actors):
            if not ad.present[ti, a]:
                continue
            b2w = ad.poses[ti, a]
            half = np.asarray(ad.sizes[a], dtype=np.float64) / 2.0
            corners_w = (b2w[:3, :3] @ (corners_unit * half).T).T + b2w[:3, 3]
            p_cam = (r_wc @ (corners_w - t_w).T).T  # camera looks down -z, y up
            z = -p_cam[:, 2]
            if (z <= 0.1).all():
                continue
            z = np.clip(z, 0.1, None)
            us = cx + fx * p_cam[:, 0] / z
            vs = cy - fy * p_cam[:, 1] / z
            u0, u1 = int(np.floor(us.min())), int(np.ceil(us.max()))
            v0, v1 = int(np.floor(vs.min())), int(np.ceil(vs.max()))
            u0, u1 = max(u0, 0), min(u1, ws)
            v0, v1 = max(v0, 0), min(v1, hs)
            if u1 > u0 and v1 > v0:
                mask[v0:v1, u0:u1] = True
        return mask

    def eval_metrics(self, state: TrainState) -> Dict[str, float]:
        """PSNR/SSIM on eval cameras + lidar depth/intensity metrics
        (`ad_pipeline.py:118-142`)."""
        metrics: Dict[str, float] = {}
        cams = self.outputs.eval_camera_indices
        if cams:
            from neurad_tpu.utils.eval_metrics import lpips

            vgg = self.vgg_params
            if vgg is None:
                from neurad_tpu.model_components.perceptual import load_vgg19_params

                vgg = self.vgg_params = load_vgg19_params(jax.random.PRNGKey(1234))
            psnrs, ssims, lpipss = [], [], []
            actor_psnrs, actor_covs = [], []
            for ci in cams:
                pred, gt = self.render_eval_camera(state, ci)
                psnrs.append(float(L.psnr(jnp.asarray(pred), jnp.asarray(gt))))
                ssims.append(float(L.ssim(jnp.asarray(pred), jnp.asarray(gt))))
                lpipss.append(float(lpips(vgg, jnp.asarray(pred), jnp.asarray(gt))))
                amask = self._actor_pixel_mask(ci, pred.shape[0], pred.shape[1])
                if amask is not None and amask.any():
                    mse = float(np.mean((np.asarray(pred)[amask] - np.asarray(gt)[amask]) ** 2))
                    actor_psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
                    actor_covs.append(float(amask.mean()))
            metrics["psnr"] = float(np.mean(psnrs))
            metrics["ssim"] = float(np.mean(ssims))
            metrics["lpips"] = float(np.mean(lpipss))
            if actor_covs:
                # actor metrics weighted by per-image actor coverage
                # (`ad_pipeline.py:330-346`)
                w = np.asarray(actor_covs)
                metrics["actor_psnr"] = float(np.sum(np.asarray(actor_psnrs) * w) / w.sum())
                metrics["actor_coverage"] = float(np.mean(w))
        scans = self.outputs.eval_lidar_indices
        if scans:
            from neurad_tpu.core.math_utils import chamfer_distance

            med_l2, rel_l2, int_rmse, drop_acc, chamfers = [], [], [], [], []
            for si in scans:
                out = self.render_eval_lidar(state, si)
                ret = out["did_return"][:, 0]
                err2 = (out["depth"][ret] - out["gt_distance"][ret]) ** 2
                med_l2.append(float(np.median(err2)))
                rel_l2.append(float(np.mean(err2 / np.clip(out["gt_distance"][ret] ** 2, 1e-6, None))))
                int_rmse.append(float(np.sqrt(np.mean((out["intensity"][ret] - out["gt_intensity"][ret]) ** 2))))
                pred_drop = 1.0 / (1.0 + np.exp(-out["ray_drop_logits"][:, 0])) > 0.5
                drop_acc.append(float(np.mean(pred_drop == ~ret)))
                # chamfer between predicted and GT point clouds (`neurad.py:610-620`):
                # pred points where the model predicts a return, GT where it returned
                pred_pts = out["origins"] + out["directions"] * out["depth"]
                gt_pts = out["origins"] + out["directions"] * out["gt_distance"]
                if (~pred_drop).any() and ret.any():
                    chamfers.append(
                        float(
                            chamfer_distance(
                                jnp.asarray(pred_pts),
                                jnp.asarray(gt_pts),
                                pred_mask=jnp.asarray(~pred_drop),
                                gt_mask=jnp.asarray(ret),
                            )
                        )
                    )
                else:  # degenerate: all rays predicted dropped (`neurad.py:620`)
                    chamfers.append(float(np.linalg.norm(gt_pts[ret], axis=-1).mean()))
            metrics["depth_median_l2"] = float(np.mean(med_l2))
            metrics["depth_mean_rel_l2"] = float(np.mean(rel_l2))
            metrics["intensity_rmse"] = float(np.mean(int_rmse))
            metrics["ray_drop_accuracy"] = float(np.mean(drop_acc))
            metrics["chamfer_distance"] = float(np.mean(chamfers))
        return metrics
