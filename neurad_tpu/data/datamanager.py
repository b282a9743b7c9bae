"""AD datamanager: fixed-shape camera-patch + lidar-point batches.

TPU-native counterpart of `nerfstudio/data/datamanagers/ad_datamanager.py:54`
(+ `image_lidar_datamanager.py:172`, ScaledPatchSampler `pixel_samplers.py:618`,
LidarPointSampler `pixel_samplers.py:482`). The reference runs N worker processes
feeding an mp.Queue; here sampling is light host-side numpy (index picking) and
ray generation is a jit'd device function, so a single async prefetch thread
keeps the TPU fed. Every batch has the SAME static shapes:

  rays = [num_cam_patches * patch_size^2 camera rays] ++ [num_lidar_rays lidar rays]

Camera rays are patch-stride centers: a DxD ray patch supervises a (D*up)^2 pixel
patch (`pixel_samplers.py:698-717`).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.cameras.cameras import generate_rays
from neurad_tpu.cameras.lidars import generate_lidar_rays_from_points
from neurad_tpu.core.structs import RayBundle, tree_cat
from neurad_tpu.data.dataparsers.base import ADDataparserOutputs


@dataclasses.dataclass
class ADDataManagerConfig:
    """Batch shape settings (`ad_datamanager.py:38-45`: 40960 cam rays as 40 32x32
    patches + 16384 lidar rays by default)."""

    num_cam_patches: int = 40
    patch_size: int = 32  # rays per patch side
    num_lidar_rays: int = 16384
    rgb_upsample_factor: int = 3
    prefetch: int = 2
    # sampler threads feeding the prefetch queue (the reference runs N worker
    # processes, `image_lidar_datamanager.py:232-250`; host numpy sampling here
    # releases the GIL in the big gathers, so threads scale similarly)
    num_workers: int = 2


class ADDataManager:
    """Joint camera+lidar batch sampler over parsed outputs."""

    def __init__(self, outputs: ADDataparserOutputs, config: Optional[ADDataManagerConfig] = None, seed: int = 0):
        self.config = config or ADDataManagerConfig()
        self.outputs = outputs
        self._rng = np.random.default_rng(seed)

        eval_cams = set(outputs.eval_camera_indices)
        self.train_cam_indices = np.array(
            [i for i in range(len(outputs.images)) if i not in eval_cams], dtype=np.int64
        )
        # kept uint8 when the dataset provides uint8 (3GB for 480 pandaset frames);
        # patches are normalized to float at sample time.
        self.images = np.stack(outputs.images)  # [N, H, W, 3]
        self._img_scale = 1.0 / 255.0 if self.images.dtype == np.uint8 else 1.0

        eval_lidars = set(outputs.eval_lidar_indices)
        train_scan_idx = [i for i in range(len(outputs.point_clouds)) if i not in eval_lidars]
        pts, scan_ids = [], []
        for i in train_scan_idx:
            pc = outputs.point_clouds[i]
            pts.append(pc)
            scan_ids.append(np.full(pc.shape[0], i, dtype=np.int64))
        self.points = np.concatenate(pts) if pts else np.zeros((0, 5), dtype=np.float32)
        self.point_scan_ids = np.concatenate(scan_ids) if scan_ids else np.zeros(0, dtype=np.int64)

        self._queue: "queue.Queue" = queue.Queue(maxsize=self.config.prefetch)
        self._thread: Optional[threading.Thread] = None
        # jit the ray generation: eager per-op dispatch is slow over a remote-TPU
        # tunnel, and a single fused program also helps normal backends
        self._gen_cam_rays = jax.jit(lambda cams, idx, coords: generate_rays(cams, idx, coords))
        self._gen_lidar_rays = jax.jit(
            lambda lidars, idx, pts: generate_lidar_rays_from_points(lidars, idx, pts)
        )

    # ------------------------------------------------------------------

    # host sampler state for bit-exact train resume (`trainer.py:456-533`)
    def rng_state(self) -> dict:
        return self._rng.bit_generator.state

    def set_rng_state(self, state: dict) -> None:
        self._rng.bit_generator.state = state

    @property
    def num_cam_rays(self) -> int:
        return self.config.num_cam_patches * self.config.patch_size**2

    @property
    def patch_shape(self) -> Tuple[int, int]:
        return (self.config.patch_size, self.config.patch_size)

    def next_train(self) -> Tuple[RayBundle, Dict[str, jnp.ndarray]]:
        """One training batch: (RayBundle [cam..lidar], batch dict)."""
        return self._sample_with_rng(self._rng)

    def _sample_with_rng(self, rng: np.random.Generator) -> Tuple[RayBundle, Dict[str, jnp.ndarray]]:
        cfg = self.config
        d, up = cfg.patch_size, cfg.rgb_upsample_factor
        gt = d * up
        n_img, h, w = self.images.shape[:3]

        # --- camera patches (`pixel_samplers.py:698-717`) ---
        cam_choice = rng.choice(self.train_cam_indices, size=cfg.num_cam_patches)
        r0 = rng.integers(0, h - gt + 1, size=cfg.num_cam_patches)
        c0 = rng.integers(0, w - gt + 1, size=cfg.num_cam_patches)
        # ray pixel coords at the center of each up x up block
        k = np.arange(d) * up + up / 2.0
        rows = r0[:, None, None] + k[None, :, None]  # [B, D, 1]
        cols = c0[:, None, None] + k[None, None, :]  # [B, 1, D]
        coords = np.stack(np.broadcast_arrays(rows, cols), axis=-1).reshape(-1, 2)  # [B*D*D, 2]
        cam_idx = np.repeat(cam_choice, d * d)

        cam_bundle = self._gen_cam_rays(
            self.outputs.cameras, jnp.asarray(cam_idx, dtype=jnp.int32), jnp.asarray(coords, dtype=jnp.float32)
        )

        # native C++ patch gather (5-6x the numpy stack; numpy fallback inside)
        from neurad_tpu.native import extract_patches

        gt_patches = extract_patches(self.images, cam_choice, r0, c0, gt)

        # --- lidar points (`pixel_samplers.py:530-584`) ---
        if self.points.shape[0] > 0 and cfg.num_lidar_rays > 0:
            pt_idx = rng.integers(0, self.points.shape[0], size=cfg.num_lidar_rays)
            pts = self.points[pt_idx]
            scan = self.point_scan_ids[pt_idx]
            lidar_bundle = self._gen_lidar_rays(
                self.outputs.lidars, jnp.asarray(scan, dtype=jnp.int32), jnp.asarray(pts)
            )
            bundle = _merge_cam_lidar(cam_bundle, lidar_bundle)
            batch = {
                "image": jnp.asarray(gt_patches),
                "distance": lidar_bundle.metadata["directions_norm"],
                "did_return": lidar_bundle.metadata["did_return"],
                "intensity": jnp.asarray(pts[:, 3:4]),
            }
        else:
            bundle = cam_bundle
            batch = {"image": jnp.asarray(gt_patches)}
        return bundle, batch

    def iter_train(self) -> Iterator[Tuple[RayBundle, Dict[str, jnp.ndarray]]]:
        """Background-thread prefetching iterator (replaces the reference's
        mp.Queue workers, `image_lidar_datamanager.py:232-307`)."""

        def _worker(wid: int, seed: int):
            # per-worker rng stream forked from the master seed (deterministic,
            # no lock contention on self._rng)
            rng = np.random.default_rng(seed)
            while True:
                self._queue.put(self._sample_with_rng(rng))

        if self._thread is None:
            n_workers = max(1, self.config.num_workers)
            self._thread = [
                threading.Thread(
                    target=_worker, args=(w, int(self._rng.integers(0, 2**62)) + w), daemon=True
                )
                for w in range(n_workers)
            ]
            for t in self._thread:
                t.start()
        while True:
            yield self._queue.get()

    # ------------------------------------------------------------------

    def eval_camera_bundle(self, cam_idx: int) -> Tuple[RayBundle, np.ndarray, Tuple[int, int]]:
        """Full-image eval rays at upsample-stride centers (`neurad.py:639-645`)
        -> (bundle, gt image, feature-grid shape)."""
        up = self.config.rgb_upsample_factor
        h, w = self.images.shape[1:3]
        hs, ws = h // up, w // up
        k_r = np.arange(hs) * up + up / 2.0
        k_c = np.arange(ws) * up + up / 2.0
        rr, cc = np.meshgrid(k_r, k_c, indexing="ij")
        coords = np.stack([rr, cc], axis=-1).reshape(-1, 2)
        idx = np.full(coords.shape[0], cam_idx, dtype=np.int64)
        bundle = generate_rays(
            self.outputs.cameras, jnp.asarray(idx, dtype=jnp.int32), jnp.asarray(coords, dtype=jnp.float32)
        )
        gt = self.images[cam_idx][: hs * up, : ws * up].astype(np.float32) * self._img_scale
        return bundle, gt, (hs, ws)

    def eval_lidar_bundle(self, scan_idx: int) -> Tuple[RayBundle, np.ndarray]:
        """Full-scan eval rays -> (bundle, points [N,5])."""
        pts = self.outputs.point_clouds[scan_idx]
        idx = np.full(pts.shape[0], scan_idx, dtype=np.int64)
        bundle = generate_lidar_rays_from_points(
            self.outputs.lidars, jnp.asarray(idx, dtype=jnp.int32), jnp.asarray(pts)
        )
        return bundle, pts


def _merge_cam_lidar(cam: RayBundle, lidar: RayBundle) -> RayBundle:
    """Concatenate camera rays before lidar rays with aligned metadata
    (`image_lidar_datamanager.py:379-423`)."""
    n_cam = cam.origins.shape[0]
    n_lidar = lidar.origins.shape[0]
    cam_meta = {
        "sensor_idxs": cam.metadata.get("sensor_idxs", jnp.zeros((n_cam, 1), dtype=jnp.int32)),
        "directions_norm": cam.metadata["directions_norm"],
        "did_return": jnp.ones((n_cam, 1), dtype=bool),
        "is_lidar": jnp.zeros((n_cam, 1), dtype=bool),
    }
    lid_meta = {
        "sensor_idxs": lidar.metadata.get("sensor_idxs", jnp.ones((n_lidar, 1), dtype=jnp.int32)),
        "directions_norm": lidar.metadata["directions_norm"],
        "did_return": lidar.metadata["did_return"],
        "is_lidar": jnp.ones((n_lidar, 1), dtype=bool),
    }
    def _norm(b: RayBundle, meta: dict) -> RayBundle:
        n = b.origins.shape[0]
        return b.replace(
            metadata=meta,
            nears=b.nears if b.nears is not None else jnp.zeros((n, 1)),
            fars=b.fars if b.fars is not None else jnp.full((n, 1), 1e6),
            times=b.times if b.times is not None else jnp.zeros((n, 1)),
        )

    return tree_cat([_norm(cam, cam_meta), _norm(lidar, lid_meta)], axis=0)
