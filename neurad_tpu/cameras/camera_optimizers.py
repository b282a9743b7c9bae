"""Camera pose / velocity optimizers (flax modules over lie-group deltas).

TPU-native counterpart of `nerfstudio/cameras/camera_optimizers.py`
(CameraOptimizer 108, ScaledCameraOptimizer 359, CameraVelocityOptimizer 242).
Learnable per-sensor-image 6-dof tangent deltas; application to ray bundles and
sensor-to-world matrices is pure and static-shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from neurad_tpu.core.lie import exp_map_SE3, exp_map_SO3xR3
from neurad_tpu.core.structs import RayBundle


class CameraOptimizer(nn.Module):
    """Learnable per-camera pose correction (`camera_optimizers.py:108-240`).

    mode: 'off' | 'SO3xR3' | 'SE3'. `weights` scales tangent axes before the exp map
    (the ScaledCameraOptimizer subclass behavior, `camera_optimizers.py:359-379`).
    `non_trainable_camera_indices` (e.g. eval sensors) get identity corrections.
    """

    num_cameras: int
    mode: str = "off"  # 'off' | 'SO3xR3' | 'SE3'
    weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    trans_l2_penalty: Tuple[float, ...] = (1e-2, 1e-2, 1e-2)
    rot_l2_penalty: float = 1e-3
    non_trainable_camera_indices: Optional[Tuple[int, ...]] = None

    def setup(self):
        if self.mode != "off":
            self.pose_adjustment = self.param(
                "pose_adjustment", nn.initializers.zeros, (self.num_cameras, 6)
            )

    def _adjustment(self) -> jnp.ndarray:
        adj = self.pose_adjustment * jnp.asarray(self.weights)
        if self.non_trainable_camera_indices:
            mask = jnp.ones((self.num_cameras, 1))
            mask = mask.at[jnp.asarray(self.non_trainable_camera_indices), :].set(0.0)
            adj = adj * mask
        return adj

    def __call__(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Correction matrices [R, 3, 4] for camera indices [R] (`camera_optimizers.py:139-172`)."""
        if self.mode == "off":
            eye = jnp.eye(4)[:3, :4]
            return jnp.broadcast_to(eye, indices.shape + (3, 4))
        adj = self._adjustment()[indices.reshape(-1)]
        if self.mode == "SO3xR3":
            return exp_map_SO3xR3(adj)
        if self.mode == "SE3":
            return exp_map_SE3(adj)
        raise ValueError(f"unknown camera optimizer mode {self.mode}")

    def apply_to_raybundle(self, bundle: RayBundle) -> RayBundle:
        """Rotate directions and translate origins (`camera_optimizers.py:173-182`)."""
        if self.mode == "off":
            return bundle
        corr = self(bundle.camera_indices[..., 0])
        origins = bundle.origins + corr[..., :3, 3]
        directions = jnp.einsum("...ij,...j->...i", corr[..., :3, :3], bundle.directions)
        return bundle.replace(origins=origins, directions=directions)

    def apply_to_camera_pose(self, sensor_to_world: jnp.ndarray, camera_idx: jnp.ndarray) -> jnp.ndarray:
        """Correct a [.., 3, 4] sensor-to-world matrix (`camera_optimizers.py:184-209`):
        rotation applied to the world-frame axes, translation added independently."""
        if self.mode == "off":
            return sensor_to_world
        adj = self(jnp.atleast_1d(camera_idx))
        rot = adj[..., :3, :3] @ sensor_to_world[..., :3, :3]
        trans = sensor_to_world[..., :3, 3:] + adj[..., :3, 3:]
        return jnp.concatenate([rot, trans], axis=-1)

    def regularization_loss(self) -> jnp.ndarray:
        """Per-axis trans L1/L2 + rot L2 penalty (`camera_optimizers.py:209-217,380+`)."""
        if self.mode == "off":
            return jnp.zeros(())
        adj = self._adjustment()
        trans_pen = jnp.asarray(self.trans_l2_penalty)
        trans = jnp.mean(jnp.sum(jnp.abs(adj[:, :3]) * trans_pen, axis=-1))
        rot = jnp.mean(jnp.linalg.norm(adj[:, 3:], axis=-1)) * self.rot_l2_penalty
        return trans + rot

    def metrics(self) -> dict:
        if self.mode == "off":
            return {}
        adj = self._adjustment()
        trans = jnp.linalg.norm(adj[:, :3], axis=-1)
        rot = jnp.linalg.norm(adj[:, 3:], axis=-1)
        return {
            "camera_opt_translation_max": trans.max(),
            "camera_opt_translation_mean": trans.mean(),
            "camera_opt_rotation_mean": jnp.rad2deg(rot.mean()),
            "camera_opt_rotation_max": jnp.rad2deg(rot.max()),
        }


class CameraVelocityOptimizer(nn.Module):
    """Learnable per-image velocity deltas for rolling-shutter compensation
    (`camera_optimizers.py:242-334`); used by SplatAD.
    """

    num_cameras: int
    num_unique_cameras: int
    enabled: bool = False
    zero_initial_velocities: bool = False
    linear_l2_penalty: float = 1e-6
    angular_l2_penalty: float = 1e-5

    def setup(self):
        if self.enabled:
            self.linear_velocity_adjustment = self.param(
                "linear_velocity_adjustment",
                lambda key, shape: (jnp.zeros(shape)),
                (self.num_cameras, 3),
            )
            self.angular_velocity_adjustment = self.param(
                "angular_velocity_adjustment", nn.initializers.zeros, (self.num_cameras, 3)
            )
            self.time_to_center_pixel_adjustment = self.param(
                "time_to_center_pixel_adjustment", nn.initializers.zeros, (self.num_unique_cameras,)
            )

    def get_linear_velocity(self, base_velocity: jnp.ndarray, camera_idx: jnp.ndarray) -> jnp.ndarray:
        base = jnp.zeros_like(base_velocity) if self.zero_initial_velocities else base_velocity
        if not self.enabled:
            return base
        return base + self.linear_velocity_adjustment[camera_idx]

    def get_angular_velocity(self, base_velocity: jnp.ndarray, camera_idx: jnp.ndarray) -> jnp.ndarray:
        base = jnp.zeros_like(base_velocity) if self.zero_initial_velocities else base_velocity
        if not self.enabled:
            return base
        return base + self.angular_velocity_adjustment[camera_idx]

    def get_time_to_center_pixel_adjustment(self, sensor_idx: jnp.ndarray) -> jnp.ndarray:
        if not self.enabled:
            return jnp.zeros_like(sensor_idx, dtype=jnp.float32)
        return self.time_to_center_pixel_adjustment[sensor_idx]

    def regularization_loss(self) -> jnp.ndarray:
        if not self.enabled:
            return jnp.zeros(())
        lin = jnp.mean(jnp.sum(self.linear_velocity_adjustment**2, axis=-1)) * self.linear_l2_penalty
        ang = jnp.mean(jnp.sum(self.angular_velocity_adjustment**2, axis=-1)) * self.angular_l2_penalty
        return lin + ang
