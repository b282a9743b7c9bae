"""Scene bounding boxes (`nerfstudio/data/scene_box.py:30,95`)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SceneBox:
    """Axis-aligned scene box. `aabb`: [2, 3] = [(min xyz), (max xyz)]."""

    aabb: jnp.ndarray

    def get_diagonal_length(self) -> jnp.ndarray:
        diff = self.aabb[1] - self.aabb[0]
        return jnp.sqrt(jnp.sum(diff**2))

    def get_center(self) -> jnp.ndarray:
        return (self.aabb[0] + self.aabb[1]) / 2.0

    @staticmethod
    def get_normalized_positions(positions: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
        """Map positions into [0, 1]^3 w.r.t. the aabb (`scene_box.py:60-72`)."""
        aabb_lengths = aabb[1] - aabb[0]
        return (positions - aabb[0]) / aabb_lengths

    def within(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Bool mask of points inside the box (`scene_box.py:53-58`)."""
        return jnp.all((pts > self.aabb[0]) & (pts < self.aabb[1]), axis=-1)


@struct.dataclass
class OrientedBox:
    """Oriented box: rotation R [3,3], translation T [3], size S [3]
    (`scene_box.py:95-126`)."""

    R: jnp.ndarray
    T: jnp.ndarray
    S: jnp.ndarray

    def within(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Bool mask of points inside the oriented box."""
        local = (pts - self.T) @ self.R  # world -> box frame (R columns = box axes)
        half = self.S / 2.0
        return jnp.all((local > -half) & (local < half), axis=-1)
