"""Dynamic actor trajectories: learnable, differentiable rigid-body tracks.

TPU-native counterpart of `nerfstudio/model_components/dynamic_actors.py`
(DynamicActors 43, buffers 108-170, get_boxes2world 251-268, editing 181-249).
Static trajectory data (timestamps, presence mask, sizes, flags) lives in numpy
arrays on the module — baked as XLA constants at trace time — while the learnable
positions/rotations(6d)/velocities are flax params initialized from that data.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core import poses as pose_utils


@dataclasses.dataclass(frozen=True)
class ActorData:
    """Immutable trajectory data extracted from a dataparser (numpy, host-side)."""

    unique_timestamps: np.ndarray  # [T] sorted
    poses: np.ndarray  # [T, A, 4, 4]
    present: np.ndarray  # [T, A] bool
    sizes: np.ndarray  # [A, 3] wlh
    symmetric: np.ndarray  # [A] bool
    deformable: np.ndarray  # [A] bool
    vel_linear: np.ndarray  # [T, A, 3]
    vel_angular: np.ndarray  # [T, A, 3]

    @property
    def n_actors(self) -> int:
        return self.poses.shape[1]

    @property
    def n_times(self) -> int:
        return self.poses.shape[0]


def actor_data_from_trajectories(trajectories: List[dict]) -> ActorData:
    """Build ActorData from dataparser trajectory dicts (`dynamic_actors.py:108-160`).

    Each dict: {poses [Ti,4,4], timestamps [Ti], dims [3], symmetric, deformable,
    optional linear_velocities_global / angular_velocities_local [Ti,3]}.
    Missing timestamps are filled with the nearest pose (marked not-present).
    """
    all_ts = sorted({float(t) for traj in trajectories for t in np.asarray(traj["timestamps"]).reshape(-1)})
    unique_timestamps = np.asarray(all_ts, dtype=np.float64)
    n_times, n_actors = len(unique_timestamps), len(trajectories)

    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (n_times, n_actors, 4, 4)).copy()
    present = np.zeros((n_times, n_actors), dtype=bool)
    sizes = np.zeros((n_actors, 3), dtype=np.float32)
    symmetric = np.zeros((n_actors,), dtype=bool)
    deformable = np.zeros((n_actors,), dtype=bool)
    vel_linear = np.zeros((n_times, n_actors, 3), dtype=np.float32)
    vel_angular = np.zeros((n_times, n_actors, 3), dtype=np.float32)

    for a, traj in enumerate(trajectories):
        sizes[a] = np.asarray(traj["dims"], dtype=np.float32)
        symmetric[a] = bool(traj["symmetric"])
        deformable[a] = bool(traj["deformable"])
        traj_ts = np.asarray(traj["timestamps"], dtype=np.float64).reshape(-1)
        traj_poses = np.asarray(traj["poses"], dtype=np.float32)
        for ti, t in enumerate(unique_timestamps):
            diff = np.abs(traj_ts - t)
            j = int(diff.argmin())
            poses[ti, a] = traj_poses[j]
            if diff[j] < 1e-4:
                present[ti, a] = True
                if "linear_velocities_global" in traj:
                    vel_linear[ti, a] = np.asarray(traj["linear_velocities_global"])[j, :3]
                if "angular_velocities_local" in traj:
                    vel_angular[ti, a] = np.asarray(traj["angular_velocities_local"])[j, :3]

    return ActorData(
        unique_timestamps=unique_timestamps,
        poses=poses,
        present=present,
        sizes=sizes,
        symmetric=symmetric,
        deformable=deformable,
        vel_linear=vel_linear,
        vel_angular=vel_angular,
    )


def empty_actor_data() -> ActorData:
    """Zero-actor placeholder (static scenes)."""
    return ActorData(
        unique_timestamps=np.array([0.0, 1.0]),
        poses=np.broadcast_to(np.eye(4, dtype=np.float32), (2, 0, 4, 4)).copy(),
        present=np.zeros((2, 0), dtype=bool),
        sizes=np.zeros((0, 3), dtype=np.float32),
        symmetric=np.zeros((0,), dtype=bool),
        deformable=np.zeros((0,), dtype=bool),
        vel_linear=np.zeros((2, 0, 3), dtype=np.float32),
        vel_angular=np.zeros((2, 0, 3), dtype=np.float32),
    )


@dataclasses.dataclass(frozen=True)
class ActorEdits:
    """Interactive actor edits applied at render time (`dynamic_actors.py:181-249`).

    Static python floats — changing them retriggers a (cached) trace.
    """

    lateral: float = 0.0
    longitudinal: float = 0.0
    rotation: float = 0.0
    height: float = 0.0
    index: int = -1  # -1 = all actors


def edit_boxes2world(boxes2world: jnp.ndarray, edits: ActorEdits, n_actors: int) -> jnp.ndarray:
    """Apply lateral/longitudinal/height shifts (in box frame) + yaw rotation
    to [Q, A, 4, 4] boxes (`dynamic_actors.py:181-249`).

    Edit values may be python floats (static — zero edits short-circuit) or
    traced scalars (the viewer passes slider values as array args so moving a
    slider does NOT retrigger compilation). `index` is always static."""
    vals = (edits.lateral, edits.longitudinal, edits.rotation, edits.height)
    static_vals = all(isinstance(v, (int, float)) for v in vals)
    if static_vals and all(v == 0.0 for v in vals):
        return boxes2world
    if edits.index < 0:
        sel = jnp.ones((n_actors,), dtype=bool)
    else:
        sel = jnp.zeros((n_actors,), dtype=bool).at[min(edits.index, n_actors - 1)].set(True)

    shift = jnp.stack(
        [jnp.asarray(v, jnp.float32) for v in (edits.lateral, edits.longitudinal, edits.height)]
        + [jnp.asarray(1.0)]
    )
    new_t = boxes2world @ shift  # [Q, A, 4]
    b2w = jnp.where(sel[None, :, None], new_t, boxes2world[..., 3])
    out = boxes2world.at[..., 3].set(b2w)

    if not (static_vals and edits.rotation == 0.0):
        c, s = jnp.cos(jnp.asarray(edits.rotation)), jnp.sin(jnp.asarray(edits.rotation))
        zero, one = jnp.zeros(()), jnp.ones(())
        yaw = jnp.stack([
            jnp.stack([c, -s, zero]), jnp.stack([s, c, zero]), jnp.stack([zero, zero, one])
        ])
        rotated = jnp.einsum("ij,qajk->qaik", yaw, out[..., :3, :3])
        new_rot = jnp.where(sel[None, :, None, None], rotated, out[..., :3, :3])
        out = out.at[..., :3, :3].set(new_rot)
    return out


class DynamicActors(nn.Module):
    """Learnable actor trajectory module (`dynamic_actors.py:43-300`).

    Params (all initialized from `data`): `actor_positions` [T,A,3],
    `actor_rotations_6d` [T,A,6], `actor_vel_linear`/`actor_vel_angular` [T,A,3].
    """

    data: ActorData
    optimize_trajectories: bool = True
    actor_bbox_padding: Tuple[float, float, float] = (0.25, 0.25, 0.1)

    @property
    def n_actors(self) -> int:
        return self.data.n_actors

    def setup(self):
        poses = jnp.asarray(self.data.poses)
        init_pos = poses[..., :3, 3]
        init_rot6d = pose_utils.rotmat_to_6d(poses[..., :3, :3])
        self.actor_positions = self.param("actor_positions", lambda _: init_pos)
        self.actor_rotations_6d = self.param("actor_rotations_6d", lambda _: init_rot6d)
        self.actor_vel_linear = self.param("actor_vel_linear", lambda _: jnp.asarray(self.data.vel_linear))
        self.actor_vel_angular = self.param("actor_vel_angular", lambda _: jnp.asarray(self.data.vel_angular))

    def actor_bounds(self) -> jnp.ndarray:
        """Half-sizes + padding [A, 3] (`dynamic_actors.py:106`)."""
        return jnp.asarray(self.data.sizes) / 2.0 + jnp.asarray(self.actor_bbox_padding)

    def __call__(self, query_times: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.get_boxes2world(query_times)

    def get_boxes2world(
        self, query_times: jnp.ndarray, edits: Optional[ActorEdits] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Differentiable 6D-interpolated actor poses at query times
        (`dynamic_actors.py:251-268`).

        Args:
            query_times: [Q] (or [Q,1]).
        Returns:
            boxes2world [Q, A, 4, 4], valid [Q, A] bool.
        """
        pos = self.actor_positions
        rot6d = self.actor_rotations_6d
        if not self.optimize_trajectories:
            pos = jnp.asarray(self.data.poses[..., :3, 3])
            rot6d = pose_utils.rotmat_to_6d(jnp.asarray(self.data.poses[..., :3, :3]))

        poses9d = jnp.concatenate([rot6d, pos], axis=-1)  # [T, A, 9]
        # interpolate_trajectories_6d expects [A, T, 9]
        interp, valid = pose_utils.interpolate_trajectories_6d(
            jnp.swapaxes(poses9d, 0, 1),
            jnp.asarray(self.data.unique_timestamps, dtype=jnp.float32),
            query_times,
            pose_valid_mask=jnp.asarray(self.data.present),
        )  # [Q, A, 9]
        rot = pose_utils.rot6d_to_rotmat(interp[..., :6])
        boxes2world = jnp.concatenate([rot, interp[..., 6:9, None]], axis=-1)  # [Q, A, 3, 4]
        boxes2world = pose_utils.to4x4(boxes2world)
        if edits is not None and self.n_actors > 0:
            boxes2world = edit_boxes2world(boxes2world, edits, self.n_actors)
        return boxes2world, valid

    def get_velocities(self, query_times: jnp.ndarray) -> jnp.ndarray:
        """Lerped (linear, angular) velocities [Q, A, 6] (`dynamic_actors.py:270-276`)."""
        vels = jnp.concatenate([self.actor_vel_linear, self.actor_vel_angular], axis=-1)
        return pose_utils.interpolate_velocities(
            vels, jnp.asarray(self.data.unique_timestamps, dtype=jnp.float32), query_times
        )
