"""Scene colliders: set near/far bounds on ray bundles.

TPU-native counterpart of `nerfstudio/model_components/scene_colliders.py`
(AABBBoxCollider 47, SphereCollider 133, NearFarCollider 169). Pure functions
RayBundle -> RayBundle.
"""

from __future__ import annotations

import jax.numpy as jnp

from neurad_tpu.core.math_utils import intersect_aabb
from neurad_tpu.core.structs import RayBundle


def near_far_collider(bundle: RayBundle, near_plane: float, far_plane: float) -> RayBundle:
    """Constant near/far (`scene_colliders.py:169-191`)."""
    ones = jnp.ones_like(bundle.pixel_area)
    return bundle.replace(nears=ones * near_plane, fars=ones * far_plane)


def aabb_box_collider(bundle: RayBundle, aabb: jnp.ndarray, near_plane: float = 0.0) -> RayBundle:
    """Ray/AABB intersection bounds (`scene_colliders.py:47-130`).

    aabb: [2, 3]. Rays that miss get near=far (zero-length integration domain).
    """
    flat = jnp.concatenate([aabb[0], aabb[1]])
    t_min, t_max = intersect_aabb(bundle.origins, bundle.directions, flat)
    nears = jnp.maximum(t_min, near_plane)[:, None]
    fars = jnp.maximum(t_max, nears[:, 0] + 1e-6)[:, None]
    return bundle.replace(nears=nears, fars=fars)


def sphere_collider(bundle: RayBundle, center: jnp.ndarray, radius: float, near_plane: float = 0.0) -> RayBundle:
    """Ray/sphere intersection bounds (`scene_colliders.py:133-166`)."""
    oc = bundle.origins - center
    b = jnp.sum(oc * bundle.directions, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius**2
    disc = jnp.clip(b * b - c, 0.0, None)
    sq = jnp.sqrt(disc)
    nears = jnp.clip(-b - sq, near_plane, None)[:, None]
    fars = jnp.maximum((-b + sq)[:, None], nears + 1e-6)
    return bundle.replace(nears=nears, fars=fars)
