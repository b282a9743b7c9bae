"""Scene collider tests."""

import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.model_components.scene_colliders import (
    aabb_box_collider,
    near_far_collider,
    sphere_collider,
)


def _bundle():
    return RayBundle(
        origins=jnp.array([[-5.0, 0.0, 0.0], [0.0, 10.0, 0.0]]),
        directions=jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]),
        pixel_area=jnp.ones((2, 1)),
    )


def test_near_far():
    b = near_far_collider(_bundle(), 0.5, 100.0)
    np.testing.assert_allclose(np.asarray(b.nears)[:, 0], 0.5)
    np.testing.assert_allclose(np.asarray(b.fars)[:, 0], 100.0)


def test_aabb():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    b = aabb_box_collider(_bundle(), aabb)
    # first ray hits the box at t=4..6; second misses entirely
    np.testing.assert_allclose(float(b.nears[0, 0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(b.fars[0, 0]), 6.0, atol=1e-5)


def test_sphere():
    b = sphere_collider(_bundle(), jnp.zeros(3), 2.0)
    np.testing.assert_allclose(float(b.nears[0, 0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(float(b.fars[0, 0]), 7.0, atol=1e-5)
