"""Occupancy grid sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.model_components.occupancy_grid import (
    init_occupancy_grid,
    occupancy_at,
    update_occupancy_grid,
    volumetric_sampler,
)

AABB = jnp.array([[-10.0, -10.0, -10.0], [10.0, 10.0, 10.0]])


def _density_fn(pos):
    # dense ball at (5, 0, 0) radius 2
    inside = jnp.linalg.norm(pos - jnp.array([5.0, 0.0, 0.0]), axis=-1) < 2.0
    return jnp.where(inside, 10.0, 0.0)


def test_update_and_query():
    grid = init_occupancy_grid(AABB, resolution=32)
    grid = update_occupancy_grid(grid, _density_fn, jax.random.PRNGKey(0))
    assert bool(occupancy_at(grid, jnp.array([[5.0, 0.0, 0.0]]))[0])
    assert not bool(occupancy_at(grid, jnp.array([[-5.0, 0.0, 0.0]]))[0])
    assert not bool(occupancy_at(grid, jnp.array([[50.0, 0.0, 0.0]]))[0])  # outside aabb


def test_sampler_concentrates_on_occupied():
    grid = init_occupancy_grid(AABB, resolution=32)
    grid = update_occupancy_grid(grid, _density_fn, jax.random.PRNGKey(0))
    bundle = RayBundle(
        origins=jnp.zeros((2, 3)),
        directions=jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (2, 3)),
        pixel_area=jnp.ones((2, 1)) * 1e-4,
        nears=jnp.full((2, 1), 0.1),
        fars=jnp.full((2, 1), 9.9),
    )
    samples, occ = volumetric_sampler(bundle, grid, num_samples=64, key=jax.random.PRNGKey(1))
    mids = np.asarray((samples.frustums.starts + samples.frustums.ends) / 2)[..., 0]
    frac_in_ball = ((mids > 3.0) & (mids < 7.0)).mean()
    # samples should concentrate near the occupied ball (uniform would give ~34%)
    assert frac_in_ball > 0.6
    assert np.asarray(occ).any()
