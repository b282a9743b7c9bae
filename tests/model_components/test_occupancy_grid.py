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


def test_march_mode_skips_empty_space():
    """mode='march' keeps only occupied bins (depth order), skipping empty
    space like nerfacc's marching (`ray_samplers.py:401-566`)."""
    from neurad_tpu.core.structs import RayBundle

    grid = init_occupancy_grid(AABB, resolution=32)
    grid = update_occupancy_grid(grid, _density_fn, jax.random.PRNGKey(0))
    n = 4
    bundle = RayBundle(
        origins=jnp.broadcast_to(jnp.array([-12.0, 0.0, 0.0]), (n, 3)),
        directions=jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 3)),
        pixel_area=jnp.full((n, 1), 1e-6),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        nears=jnp.full((n, 1), 0.1),
        fars=jnp.full((n, 1), 30.0),
        metadata={"directions_norm": jnp.ones((n, 1))},
    )
    samples, occ = volumetric_sampler(bundle, grid, num_samples=16, mode="march", march_candidates=256)
    pos = np.asarray(samples.frustums.get_positions())
    occupied_frac = float(np.asarray(occ).mean())
    # the density blob is around x~5 (world); samples should cluster there
    assert occupied_frac > 0.9, f"march kept empty bins: {occupied_frac}"
    mids = pos[0, :, 0]
    assert (np.abs(pos[0, :, 1:]) < 1e-3).all()
    # all selected samples inside the occupied region probed by occupancy_at
    inside = np.asarray(occupancy_at(grid, jnp.asarray(pos[0])))
    assert inside.mean() > 0.9
    # depth-ordered
    assert (np.diff(mids) >= -1e-5).all()
