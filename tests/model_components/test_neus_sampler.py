"""NeuS sampler + sample-merge tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.model_components.ray_samplers import (
    UNIFORM,
    merge_ray_samples_sorted,
    neus_sampler,
    spaced_sampler,
)


def _bundle(n=4):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 3)),
        pixel_area=jnp.full((n, 1), 1e-4),
        nears=jnp.full((n, 1), 0.5),
        fars=jnp.full((n, 1), 10.0),
    )


def test_merge_sorted():
    b = _bundle()
    a = spaced_sampler(b, 8, UNIFORM)
    c = spaced_sampler(b, 4, UNIFORM)
    merged = merge_ray_samples_sorted(a, c)
    starts = np.asarray(merged.frustums.starts[..., 0])
    assert starts.shape == (4, 12)
    assert (np.diff(starts, axis=-1) >= -1e-6).all()  # sorted per ray


def test_neus_sampler_concentrates_on_surface():
    # sphere SDF: surface at distance 5 along +x
    def sdf_fn(samples):
        pos = samples.frustums.get_positions()
        return (jnp.linalg.norm(pos - jnp.array([5.0, 0.0, 0.0]), axis=-1, keepdims=True) - 1.0)

    samples = neus_sampler(
        _bundle(), sdf_fn, num_samples=32, num_samples_importance=32, num_upsample_steps=4,
        key=jax.random.PRNGKey(0),
    )
    mids = np.asarray((samples.frustums.starts + samples.frustums.ends) / 2)[..., 0]
    assert mids.shape == (4, 64)
    near_surface = ((mids > 3.5) & (mids < 6.5)).mean()
    assert near_surface > 0.45  # uniform would give ~0.32
