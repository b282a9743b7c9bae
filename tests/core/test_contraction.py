"""Spatial distortion tests."""

import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import GaussiansStd
from neurad_tpu.fields.spatial_distortions import (
    scaled_scene_contraction,
    scaled_scene_contraction_gaussian,
    scene_contraction,
    scene_contraction_gaussian,
)


def test_identity_inside_unit_ball():
    x = jnp.array([[0.3, -0.2, 0.1]])
    np.testing.assert_allclose(scene_contraction(x), x, atol=1e-6)


def test_linf_bounded_by_2():
    x = jnp.array([[1000.0, 500.0, -900.0], [5.0, 0.0, 0.0]])
    y = scene_contraction(x, order=float("inf"))
    assert (jnp.abs(y) < 2.0).all()
    # direction along max-abs axis preserved
    np.testing.assert_allclose(y[1], [2.0 - 1.0 / 5.0, 0.0, 0.0], atol=1e-5)


def test_scaled_contraction_in_unit_cube():
    x = jnp.array([[1e6, -1e6, 3.0], [0.0, 0.0, 0.0]])
    y = scaled_scene_contraction(x, scale=100.0)
    assert (y >= 0.0).all() and (y <= 1.0).all()
    np.testing.assert_allclose(y[1], 0.5, atol=1e-6)


def test_gaussian_contraction_std_shrinks_outside():
    g = GaussiansStd(mean=jnp.array([[10.0, 0.0, 0.0]]), std=jnp.array([[1.0]]))
    out = scene_contraction_gaussian(g)
    assert out.std[0, 0] < 1.0
    # inside: untouched
    g_in = GaussiansStd(mean=jnp.array([[0.1, 0.0, 0.0]]), std=jnp.array([[1.0]]))
    out_in = scene_contraction_gaussian(g_in)
    np.testing.assert_allclose(out_in.std, 1.0, atol=1e-6)
    np.testing.assert_allclose(out_in.mean, g_in.mean, atol=1e-6)


def test_scaled_gaussian_matches_position_path():
    g = GaussiansStd(mean=jnp.array([[50.0, -20.0, 5.0]]), std=jnp.array([[0.5]]))
    out = scaled_scene_contraction_gaussian(g, scale=10.0)
    pos = scaled_scene_contraction(g.mean, scale=10.0)
    np.testing.assert_allclose(out.mean, pos, atol=1e-6)
