"""Renderer tests (mirrors reference tests/model_components/test_renderers.py)."""

import jax.numpy as jnp
import numpy as np

from neurad_tpu.model_components import renderers
from neurad_tpu.ops import rendering as R


def test_render_rgb_with_background():
    w = jnp.zeros((4, 8, 1))  # empty space
    rgb = jnp.ones((4, 8, 3)) * 0.5
    bg = jnp.array([1.0, 0.0, 0.0])
    out = renderers.render_rgb(w, rgb, background_color=bg)
    np.testing.assert_allclose(out, jnp.broadcast_to(bg, (4, 3)), atol=1e-6)


def test_render_rgb_opaque():
    w = jnp.zeros((2, 8, 1)).at[:, 0].set(1.0)
    rgb = jnp.ones((2, 8, 3)) * jnp.arange(8).reshape(1, 8, 1) / 8.0
    out = renderers.render_rgb(w, rgb, background_color=jnp.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_weights_from_density_matches_alpha_path():
    dens = jnp.abs(jnp.sin(jnp.arange(24, dtype=jnp.float32))).reshape(2, 12, 1)
    deltas = jnp.full((2, 12, 1), 0.25)
    w_d = R.render_weights_from_density(dens, deltas)
    alphas = 1.0 - jnp.exp(-dens * deltas)
    w_a, _ = R.render_weights_from_alpha(alphas)
    np.testing.assert_allclose(w_d, w_a, atol=1e-4)


def test_depth_median_and_expected():
    # all weight on sample 3
    w = jnp.zeros((2, 8, 1)).at[:, 3].set(1.0)
    steps = jnp.broadcast_to(jnp.arange(8.0).reshape(1, 8, 1), (2, 8, 1))
    d_med = renderers.render_depth(w, steps, "median")
    d_exp = renderers.render_depth(w, steps, "expected")
    np.testing.assert_allclose(d_med[:, 0], 3.0, atol=1e-5)
    np.testing.assert_allclose(d_exp[:, 0], 3.0, atol=1e-4)


def test_depth_median_no_hit_falls_to_last():
    w = jnp.zeros((1, 8, 1))
    steps = jnp.arange(8.0).reshape(1, 8, 1)
    d = renderers.render_depth(w, steps, "median")
    np.testing.assert_allclose(d[:, 0], 7.0, atol=1e-5)


def test_accumulation():
    w = jnp.full((3, 16, 1), 1.0 / 16)
    acc = renderers.render_accumulation(w)
    np.testing.assert_allclose(acc, 1.0, atol=1e-5)


def test_render_normals_normalized():
    w = jnp.full((2, 4, 1), 0.25)
    n = jnp.broadcast_to(jnp.array([1.0, 1.0, 0.0]), (2, 4, 3))
    out = renderers.render_normals(w, n)
    np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
