"""Math tests (mirrors reference tests/utils/test_aabb_intersection.py etc.)."""

import jax.numpy as jnp
import numpy as np

from neurad_tpu.core import math_utils as mu


def test_intersect_aabb_hit_and_miss():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    origins = jnp.array([[-5.0, 0, 0], [-5.0, 5.0, 0]])
    dirs = jnp.array([[1.0, 0, 0], [1.0, 0, 0]])
    tmin, tmax = mu.intersect_aabb(origins, dirs, aabb)
    np.testing.assert_allclose(tmin[0], 4.0, atol=1e-5)
    np.testing.assert_allclose(tmax[0], 6.0, atol=1e-5)
    assert tmin[1] == 1e10 and tmax[1] == 1e10  # miss


def test_intersect_aabb_inside_origin():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    tmin, tmax = mu.intersect_aabb(jnp.array([[0.0, 0, 0]]), jnp.array([[0.0, 0, 1.0]]), aabb)
    np.testing.assert_allclose(tmin[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(tmax[0], 1.0, atol=1e-5)


def test_intersect_obb_matches_aabb_when_identity():
    aabb = jnp.array([-1.0, -2, -3, 1, 2, 3])
    origins = jnp.array([[-5.0, 0.1, 0.2]])
    dirs = jnp.array([[1.0, 0, 0]])
    tmin_a, tmax_a = mu.intersect_aabb(origins, dirs, aabb)
    tmin_o, tmax_o = mu.intersect_obb(
        origins, dirs, jnp.eye(3), jnp.zeros(3), jnp.array([2.0, 4.0, 6.0])
    )
    np.testing.assert_allclose(tmin_a, tmin_o, atol=1e-5)
    np.testing.assert_allclose(tmax_a, tmax_o, atol=1e-5)


def test_power_fn_roundtrip():
    x = jnp.linspace(0.0, 10.0, 50)
    for lam in [-1.5, -1.0, 0.0, 1.0]:
        y = mu.power_fn(x, lam)
        x2 = mu.inv_power_fn(y, lam)
        np.testing.assert_allclose(x, x2, atol=1e-3, rtol=1e-3)


def test_power_fn_monotone():
    x = jnp.linspace(0.0, 100.0, 100)
    y = mu.power_fn(x, -1.0)
    assert (jnp.diff(y) > 0).all()


def test_erf_approx_range():
    x = jnp.linspace(-3, 3, 50)
    y = mu.erf_approx(x)
    assert (jnp.abs(y) <= 1.0).all()
    np.testing.assert_allclose(mu.erf_approx(jnp.array(0.0)), 0.0, atol=1e-6)


def test_chamfer_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(100, 3)), dtype=jnp.float32)
    d = mu.chamfer_distance(pts, pts)
    np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_chamfer_distance_known_value():
    a = jnp.array([[0.0, 0, 0]])
    b = jnp.array([[1.0, 0, 0]])
    d = mu.chamfer_distance(a, b)
    np.testing.assert_allclose(d, 2.0, atol=1e-5)  # 1.0 each direction


def test_chamfer_distance_masked():
    a = jnp.array([[0.0, 0, 0], [100.0, 0, 0]])
    mask = jnp.array([True, False])
    b = jnp.array([[1.0, 0, 0]])
    d = mu.chamfer_distance(a, b, pred_mask=mask)
    np.testing.assert_allclose(d, 2.0, atol=1e-5)
