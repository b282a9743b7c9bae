"""Lie-group exponential maps for camera-pose deltas.

Counterpart of `nerfstudio/cameras/lie_groups.py` (exp_map_SO3xR3, exp_map_SE3),
used by camera optimizers. Batched + differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def _so3_exp(log_rot: jnp.ndarray, eps: float = 1e-4):
    theta2 = jnp.sum(log_rot**2, axis=-1)
    theta = jnp.sqrt(jnp.clip(theta2, eps**2, None))
    small = theta2 < eps**2
    # Taylor fallbacks for small angles.
    sin_t_over_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    one_minus_cos_over_t2 = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    k = _skew(log_rot)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), k.shape)
    r = eye + sin_t_over_t[..., None, None] * k + one_minus_cos_over_t2[..., None, None] * (k @ k)
    return r, k, theta2, sin_t_over_t, one_minus_cos_over_t2


def exp_map_SO3xR3(tangent: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (t, log_rot) -> [..., 3, 4]: rotation exp + raw translation
    (`lie_groups.py:23-40`)."""
    t = tangent[..., :3]
    r, *_ = _so3_exp(tangent[..., 3:6])
    return jnp.concatenate([r, t[..., None]], axis=-1)


def exp_map_SE3(tangent: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] SE(3) exponential -> [..., 3, 4] (`lie_groups.py:43-76`)."""
    t = tangent[..., :3]
    log_rot = tangent[..., 3:6]
    r, k, theta2, _, one_minus_cos_over_t2 = _so3_exp(log_rot)
    theta = jnp.sqrt(jnp.clip(theta2, 1e-8, None))
    small = theta2 < 1e-8
    # V = I + (1-cos)/theta^2 K + (theta - sin)/theta^3 K^2
    a = one_minus_cos_over_t2
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), k.shape)
    v = eye + a[..., None, None] * k + b[..., None, None] * (k @ k)
    vt = (v @ t[..., None])
    return jnp.concatenate([r, vt], axis=-1)
