"""Spatial distortions: MipNeRF-360 scene contraction, ZipNeRF-linearized for gaussians.

Counterpart of `nerfstudio/field_components/spatial_distortions.py:42-141`. These are
pure functions (not modules): contraction has no parameters.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from neurad_tpu.core.structs import GaussiansStd


def _norm(x: jnp.ndarray, order: Optional[float]) -> jnp.ndarray:
    if order is None or order == 2:
        return jnp.linalg.norm(x, axis=-1, keepdims=True)
    if order == jnp.inf or order == float("inf"):
        return jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return jnp.sum(jnp.abs(x) ** order, axis=-1, keepdims=True) ** (1.0 / order)


def scene_contraction(positions: jnp.ndarray, order: Optional[float] = float("inf")) -> jnp.ndarray:
    """MipNeRF-360 contraction: identity inside unit ball, 2 - 1/||x|| outside
    (`spatial_distortions.py:80-83`). L_inf order contracts to a cube of side 4."""
    mag = _norm(positions, order)
    clamped = jnp.clip(mag, 1.0, None)
    return jnp.where(mag < 1, positions, (2.0 - 1.0 / clamped) * (positions / clamped))


def scene_contraction_gaussian(g: GaussiansStd, order: Optional[float] = float("inf")) -> GaussiansStd:
    """ZipNeRF-style linearized contraction of isotropic gaussians
    (`spatial_distortions.py:104-115`): std scaled by ((2|x|-1)^(1/3)/|x|)^2 outside."""
    mag = _norm(g.mean, order)
    mask = mag < 1
    clamped = jnp.clip(mag, 1.0, None)
    mean = jnp.where(mask, g.mean, (2.0 - 1.0 / clamped) * (g.mean / clamped))
    std_scaling = ((2.0 * clamped - 1.0) ** (1.0 / 3.0) / clamped) ** 2
    std = jnp.where(mask, g.std, g.std * std_scaling)
    return GaussiansStd(mean=mean, std=std)


def scaled_scene_contraction(
    positions: jnp.ndarray, scale: float, order: Optional[float] = float("inf"), normalize: bool = True
) -> jnp.ndarray:
    """`ScaledSceneContraction` (`spatial_distortions.py:118-141`): pre-scale, contract,
    then map the [-2, 2] cube into [0, 1] for hashgrid lookup."""
    x = scene_contraction(positions / scale, order)
    if normalize:
        x = (x + 2.0) / 4.0
    return x


def scaled_scene_contraction_gaussian(
    g: GaussiansStd, scale: float, order: Optional[float] = float("inf"), normalize: bool = True
) -> GaussiansStd:
    g = GaussiansStd(mean=g.mean / scale, std=g.std / scale)
    g = scene_contraction_gaussian(g, order)
    if normalize:
        g = GaussiansStd(mean=(g.mean + 2.0) / 4.0, std=g.std / 4.0)
    return g
