"""Renderers: weighted reductions of per-sample quantities into per-ray outputs.

Counterpart of `nerfstudio/model_components/renderers.py` (FeatureRenderer 59,
RGBRenderer 93, AccumulationRenderer 322, DepthRenderer 353, NormalsRenderer 462).
Functional on top of `neurad_tpu.ops.rendering` (the nerfacc replacement).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from neurad_tpu.ops import rendering as R


def render_features(weights: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    """FeatureRenderer: Σ w·f (`renderers.py:59-90`)."""
    return R.accumulate_along_rays(weights, features)


def render_rgb(
    weights: jnp.ndarray,
    rgb: jnp.ndarray,
    background_color: Optional[jnp.ndarray] = None,
    accumulation: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """RGBRenderer with optional background composition (`renderers.py:93-319`)."""
    comp_rgb = R.accumulate_along_rays(weights, rgb)
    if background_color is not None:
        if accumulation is None:
            accumulation = R.accumulate_along_rays(weights)
        comp_rgb = comp_rgb + background_color * (1.0 - accumulation)
    return comp_rgb


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    """AccumulationRenderer: Σ w (`renderers.py:322-350`)."""
    return R.accumulate_along_rays(weights)


def render_depth(
    weights: jnp.ndarray, ray_samples_steps: jnp.ndarray, method: str = "median"
) -> jnp.ndarray:
    """DepthRenderer (`renderers.py:353-459`): 'median' or 'expected'.

    ray_samples_steps: [..., S, 1] midpoints (starts+ends)/2.
    """
    if method == "median":
        return R.render_depth_median(weights, ray_samples_steps)
    if method == "expected":
        return R.render_depth_expected(weights, ray_samples_steps)
    raise ValueError(f"unknown depth method {method}")


def render_normals(weights: jnp.ndarray, normals: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """NormalsRenderer (`renderers.py:462-489`)."""
    n = R.accumulate_along_rays(weights, normals)
    if normalize:
        n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8, None)
    return n


def render_sh(
    weights: jnp.ndarray, sh_coeffs: jnp.ndarray, directions: jnp.ndarray, levels: int
) -> jnp.ndarray:
    """SHRenderer (`renderers.py` SHRenderer): evaluate per-sample SH color at the
    ray direction, then weight-accumulate. sh_coeffs [..., S, levels^2 * 3]."""
    from neurad_tpu.ops.spherical_harmonics import components_from_spherical_harmonics

    basis = components_from_spherical_harmonics(levels, directions)  # [..., levels^2]
    coeffs = sh_coeffs.reshape(sh_coeffs.shape[:-1] + (levels**2, 3))
    rgb = jnp.einsum("...k,...kc->...c", basis[..., None, :].repeat(coeffs.shape[-3], -2), coeffs)
    rgb = jnp.clip(rgb + 0.5, 0.0, 1.0)
    return R.accumulate_along_rays(weights, rgb)


def render_uncertainty(weights: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """UncertaintyRenderer (`renderers.py` UncertaintyRenderer): Σ w·β."""
    return R.accumulate_along_rays(weights, betas)


def render_semantics(weights: jnp.ndarray, semantics: jnp.ndarray) -> jnp.ndarray:
    """SemanticRenderer (`renderers.py` SemanticRenderer): Σ w·logits."""
    return R.accumulate_along_rays(weights, semantics)
