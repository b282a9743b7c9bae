"""Volume-rendering primitives: transmittance weights + weighted accumulation.

TPU-native replacement for nerfacc's CUDA kernels
(`render_weight_from_density/alpha`, `accumulate_along_rays`; reference call sites
`nerfstudio/models/neurad.py:711-734`, `model_components/renderers.py:88-486`).

With fixed samples-per-ray (static shapes), the transmittance scan is a cumulative
product along the sample axis and accumulation is an einsum — both fuse into
adjacent elementwise work under XLA, so no Pallas kernel is needed here (the op is
a tiny fraction of the hashgrid+MLP cost). The nerfacc "packed" (ray-segment) mode
is unnecessary: we never use variable samples per ray.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def render_weights_from_density(densities: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """weights_i = (1 - exp(-σ_i δ_i)) · exp(-Σ_{j<i} σ_j δ_j).  [..., S, 1] -> [..., S, 1]."""
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    trans = jnp.cumsum(delta_density[..., :-1, :], axis=-2)
    trans = jnp.exp(-jnp.concatenate([jnp.zeros_like(trans[..., :1, :]), trans], axis=-2))
    return jnp.nan_to_num(alphas * trans)


def render_weights_from_alpha(alphas: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """weights_i = α_i · Π_{j<i}(1 - α_j). Returns (weights, transmittance[..., S+1, 1]).

    Matches nerfacc.render_weight_from_alpha as used at `models/neurad.py:717-723`.
    """
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[..., :1, :]), 1.0 - alphas + 1e-7], axis=-2), axis=-2
    )
    return alphas * trans[..., :-1, :], trans


def accumulate_along_rays(
    weights: jnp.ndarray, values: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Σ_i w_i · v_i along the sample axis (nerfacc.accumulate_along_rays).

    Args:
        weights: [..., S, 1]; values: [..., S, C] or None (accumulates weights).
    Returns: [..., C] (or [..., 1]).
    """
    if values is None:
        return jnp.sum(weights, axis=-2)
    return jnp.sum(weights * values, axis=-2)


def render_depth_expected(weights: jnp.ndarray, steps: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Expected depth Σ w·t / Σ w (`renderers.py` DepthRenderer 'expected')."""
    depth = accumulate_along_rays(weights, steps) / jnp.clip(accumulate_along_rays(weights), eps, None)
    lo = steps[..., 0, :]
    hi = steps[..., -1, :]
    return jnp.clip(depth, lo, hi)


def render_depth_median(weights: jnp.ndarray, steps: jnp.ndarray) -> jnp.ndarray:
    """Median depth: first step where cumulative weight >= 0.5
    (`renderers.py:353-420`, DepthRenderer 'median')."""
    cum = jnp.cumsum(weights[..., 0], axis=-1)  # [..., S]
    # index of first bin with cum >= 0.5 (clamped to valid range)
    idx = jnp.argmax(cum >= 0.5, axis=-1)
    hit = jnp.any(cum >= 0.5, axis=-1)
    idx = jnp.where(hit, idx, steps.shape[-2] - 1)
    return jnp.take_along_axis(steps[..., 0], idx[..., None], axis=-1)
