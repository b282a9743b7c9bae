"""Gaussian densification strategies, fixed-capacity (MCMC) for TPU.

TPU-native counterpart of `nerfstudio/model_components/strategy.py` (ADMCMCStrategy
129 = upstream gsplat MCMCStrategy; ADDefaultStrategy's actor-aware pruning
100-120). The Default strategy reallocates parameter tensors every refine step
(`strategy.py:26-126`) — dynamic shapes, hostile to XLA. The MCMC strategy
(Kheradmand et al. 2024, 3DGS-MCMC) is reformulated here as a STATIC-shape
update: the gaussian count is pinned at `cap_max` from initialization and dead
gaussians (opacity < min) are *relocated* onto samples of live ones — a pure
(params, opt_state, rng) -> (params, opt_state) function run between train steps.
(The reference grows 5%/refine up to cap; starting at cap is equivalent by the
paper's construction and keeps every shape static.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_N_BINOM = 51  # max relocations per target, as in gsplat's compute_relocation


def _binom_table(n_max: int = _N_BINOM) -> np.ndarray:
    import math

    table = np.zeros((n_max, n_max), dtype=np.float32)
    for n in range(n_max):
        for k in range(n + 1):
            table[n, k] = math.comb(n, k)
    return table


_BINOMS = _binom_table()


def compute_relocation(
    opacities: jnp.ndarray, scales: jnp.ndarray, counts: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """New (opacity, scales) when `counts` gaussians land on each target
    (gsplat `compute_relocation` CUDA op; Eq. 9 of 3DGS-MCMC).

    opacities [N] in (0,1); scales [N,3] linear; counts [N] >= 1.
    """
    n = jnp.clip(counts, 1, _N_BINOM)
    new_opacity = 1.0 - (1.0 - opacities) ** (1.0 / n.astype(opacities.dtype))

    # gsplat relocation.cu: denom = sum_{i=1..n} sum_{k=0..i-1}
    #   C(i-1, k) * (-1)^k / sqrt(k+1) * new_o^{k+1};  scale *= old_o / denom
    k = jnp.arange(_N_BINOM, dtype=opacities.dtype)  # [K]
    a = ((-1.0) ** k / jnp.sqrt(k + 1.0))[None, :] * new_opacity[:, None] ** (k + 1.0)  # [G, K]
    binoms = jnp.asarray(_BINOMS)  # [I, K] with binoms[i-1, k] = C(i-1, k)
    s = a @ binoms.T  # [G, I]: s[:, i-1] = inner sum for i
    cum = jnp.cumsum(s, axis=-1)
    denom = jnp.take_along_axis(cum, (n - 1)[:, None], axis=-1)[:, 0]
    coeff = opacities / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    new_scales = scales * coeff[:, None]
    return new_opacity, new_scales


@dataclasses.dataclass(frozen=True)
class MCMCStrategyConfig:
    """MCMC settings (`models/splatad.py:186-200` config fields)."""

    cap_max: int = 1_000_000
    noise_lr: float = 5e4
    min_opacity: float = 0.005
    refine_start_iter: int = 500
    refine_stop_iter: int = 25_000
    refine_every: int = 100


def mcmc_relocate(
    rng: jax.Array,
    params: Dict[str, jnp.ndarray],
    opt_state_moments: Optional[Any],
    config: MCMCStrategyConfig,
    actor_bounds: Optional[jnp.ndarray] = None,
    n_actors: int = 0,
) -> Tuple[Dict[str, jnp.ndarray], Optional[Any]]:
    """Relocate dead gaussians onto opacity-weighted samples of live ones.

    params: dict with `means` [N,3], `scales` (log) [N,3], `quats` [N,4],
    `opacities` (logit) [N], feature arrays [N,...], `id` [N] (>= n_actors
    means static). Actor-aware: a relocated actor gaussian outside its actor box
    is clamped inside (counterpart of ADDefaultStrategy's box pruning,
    `strategy.py:100-120` — with fixed capacity we clamp instead of cull).

    opt_state_moments: optional pytree of per-param moment arrays (same leading N)
    to zero at relocated slots (the reference's optimizer surgery).
    """
    n = params["means"].shape[0]
    op = jax.nn.sigmoid(params["opacities"])
    dead = op < config.min_opacity
    alive_probs = jnp.where(dead, 0.0, op)
    alive_probs = alive_probs / jnp.clip(alive_probs.sum(), 1e-12, None)

    rng_t, rng_r = jax.random.split(rng)
    targets = jax.random.choice(rng_t, n, shape=(n,), p=alive_probs)  # [N] sampled live slots

    # per-target landing counts: itself + number of dead slots pointing at it
    landed = jnp.zeros(n, dtype=jnp.int32).at[targets].add(dead.astype(jnp.int32))
    counts = 1 + landed

    new_op_all, new_scales_all = compute_relocation(op, jnp.exp(params["scales"]), counts)

    def relocated(name, arr):
        src = arr[targets]
        return jnp.where(dead.reshape((-1,) + (1,) * (arr.ndim - 1)), src, arr)

    new_params = {k: relocated(k, v) for k, v in params.items()}
    # targets' updated opacity/scale apply to BOTH the target and its clones
    upd_op = jnp.where(landed > 0, new_op_all, op)  # shrink targets that got clones
    upd_scales = jnp.where((landed > 0)[:, None], new_scales_all, jnp.exp(params["scales"]))
    op_final = jnp.where(dead, new_op_all[targets], upd_op)
    scales_final = jnp.where(dead[:, None], new_scales_all[targets], upd_scales)
    new_params["opacities"] = jnp.log(jnp.clip(op_final, 1e-6, 1 - 1e-6)) - jnp.log1p(
        -jnp.clip(op_final, 1e-6, 1 - 1e-6)
    )
    new_params["scales"] = jnp.log(jnp.clip(scales_final, 1e-12, None))

    if actor_bounds is not None and n_actors > 0:
        ids = new_params["id"].astype(jnp.int32).reshape(-1)
        is_actor = ids < n_actors
        bounds = actor_bounds[jnp.clip(ids, 0, max(n_actors - 1, 0))]
        clamped = jnp.clip(new_params["means"], -bounds, bounds)
        new_params["means"] = jnp.where(is_actor[:, None], clamped, new_params["means"])

    if opt_state_moments is not None:
        zero_dead = lambda m: jnp.where(
            dead.reshape((-1,) + (1,) * (m.ndim - 1)), jnp.zeros_like(m), m
        )
        opt_state_moments = jax.tree.map(zero_dead, opt_state_moments)

    return new_params, opt_state_moments


def mcmc_add_noise(
    rng: jax.Array,
    params: Dict[str, jnp.ndarray],
    lr_means: float,
    config: MCMCStrategyConfig,
) -> Dict[str, jnp.ndarray]:
    """SGLD-style exploration noise on means, every step (gsplat MCMCStrategy
    `_add_noise`): noise ~ N(0, cov) * noise_lr * lr * opacity gate."""
    from neurad_tpu.ops.gaussians import quat_scale_to_covariance

    op = jax.nn.sigmoid(params["opacities"])
    # gate: near-dead gaussians wander, confident ones stay (sigmoid((min - o)*k))
    gate = jax.nn.sigmoid(-(op - config.min_opacity) * 100.0)
    cov = quat_scale_to_covariance(params["quats"], jnp.exp(params["scales"]))
    eps = jax.random.normal(rng, params["means"].shape)
    noise = jnp.einsum("nij,nj->ni", cov, eps) * (gate * config.noise_lr * lr_means)[:, None]
    return {**params, "means": params["means"] + noise}


def should_refine(step: int, config: MCMCStrategyConfig) -> bool:
    return (
        config.refine_start_iter < step < config.refine_stop_iter
        and step % config.refine_every == 0
    )
