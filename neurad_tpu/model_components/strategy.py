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


# ---------------------------------------------------------------------------
# ADDefaultStrategy (`nerfstudio/model_components/strategy.py:18-126`), fixed
# capacity: the gaussian arrays never change shape. Dead slots are encoded
# in-band as zero-radius, zero-opacity gaussians (log-scale DEAD_SCALE,
# opacity logit DEAD_OPACITY) — the rasterizer's radius>0 and alpha>1/255
# gates already skip them, so rendering needs no alive-mask plumbing. Grow
# (duplicate/split) allocates from dead slots by gradient priority; prune
# returns slots to the dead pool.
# ---------------------------------------------------------------------------

DEAD_SCALE = -20.0  # log-scale of a dead slot (radius underflows to 0)
DEAD_OPACITY = -15.0  # opacity logit of a dead slot (sigmoid ~ 3e-7)
_ALIVE_SCALE_THRESH = -19.0


@dataclasses.dataclass(frozen=True)
class DefaultStrategyConfig:
    """gsplat DefaultStrategy knobs (absgrad variant, reference defaults)."""

    prune_opa: float = 0.005
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    prune_scale3d: float = 0.1
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    reset_every: int = 3_000
    refine_every: int = 100
    pause_refine_after_reset: int = 0
    # static cap on grows per refine (fixed-shape top-k allocation)
    max_grow_per_refine: int = 1 << 16
    revised_opacity: bool = False


def alive_mask(params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """[N] bool: which capacity slots hold real gaussians."""
    return params["scales"].max(axis=-1) > _ALIVE_SCALE_THRESH


def kill_slots(params: Dict[str, jnp.ndarray], dead: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Mark `dead` slots as free capacity (in-band encoding)."""
    p = dict(params)
    p["scales"] = jnp.where(dead[:, None], DEAD_SCALE, params["scales"])
    p["opacities"] = jnp.where(dead, DEAD_OPACITY, params["opacities"])
    return p


def should_refine_default(step: int, config: DefaultStrategyConfig) -> bool:
    return (
        config.refine_start_iter < step < config.refine_stop_iter
        and step % config.refine_every == 0
        and step % config.reset_every >= config.pause_refine_after_reset
    )


def reset_opacities(params: Dict[str, jnp.ndarray], config: DefaultStrategyConfig) -> Dict[str, jnp.ndarray]:
    """`reset_opa` every reset_every steps: clamp opacity to 2*prune_opa."""
    alive = alive_mask(params)
    cap = jnp.log(2.0 * config.prune_opa) - jnp.log1p(-2.0 * config.prune_opa)
    new_op = jnp.minimum(params["opacities"], cap)
    return {**params, "opacities": jnp.where(alive, new_op, params["opacities"])}


def default_refine(
    rng: jax.Array,
    params: Dict[str, jnp.ndarray],
    grad2d_avg: jnp.ndarray,
    config: DefaultStrategyConfig,
    scene_scale: float,
    step: int,
    actor_bounds: Optional[jnp.ndarray] = None,
    n_actors: int = 0,
    opt_state_moments: Optional[Any] = None,
) -> Tuple[Dict[str, jnp.ndarray], Optional[Any]]:
    """One grow+prune refine (gsplat `_grow_gs`/`_prune_gs` + the AD additions
    of `strategy.py:80-126`), with every shape static.

    params: `means` [N,3] (actor gaussians in box frame), `scales` log [N,3],
    `quats` [N,4], `opacities` logit [N], feature arrays [N,...], `id` [N].
    grad2d_avg: [N] running mean of screen-space positional gradient norms
    (the absgrad criterion).
    """
    from neurad_tpu.ops.gaussians import quat_scale_to_covariance

    n = params["means"].shape[0]
    alive = alive_mask(params)
    op = jax.nn.sigmoid(params["opacities"])
    scales_lin = jnp.exp(params["scales"])

    # ---- prune (`_prune_gs`)
    prune = alive & (op < config.prune_opa)
    if step > config.reset_every:
        prune = prune | (alive & (scales_lin.max(-1) > config.prune_scale3d * scene_scale))

    ids = params["id"].astype(jnp.int32).reshape(-1)
    if actor_bounds is not None and n_actors > 0:
        is_actor = ids < n_actors
        b = actor_bounds[jnp.clip(ids, 0, n_actors - 1)]
        outside = jnp.any(jnp.abs(params["means"]) > b, axis=-1)
        prune = prune | (is_actor & alive & outside)

        # never cull an actor to zero: if every alive gaussian of an actor is
        # pruned, keep a random ~half (>=1) of them (`strategy.py:113-119`)
        seg = jnp.clip(ids, 0, n_actors - 1)
        survivors = jax.ops.segment_sum(
            (alive & ~prune & is_actor).astype(jnp.int32), seg, num_segments=n_actors
        )
        had_alive = jax.ops.segment_sum(
            (alive & is_actor).astype(jnp.int32), seg, num_segments=n_actors
        )
        wiped = (survivors == 0) & (had_alive > 0)  # [A]
        rng, r_keep = jax.random.split(rng)
        u = jax.random.uniform(r_keep, (n,))
        u = jnp.where(alive & is_actor, u, -1.0)
        u_max = jax.ops.segment_max(u, seg, num_segments=n_actors)
        keep = wiped[seg] & alive & is_actor & ((u > 0.5) | (u >= u_max[seg]))
        prune = prune & ~keep

    new_alive = alive & ~prune
    p = kill_slots(params, prune)

    # ---- grow (`_grow_gs`): duplicate small / split big high-gradient gaussians
    candidate = new_alive & (grad2d_avg > config.grow_grad2d)
    small = scales_lin.max(-1) <= config.grow_scale3d * scene_scale
    is_split_all = candidate & ~small

    k = min(config.max_grow_per_refine, n)
    scores = jnp.where(candidate, grad2d_avg, -jnp.inf)
    grow_scores, grow_idx = jax.lax.top_k(scores, k)  # [K]
    free_flag, free_idx = jax.lax.top_k((~new_alive).astype(jnp.float32), k)
    n_free = jnp.sum(~new_alive)
    grant = jnp.isfinite(grow_scores) & (jnp.arange(k) < n_free) & (free_flag > 0.5)

    src = grow_idx  # [K]
    # non-granted writes go to a sacrificial padding row (index n) — masking by
    # writing the old value back would collide with granted writes at the same
    # index (duplicate-index .at[].set keeps only one write)
    dst = jnp.where(grant, free_idx, n)
    is_split = is_split_all[src] & grant
    src_w = jnp.where(is_split, src, n)

    # split samples ~ N(mean, cov) (gsplat `split` op), scales / 1.6
    cov = quat_scale_to_covariance(p["quats"][src], jnp.exp(p["scales"][src]))
    chol = jnp.linalg.cholesky(cov + 1e-12 * jnp.eye(3))
    rng, r1, r2 = jax.random.split(rng, 3)
    off1 = jnp.einsum("kij,kj->ki", chol, jax.random.normal(r1, (k, 3)))
    off2 = jnp.einsum("kij,kj->ki", chol, jax.random.normal(r2, (k, 3)))
    split_scale = p["scales"][src] - jnp.log(1.6)

    new_params = dict(p)
    for key, arr in p.items():
        src_vals = arr[src]
        if key == "means":
            dst_vals = jnp.where(is_split[:, None], src_vals + off2, src_vals)
            upd_src = jnp.where(is_split[:, None], src_vals + off1, src_vals)
        elif key == "scales":
            dst_vals = jnp.where(is_split[:, None], split_scale, src_vals)
            upd_src = jnp.where(is_split[:, None], split_scale, src_vals)
        elif key == "opacities" and config.revised_opacity:
            # revised: 1 - sqrt(1 - o) for both halves (Bulò et al. 2024)
            o = jax.nn.sigmoid(src_vals)
            o2 = jnp.clip(1.0 - jnp.sqrt(jnp.clip(1.0 - o, 0.0, 1.0)), 1e-6, 1 - 1e-6)
            rev = jnp.log(o2) - jnp.log1p(-o2)
            dst_vals = jnp.where(is_split, rev, src_vals)
            upd_src = jnp.where(is_split, rev, src_vals)
        else:
            dst_vals = src_vals
            upd_src = src_vals

        arr_pad = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], axis=0)
        arr_pad = arr_pad.at[src_w].set(upd_src)
        arr_pad = arr_pad.at[dst].set(dst_vals)
        new_params[key] = arr_pad[:n]

    # zero optimizer moments at every written slot (reference optimizer surgery)
    if opt_state_moments is not None:
        written = jnp.zeros(n + 1, bool).at[dst].set(True).at[src_w].set(True)[:n]
        written = written | prune
        zero_written = lambda m: jnp.where(
            written.reshape((-1,) + (1,) * (m.ndim - 1)), jnp.zeros_like(m), m
        )
        opt_state_moments = jax.tree.map(zero_written, opt_state_moments)

    return new_params, opt_state_moments
