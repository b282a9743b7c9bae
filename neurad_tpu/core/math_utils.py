"""Geometry / rendering math (pure jnp).

Counterpart of `nerfstudio/utils/math.py`: AABB/OBB intersection, ZipNeRF power
transforms, erf approximation, chamfer distance, safe helpers. Everything is
batched + static-shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), eps, None)


def intersect_aabb(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    aabb: jnp.ndarray,
    max_bound: float = 1e10,
    invalid_value: float = 1e10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray/AABB slab intersection (`nerfstudio/utils/math.py:337-383`).

    Args:
        origins/directions: [..., 3]; aabb: [6] = (xmin,ymin,zmin,xmax,ymax,zmax)
    Returns:
        (t_min, t_max) each [...], `invalid_value` where the ray misses.
    """
    inv_d = 1.0 / directions  # relies on IEEE inf semantics like the reference
    tx_min = (aabb[:3] - origins) * inv_d
    tx_max = (aabb[3:] - origins) * inv_d
    t_min = jnp.minimum(tx_min, tx_max).max(axis=-1)
    t_max = jnp.maximum(tx_min, tx_max).min(axis=-1)
    t_min = jnp.clip(t_min, 0.0, max_bound)
    t_max = jnp.clip(t_max, 0.0, max_bound)
    miss = t_max <= t_min
    return jnp.where(miss, invalid_value, t_min), jnp.where(miss, invalid_value, t_max)


def intersect_obb(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    obb_r: jnp.ndarray,
    obb_t: jnp.ndarray,
    obb_size: jnp.ndarray,
    max_bound: float = 1e10,
    invalid_value: float = 1e10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray/OBB intersection (`math.py:419-460`): transform rays into box frame,
    then slab test against the centered AABB of side `obb_size`."""
    h_world2local = jnp.swapaxes(obb_r, -1, -2)
    o = (origins - obb_t) @ obb_r  # rotate into box frame
    d = directions @ obb_r
    del h_world2local
    aabb = jnp.concatenate([-obb_size / 2.0, obb_size / 2.0], axis=-1)
    return intersect_aabb(o, d, aabb, max_bound=max_bound, invalid_value=invalid_value)


def power_fn(x: jnp.ndarray, lam: float = -1.5, max_bound: float = 1e10) -> jnp.ndarray:
    """ZipNeRF power transformation, Eq. 4 (`math.py:541-557`). `lam` is static."""
    if lam == 1:
        return x
    if lam == 0:
        return jnp.log1p(x)
    if lam > max_bound:
        return jnp.expm1(x)
    if lam < -max_bound:
        return -jnp.expm1(-x)
    lam_1 = abs(lam - 1)
    return (lam_1 / lam) * ((x / lam_1 + 1.0) ** lam - 1.0)


def inv_power_fn(x: jnp.ndarray, lam: float = -1.5, eps: float = 1e-10, max_bound: float = 1e10) -> jnp.ndarray:
    """Inverse of `power_fn` (`math.py:559-581`)."""
    if lam == 1:
        return x
    if lam == 0:
        return jnp.expm1(x)
    if lam > max_bound:
        return jnp.log1p(x)
    if lam < -max_bound:
        return -jnp.log(1.0 - x)
    lam_1 = abs(lam - 1)
    return (jnp.clip(x * lam / lam_1 + 1.0, eps, None) ** (1.0 / lam) - 1.0) * lam_1


def erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    """ZipNeRF erf approximation, Eq. 11 (`math.py:583-586`)."""
    return jnp.sign(x) * jnp.sqrt(1.0 - jnp.exp(-(4.0 / jnp.pi) * x**2))


def expected_sin(x_means: jnp.ndarray, x_vars: jnp.ndarray) -> jnp.ndarray:
    """E[sin(x)] for x ~ N(mean, var) (`math.py:320-334`)."""
    return jnp.exp(-0.5 * x_vars) * jnp.sin(x_means)


def chamfer_distance(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    pred_mask: Optional[jnp.ndarray] = None,
    gt_mask: Optional[jnp.ndarray] = None,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Symmetric chamfer distance between point clouds (`math.py:745-798`),
    chunked over the first cloud to bound the pairwise-distance matrix size.

    Args:
        pred: [N, 3]; gt: [M, 3]; optional bool masks for padded points.
    """
    big = 1e12
    if pred_mask is None:
        pred_mask = jnp.ones(pred.shape[0], dtype=bool)
    if gt_mask is None:
        gt_mask = jnp.ones(gt.shape[0], dtype=bool)

    def min_dists(a, a_mask, b, b_mask):
        # for each point in a: distance to nearest valid point of b
        n = a.shape[0]
        pad = (-n) % chunk
        a_p = jnp.pad(a, ((0, pad), (0, 0)))
        m_p = jnp.pad(a_mask, (0, pad))
        a_c = a_p.reshape(-1, chunk, 3)
        m_c = m_p.reshape(-1, chunk)

        def one_chunk(carry, inp):
            ac, mc = inp
            d2 = jnp.sum((ac[:, None, :] - b[None, :, :]) ** 2, axis=-1)
            d2 = jnp.where(b_mask[None, :], d2, big)
            dmin = jnp.sqrt(jnp.min(d2, axis=-1))
            return carry, jnp.where(mc, dmin, 0.0)

        _, mins = jax.lax.scan(one_chunk, None, (a_c, m_c))
        return mins.reshape(-1)[:n]

    d_pred = min_dists(pred, pred_mask, gt, gt_mask)
    d_gt = min_dists(gt, gt_mask, pred, pred_mask)
    n_pred = jnp.clip(jnp.sum(pred_mask), 1, None)
    n_gt = jnp.clip(jnp.sum(gt_mask), 1, None)
    return d_pred.sum() / n_pred + d_gt.sum() / n_gt


def normalized_depth_scale_and_shift(
    prediction: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares scale/shift aligning monocular depth to target (`math.py:500-539`)."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(-2, -1))
    a_01 = jnp.sum(mask * prediction, axis=(-2, -1))
    a_11 = jnp.sum(mask, axis=(-2, -1))
    b_0 = jnp.sum(mask * prediction * target, axis=(-2, -1))
    b_1 = jnp.sum(mask * target, axis=(-2, -1))
    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    scale = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / jnp.where(valid, det, 1.0), 0.0)
    shift = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / jnp.where(valid, det, 1.0), 0.0)
    return scale, shift


def take_along_small(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """`take_along_axis(x, idx, axis=-1)` without a gather — TPU fast path for
    small trailing dims.

    x [..., B], idx [..., M] int -> [..., M]. XLA lowers per-row take_along_axis
    to a row-latency-bound dynamic-gather (~15 ns/row on v5e; the CDF-interp
    lookups alone cost ~190 ms per NeuRAD train step at 3.7M rows). This form —
    one-hot compare + masked sum — is O(M*B) elementwise work that XLA fuses
    into the surrounding computation: for B up to a few hundred it is ~100x
    faster. Exact values (the reduction selects stored elements); the VJP is the
    transposed masked reduction (also gather/scatter-free).
    """
    b = x.shape[-1]
    eq = idx[..., :, None] == jnp.arange(b, dtype=idx.dtype)
    return jnp.sum(jnp.where(eq, x[..., None, :], 0), axis=-1)


def searchsorted_dense(a: jnp.ndarray, v: jnp.ndarray, side: str = "left") -> jnp.ndarray:
    """Batched searchsorted as one dense comparison reduction.

    a [..., N] sorted, v [..., M] -> [..., M] int32. On TPU this beats the
    binary-search lowering (log2(N) sequential gather rounds) for the short
    per-ray histograms used in sampling/interlevel losses (N <= a few hundred).
    """
    if side == "right":
        return jnp.sum(a[..., None, :] <= v[..., :, None], axis=-1).astype(jnp.int32)
    return jnp.sum(a[..., None, :] < v[..., :, None], axis=-1).astype(jnp.int32)
