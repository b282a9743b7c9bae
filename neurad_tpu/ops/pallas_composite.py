"""Pallas TPU kernel: per-tile gaussian alpha compositing.

The XLA path (`ops/gaussian_rasterize._composite`) materializes [tiles, pixels,
K] alpha/transmittance tensors in HBM — at 1920x1080/K=256 that is GBs of pure
traffic. This kernel runs one tile per grid step with the whole composite in
VMEM: the [K, P] alpha matrix, the front-to-back transmittance loop, and the
[P, C] accumulators never leave the chip.

Mosaic constraints shape the layout (lane dim must be 128-aligned; no
cumprod/cumsum; no value-level dynamic_slice; ref slicing only on non-lane
dims), so the wrapper repacks inputs:

  pix      [T, 2, P]    pixel x/y on sublanes, P on lanes
  times    [T, 1, P]
  gattr    [T, 11, K]   (mean_x, mean_y, vel_x, vel_y, con_a, con_b, con_c,
                         opac, depth, depth_vel, valid) per-tile gaussians
  feats    [T, K, 128]  features padded to a full lane
and the composite loop slices the [K, P] alpha scratch along sublanes.

Inputs are the PRE-GATHERED per-tile arrays (XLA's gather handles the random
access; Pallas does the dense math — the right split on TPU). Forward +
custom-VJP backward (per-tile recompute, like the CUDA rasterizers).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C_PAD = 128  # feature lane padding


def _exclusive_prefix_prod_sublane(x):
    """Exclusive prefix product along axis 0 (sublanes) of [K, P], K a power
    of two: Hillis-Steele with static sublane shifts — log2(K) vectorized
    multiplies instead of a serial K-loop."""
    k = x.shape[0]
    # inclusive scan
    s = 1
    prod = x
    while s < k:
        shifted = jnp.concatenate([jnp.ones((s,) + x.shape[1:], x.dtype), prod[:-s]], axis=0)
        prod = prod * shifted
        s *= 2
    # exclusive = inclusive shifted down by one
    return jnp.concatenate([jnp.ones((1,) + x.shape[1:], x.dtype), prod[:-1]], axis=0)


def _composite_fwd_kernel(pix_ref, times_ref, gattr_ref, feats_ref, feat_out_ref, depth_out_ref, alpha_out_ref):
    pix_x = pix_ref[0, 0, :]  # [P]
    pix_y = pix_ref[0, 1, :]
    t = times_ref[0, 0, :]  # [P]
    ga = gattr_ref[0]  # [11, K]
    mean_x = ga[0][:, None]  # [K, 1]
    mean_y = ga[1][:, None]
    vel_x = ga[2][:, None]
    vel_y = ga[3][:, None]
    con_a = ga[4][:, None]
    con_b = ga[5][:, None]
    con_c = ga[6][:, None]
    opac = ga[7][:, None]
    depth = ga[8][:, None]
    dvel = ga[9][:, None]
    valid = ga[10][:, None]

    # [K, P]: rolling-shutter-warped center offsets
    dx = pix_x[None, :] - (mean_x + vel_x * t[None, :])
    dy = pix_y[None, :] - (mean_y + vel_y * t[None, :])
    sigma = 0.5 * (con_a * dx * dx + con_c * dy * dy) + con_b * dx * dy
    alpha = jnp.clip(opac * jnp.exp(-jnp.clip(sigma, 0.0, 50.0)), 0.0, 0.999)
    alpha = jnp.where((valid > 0) & (alpha >= 1.0 / 255.0), alpha, 0.0)  # [K, P]
    g_depth = depth + dvel * t[None, :]  # [K, P]

    # fully vectorized composite: log-step prefix product for transmittance,
    # one MXU contraction for the features, sublane reductions for the rest
    # (the serial per-K loop this replaces measured 3x slower than XLA)
    trans = _exclusive_prefix_prod_sublane(1.0 - alpha)  # [K, P]
    w = alpha * trans  # [K, P]
    feat_out_ref[0] = jax.lax.dot_general(
        w, feats_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P, 128]
    depth_out_ref[0, 0, :] = jnp.sum(w * g_depth, axis=0)
    alpha_out_ref[0, 0, :] = jnp.sum(w, axis=0)


def _run_fwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    """[T, ...] tiled inputs -> (feat [T,P,C], depth [T,P,1], alpha [T,P,1])."""
    t_total, p = pix.shape[0], pix.shape[1]
    k = means.shape[1]
    c = feats.shape[-1]

    pix_kp = jnp.swapaxes(pix, 1, 2)  # [T, 2, P]
    times_kp = jnp.swapaxes(times, 1, 2)  # [T, 1, P]
    gattr = jnp.stack(
        [
            means[..., 0], means[..., 1], vel[..., 0], vel[..., 1],
            conics[..., 0], conics[..., 1], conics[..., 2],
            opac[..., 0], depth[..., 0], dvel[..., 0], valid[..., 0],
        ],
        axis=1,
    )  # [T, 11, K]
    feats_pad = jnp.pad(feats, ((0, 0), (0, 0), (0, _C_PAD - c)))  # [T, K, 128]

    spec = lambda last: pl.BlockSpec((1,) + last, lambda i: (i,) + (0,) * len(last), memory_space=pltpu.VMEM)
    feat_p, depth_p, alpha_p = pl.pallas_call(
        _composite_fwd_kernel,
        grid=(t_total,),
        in_specs=[spec((2, p)), spec((1, p)), spec((11, k)), spec((k, _C_PAD))],
        out_specs=[spec((p, _C_PAD)), spec((1, p)), spec((1, p))],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, p, _C_PAD), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 1, p), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(pix_kp, times_kp, gattr, feats_pad)
    return feat_p[..., :c], jnp.swapaxes(depth_p, 1, 2), jnp.swapaxes(alpha_p, 1, 2)




def _composite_bwd_kernel(
    pix_ref, times_ref, gattr_ref, feats_ref, gf_ref, gd_ref, ga_ref,
    dgattr_ref, dfeats_ref,
):
    """Fused backward: 3DGS compositing gradients, one tile entirely in VMEM.

    With w_k = a_k T_k and per-pixel payload grad
      g_k = <gF, f_k> + gD * d_k + gA,
    the alpha gradient is
      dL/da_k = T_k g_k - (G - P_k) / (1 - a_k)
    where P_k is the INCLUSIVE prefix of w_j g_j along the depth order and G
    its total — so a single forward-order K-loop (recomputing transmittance)
    yields every alpha gradient without the CUDA kernels' reverse sweep. The
    payload/feature grads are two MXU matmuls.
    """
    pix_x = pix_ref[0, 0, :]  # [P]
    pix_y = pix_ref[0, 1, :]
    t = times_ref[0, 0, :]
    ga = gattr_ref[0]  # [11, K]
    mean_x, mean_y = ga[0][:, None], ga[1][:, None]
    vel_x, vel_y = ga[2][:, None], ga[3][:, None]
    con_a, con_b, con_c = ga[4][:, None], ga[5][:, None], ga[6][:, None]
    opac, depth, dvel, valid = ga[7][:, None], ga[8][:, None], ga[9][:, None], ga[10][:, None]

    dx = pix_x[None, :] - (mean_x + vel_x * t[None, :])  # [K, P]
    dy = pix_y[None, :] - (mean_y + vel_y * t[None, :])
    sigma_raw = 0.5 * (con_a * dx * dx + con_c * dy * dy) + con_b * dx * dy
    sigma = jnp.clip(sigma_raw, 0.0, 50.0)
    alpha_pre = opac * jnp.exp(-sigma)
    gate = (valid > 0) & (alpha_pre >= 1.0 / 255.0)
    alpha = jnp.where(gate, jnp.clip(alpha_pre, 0.0, 0.999), 0.0)  # [K, P]
    # clip(sigma) and clip(alpha, ..., 0.999) are flat outside their ranges
    dgate = (gate & (alpha_pre < 0.999) & (sigma_raw > 0.0) & (sigma_raw < 50.0)).astype(jnp.float32)

    g_depth_kp = depth + dvel * t[None, :]  # [K, P]
    gd = gd_ref[0, 0, :]  # [P]
    ga_cot = ga_ref[0, 0, :]  # [P]

    k_total, p = alpha.shape

    def scoped(alpha_sc, g_sc, w_sc, tg_sc, pref_sc):
        alpha_sc[:] = alpha
        # payload grad g_k(p): [K,128] x [P,128]^T on the MXU + payload terms
        g_sc[:] = (
            jax.lax.dot_general(
                feats_ref[0], gf_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + g_depth_kp * gd[None, :]
            + ga_cot[None, :]
        )

        def body(k, carry):
            trans, prefix = carry  # [P], [P]
            a_k = alpha_sc[pl.ds(k, 1), :][0]
            g_k = g_sc[pl.ds(k, 1), :][0]
            w_k = a_k * trans
            prefix = prefix + w_k * g_k
            w_sc[pl.ds(k, 1), :] = w_k[None, :]
            tg_sc[pl.ds(k, 1), :] = (trans * g_k)[None, :]
            pref_sc[pl.ds(k, 1), :] = prefix[None, :]
            trans = trans * (1.0 - a_k)
            return trans, prefix

        _, total = jax.lax.fori_loop(
            0, k_total, body, (jnp.ones((p,), jnp.float32), jnp.zeros((p,), jnp.float32))
        )

        w = w_sc[:]  # [K, P]
        suffix = total[None, :] - pref_sc[:]  # exclusive suffix of w_j g_j
        d_alpha = (tg_sc[:] - suffix / (1.0 - alpha)) * dgate  # [K, P]

        d_sigma = -alpha * d_alpha
        exp_neg = jnp.exp(-sigma)
        ddx = d_sigma * (con_a * dx + con_b * dy)
        ddy = d_sigma * (con_c * dy + con_b * dx)
        w_gd = w * gd[None, :]

        red = lambda x: jnp.sum(x, axis=-1, keepdims=True)  # [K, 1]
        dgattr_ref[0, :, 0:1] = -red(ddx)                    # d mean_x
        dgattr_ref[0, :, 1:2] = -red(ddy)                    # d mean_y
        dgattr_ref[0, :, 2:3] = -red(ddx * t[None, :])       # d vel_x
        dgattr_ref[0, :, 3:4] = -red(ddy * t[None, :])       # d vel_y
        dgattr_ref[0, :, 4:5] = red(0.5 * dx * dx * d_sigma)  # d con_a
        dgattr_ref[0, :, 5:6] = red(dx * dy * d_sigma)        # d con_b
        dgattr_ref[0, :, 6:7] = red(0.5 * dy * dy * d_sigma)  # d con_c
        dgattr_ref[0, :, 7:8] = red(d_alpha * exp_neg)        # d opac
        dgattr_ref[0, :, 8:9] = red(w_gd)                     # d depth
        dgattr_ref[0, :, 9:10] = red(w_gd * t[None, :])       # d depth_vel

        dfeats_ref[0] = jax.lax.dot_general(
            w, gf_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, P] @ [P, 128]

    pl.run_scoped(
        scoped,
        alpha_sc=pltpu.VMEM((k_total, p), jnp.float32),
        g_sc=pltpu.VMEM((k_total, p), jnp.float32),
        w_sc=pltpu.VMEM((k_total, p), jnp.float32),
        tg_sc=pltpu.VMEM((k_total, p), jnp.float32),
        pref_sc=pltpu.VMEM((k_total, p), jnp.float32),
    )


def _run_bwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid, g_feat, g_depth, g_alpha):
    """[T,...] tiled inputs + cotangents -> grads in the callers' layouts."""
    t_total, p = pix.shape[0], pix.shape[1]
    k = means.shape[1]
    c = feats.shape[-1]

    pix_kp = jnp.swapaxes(pix, 1, 2)
    times_kp = jnp.swapaxes(times, 1, 2)
    gattr = jnp.stack(
        [
            means[..., 0], means[..., 1], vel[..., 0], vel[..., 1],
            conics[..., 0], conics[..., 1], conics[..., 2],
            opac[..., 0], depth[..., 0], dvel[..., 0], valid[..., 0],
        ],
        axis=1,
    )
    feats_pad = jnp.pad(feats, ((0, 0), (0, 0), (0, _C_PAD - c)))
    gf_pad = jnp.pad(g_feat, ((0, 0), (0, 0), (0, _C_PAD - c)))  # [T, P, 128]
    gd_kp = jnp.swapaxes(g_depth, 1, 2)  # [T, 1, P]
    ga_kp = jnp.swapaxes(g_alpha, 1, 2)

    spec = lambda last: pl.BlockSpec((1,) + last, lambda i: (i,) + (0,) * len(last), memory_space=pltpu.VMEM)
    dgattr, dfeats = pl.pallas_call(
        _composite_bwd_kernel,
        grid=(t_total,),
        in_specs=[
            spec((2, p)), spec((1, p)), spec((11, k)), spec((k, _C_PAD)),
            spec((p, _C_PAD)), spec((1, p)), spec((1, p)),
        ],
        out_specs=[spec((k, _C_PAD)), spec((k, _C_PAD))],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, k, _C_PAD), jnp.float32),
            jax.ShapeDtypeStruct((t_total, k, _C_PAD), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(pix_kp, times_kp, gattr, feats_pad, gf_pad, gd_kp, ga_kp)

    d_means = dgattr[..., 0:2]
    d_vel = dgattr[..., 2:4]
    d_con = dgattr[..., 4:7]
    d_opac = dgattr[..., 7:8]
    d_depth = dgattr[..., 8:9]
    d_dvel = dgattr[..., 9:10]
    return d_means, d_vel, d_con, d_opac, dfeats[..., :c], d_depth, d_dvel


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pallas_tile_composite(pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    """Differentiable per-tile composite; see `_composite` for XLA reference."""
    return _run_fwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid)


def _fwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    out = _run_fwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid)
    return out, (pix, times, means, vel, conics, opac, feats, depth, dvel, valid)


def _bwd(res, cotangents):
    """Fused Pallas backward kernel (see `_composite_bwd_kernel`); the round-1
    per-tile XLA recompute is gone — forward recompute AND gradient math run
    in one VMEM-resident kernel per tile."""
    pix, times, means, vel, conics, opac, feats, depth, dvel, valid = res
    g_feat, g_depth, g_alpha = cotangents
    d_means, d_vel, d_con, d_opac, d_feats, d_depth, d_dvel = _run_bwd(
        pix, times, means, vel, conics, opac, feats, depth, dvel, valid, g_feat, g_depth, g_alpha
    )
    zero = lambda x: jnp.zeros_like(x)
    return (zero(pix), zero(times), d_means, d_vel, d_con, d_opac, d_feats, d_depth, d_dvel, zero(valid))


pallas_tile_composite.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Hybrid backend: XLA forward (vectorized cumprod — measured 3x the Pallas
# serial K-loop on v5e) + the fused Pallas backward kernel (measured ~2x XLA's
# autodiff backward). Best of both measured paths.
# ---------------------------------------------------------------------------


def _xla_forward_on_tiles(compute_dtype, pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    from neurad_tpu.ops.gaussian_rasterize import _composite

    feat, dep, acc, _w = _composite(
        pix,
        times[..., 0],
        means,
        vel,
        conics,
        opac[..., 0],
        feats,
        depth[..., 0],
        dvel[..., 0],
        valid[..., 0] > 0,
        compute_dtype=compute_dtype,
    )
    return feat, dep, acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hybrid_tile_composite(compute_dtype, pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    """XLA forward + fused Pallas backward; same interface as
    `pallas_tile_composite` plus a leading static compute dtype."""
    return _xla_forward_on_tiles(compute_dtype, pix, times, means, vel, conics, opac, feats, depth, dvel, valid)


def _hybrid_fwd(compute_dtype, pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    out = _xla_forward_on_tiles(compute_dtype, pix, times, means, vel, conics, opac, feats, depth, dvel, valid)
    return out, (pix, times, means, vel, conics, opac, feats, depth, dvel, valid)


def _hybrid_bwd(compute_dtype, res, cotangents):
    return _bwd(res, cotangents)


hybrid_tile_composite.defvjp(_hybrid_fwd, _hybrid_bwd)


# ---------------------------------------------------------------------------
# Lidar variant: same fused backward, extended with (a) circular azimuth wrap,
# (b) the line-of-sight term alpha_until = sum_k w_k [d_k < gt - eps] whose
# cotangent folds into the per-gaussian payload grad g_k, (c) per-slot query
# validity. The forward stays XLA (vectorized cumprod wins there, same A/B as
# the camera path); median depth is eval-only and deliberately gradient-free
# (the reference's lidar losses never differentiate through the median either,
# `splatad.py:1356-1432`).
# ---------------------------------------------------------------------------


def _inclusive_prefix_sum_sublane(x):
    """Inclusive prefix sum along axis 0 (sublanes): Hillis-Steele log-step."""
    k = x.shape[0]
    s = 1
    acc = x
    while s < k:
        shifted = jnp.concatenate([jnp.zeros((s,) + x.shape[1:], x.dtype), acc[:-s]], axis=0)
        acc = acc + shifted
        s *= 2
    return acc


def _make_lidar_fwd_kernel(wrap: bool, depth_eps: float, compute_until: bool):
    """Vectorized lidar forward: same math as `_lidar_composite_xla` but the
    [K, P] alpha/transmittance/weight tensors stay in VMEM (log-step scans, one
    MXU feature contraction, mask-based median — no argmax)."""

    def kernel(pix_ref, times_ref, gattr_ref, feats_ref,
               feat_out_ref, depth_out_ref, acc_out_ref, until_out_ref, med_out_ref):
        pix_x = pix_ref[0, 0, :]  # [P] azimuth (deg)
        pix_y = pix_ref[0, 1, :]  # elevation
        gt = pix_ref[0, 2, :]  # gt depth
        vmask = pix_ref[0, 3, :]  # slot validity
        t = times_ref[0, 0, :]
        ga = gattr_ref[0]  # [11, K]
        mean_x, mean_y = ga[0][:, None], ga[1][:, None]
        vel_x, vel_y = ga[2][:, None], ga[3][:, None]
        con_a, con_b, con_c = ga[4][:, None], ga[5][:, None], ga[6][:, None]
        opac, depth, dvel, valid = ga[7][:, None], ga[8][:, None], ga[9][:, None], ga[10][:, None]

        dx = pix_x[None, :] - (mean_x + vel_x * t[None, :])  # [K, P]
        if wrap:
            dx = jnp.mod(dx + 180.0, 360.0) - 180.0
        dy = pix_y[None, :] - (mean_y + vel_y * t[None, :])
        sigma = jnp.clip(0.5 * (con_a * dx * dx + con_c * dy * dy) + con_b * dx * dy, 0.0, 50.0)
        alpha = jnp.clip(opac * jnp.exp(-sigma), 0.0, 0.999)
        alpha = jnp.where((valid > 0) & (alpha >= 1.0 / 255.0) & (vmask[None, :] > 0), alpha, 0.0)

        trans = _exclusive_prefix_prod_sublane(1.0 - alpha)
        w = alpha * trans  # [K, P]
        g_depth = depth + dvel * t[None, :]  # [K, P]

        feat_out_ref[0] = jax.lax.dot_general(
            w, feats_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = jnp.sum(w, axis=0)  # [P]
        depth_out_ref[0, 0, :] = jnp.sum(w * g_depth, axis=0)
        acc_out_ref[0, 0, :] = acc
        if compute_until:
            before = (g_depth < (gt[None, :] - depth_eps)).astype(jnp.float32)
            until_out_ref[0, 0, :] = jnp.sum(w * before, axis=0)
        else:
            until_out_ref[0, 0, :] = jnp.zeros_like(acc)
        # median depth = depth of the first gaussian whose inclusive weight
        # prefix crosses half the total (mask-select, no argmax; float masks —
        # bool sublane concats don't lower in Mosaic)
        cum_w = _inclusive_prefix_sum_sublane(w)
        crossed = (cum_w >= 0.5 * acc[None, :]).astype(jnp.float32)
        prev = jnp.concatenate([jnp.zeros((1,) + crossed.shape[1:], jnp.float32), crossed[:-1]], axis=0)
        first = crossed * (1.0 - prev)
        med_out_ref[0, 0, :] = jnp.sum(g_depth * first, axis=0)

    return kernel


def run_lidar_fwd(wrap, depth_eps, compute_until, pts_slot, vmask, means, vel, conics, opac,
                  feats, depth, dvel, valid):
    """[T,...] tiled lidar inputs -> (feat [T,P,C], depth/acc/until/med [T,P,1])."""
    t_total, p = pts_slot.shape[0], pts_slot.shape[1]
    k = means.shape[1]
    c = feats.shape[-1]

    pix_kp = jnp.stack(
        [pts_slot[..., 0], pts_slot[..., 1], pts_slot[..., 2], vmask.astype(jnp.float32)], axis=1
    )  # [T, 4, P]
    times_kp = pts_slot[..., 3][:, None, :]
    gattr = jnp.stack(
        [
            means[..., 0], means[..., 1], vel[..., 0], vel[..., 1],
            conics[..., 0], conics[..., 1], conics[..., 2],
            opac, depth, dvel, valid.astype(jnp.float32),
        ],
        axis=1,
    )  # [T, 11, K]
    feats_pad = jnp.pad(feats, ((0, 0), (0, 0), (0, _C_PAD - c)))

    spec = lambda last: pl.BlockSpec((1,) + last, lambda i: (i,) + (0,) * len(last), memory_space=pltpu.VMEM)
    feat_p, dep_p, acc_p, until_p, med_p = pl.pallas_call(
        _make_lidar_fwd_kernel(wrap, depth_eps, compute_until),
        grid=(t_total,),
        in_specs=[spec((4, p)), spec((1, p)), spec((11, k)), spec((k, _C_PAD))],
        out_specs=[spec((p, _C_PAD))] + [spec((1, p))] * 4,
        out_shape=[jax.ShapeDtypeStruct((t_total, p, _C_PAD), jnp.float32)]
        + [jax.ShapeDtypeStruct((t_total, 1, p), jnp.float32)] * 4,
        interpret=jax.default_backend() == "cpu",
    )(pix_kp, times_kp, gattr, feats_pad)
    sw = lambda x: jnp.swapaxes(x, 1, 2)
    return feat_p[..., :c], sw(dep_p), sw(acc_p), sw(until_p), sw(med_p)


def _make_lidar_bwd_kernel(wrap: bool, depth_eps: float):
    def kernel(pix_ref, times_ref, gattr_ref, feats_ref, gf_ref, gd_ref, ga_ref, gu_ref,
               dgattr_ref, dfeats_ref):
        pix_x = pix_ref[0, 0, :]  # [P] azimuth (deg)
        pix_y = pix_ref[0, 1, :]  # elevation
        gt = pix_ref[0, 2, :]  # gt depth
        vmask = pix_ref[0, 3, :]  # slot validity
        t = times_ref[0, 0, :]
        ga = gattr_ref[0]  # [11, K]
        mean_x, mean_y = ga[0][:, None], ga[1][:, None]
        vel_x, vel_y = ga[2][:, None], ga[3][:, None]
        con_a, con_b, con_c = ga[4][:, None], ga[5][:, None], ga[6][:, None]
        opac, depth, dvel, valid = ga[7][:, None], ga[8][:, None], ga[9][:, None], ga[10][:, None]

        dx = pix_x[None, :] - (mean_x + vel_x * t[None, :])  # [K, P]
        if wrap:
            # circular azimuth; derivative is 1 a.e. so gradients pass through
            dx = jnp.mod(dx + 180.0, 360.0) - 180.0
        dy = pix_y[None, :] - (mean_y + vel_y * t[None, :])
        sigma_raw = 0.5 * (con_a * dx * dx + con_c * dy * dy) + con_b * dx * dy
        sigma = jnp.clip(sigma_raw, 0.0, 50.0)
        alpha_pre = opac * jnp.exp(-sigma)
        gate = (valid > 0) & (alpha_pre >= 1.0 / 255.0) & (vmask[None, :] > 0)
        alpha = jnp.where(gate, jnp.clip(alpha_pre, 0.0, 0.999), 0.0)  # [K, P]
        dgate = (gate & (alpha_pre < 0.999) & (sigma_raw > 0.0) & (sigma_raw < 50.0)).astype(jnp.float32)

        g_depth_kp = depth + dvel * t[None, :]  # [K, P]
        before = (g_depth_kp < (gt[None, :] - depth_eps)).astype(jnp.float32)
        gd = gd_ref[0, 0, :]  # [P]
        ga_cot = ga_ref[0, 0, :]
        gu = gu_ref[0, 0, :]

        k_total, p = alpha.shape

        def scoped(alpha_sc, g_sc, w_sc, tg_sc, pref_sc):
            alpha_sc[:] = alpha
            g_sc[:] = (
                jax.lax.dot_general(
                    feats_ref[0], gf_ref[0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + g_depth_kp * gd[None, :]
                + ga_cot[None, :]
                + before * gu[None, :]
            )

            def body(k, carry):
                trans, prefix = carry
                a_k = alpha_sc[pl.ds(k, 1), :][0]
                g_k = g_sc[pl.ds(k, 1), :][0]
                w_k = a_k * trans
                prefix = prefix + w_k * g_k
                w_sc[pl.ds(k, 1), :] = w_k[None, :]
                tg_sc[pl.ds(k, 1), :] = (trans * g_k)[None, :]
                pref_sc[pl.ds(k, 1), :] = prefix[None, :]
                trans = trans * (1.0 - a_k)
                return trans, prefix

            _, total = jax.lax.fori_loop(
                0, k_total, body, (jnp.ones((p,), jnp.float32), jnp.zeros((p,), jnp.float32))
            )

            w = w_sc[:]
            suffix = total[None, :] - pref_sc[:]
            d_alpha = (tg_sc[:] - suffix / (1.0 - alpha)) * dgate

            d_sigma = -alpha * d_alpha
            exp_neg = jnp.exp(-sigma)
            ddx = d_sigma * (con_a * dx + con_b * dy)
            ddy = d_sigma * (con_c * dy + con_b * dx)
            w_gd = w * gd[None, :]

            red = lambda x: jnp.sum(x, axis=-1, keepdims=True)
            dgattr_ref[0, :, 0:1] = -red(ddx)
            dgattr_ref[0, :, 1:2] = -red(ddy)
            dgattr_ref[0, :, 2:3] = -red(ddx * t[None, :])
            dgattr_ref[0, :, 3:4] = -red(ddy * t[None, :])
            dgattr_ref[0, :, 4:5] = red(0.5 * dx * dx * d_sigma)
            dgattr_ref[0, :, 5:6] = red(dx * dy * d_sigma)
            dgattr_ref[0, :, 6:7] = red(0.5 * dy * dy * d_sigma)
            dgattr_ref[0, :, 7:8] = red(d_alpha * exp_neg)
            dgattr_ref[0, :, 8:9] = red(w_gd)
            dgattr_ref[0, :, 9:10] = red(w_gd * t[None, :])

            dfeats_ref[0] = jax.lax.dot_general(
                w, gf_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        pl.run_scoped(
            scoped,
            alpha_sc=pltpu.VMEM((k_total, p), jnp.float32),
            g_sc=pltpu.VMEM((k_total, p), jnp.float32),
            w_sc=pltpu.VMEM((k_total, p), jnp.float32),
            tg_sc=pltpu.VMEM((k_total, p), jnp.float32),
            pref_sc=pltpu.VMEM((k_total, p), jnp.float32),
        )

    return kernel


def run_lidar_bwd(wrap, depth_eps, pts_slot, vmask, means, vel, conics, opac, feats, depth, dvel,
                  valid, g_feat, g_depth, g_alpha, g_until):
    """[T,...] tiled lidar inputs + cotangents -> per-tile-gaussian grads.

    pts_slot [T, P, >=4] (azim, elev, gt_depth, time); vmask [T, P] slot
    validity. Returns (d_means, d_vel, d_con, d_opac, d_feats, d_depth, d_dvel)
    in [T, K, ...] layouts.
    """
    t_total, p = pts_slot.shape[0], pts_slot.shape[1]
    k = means.shape[1]
    c = feats.shape[-1]

    pix_kp = jnp.stack(
        [pts_slot[..., 0], pts_slot[..., 1], pts_slot[..., 2], vmask.astype(jnp.float32)], axis=1
    )  # [T, 4, P]
    times_kp = pts_slot[..., 3][:, None, :]  # [T, 1, P]
    gattr = jnp.stack(
        [
            means[..., 0], means[..., 1], vel[..., 0], vel[..., 1],
            conics[..., 0], conics[..., 1], conics[..., 2],
            opac, depth, dvel, valid.astype(jnp.float32),
        ],
        axis=1,
    )  # [T, 11, K]
    feats_pad = jnp.pad(feats, ((0, 0), (0, 0), (0, _C_PAD - c)))
    gf_pad = jnp.pad(g_feat, ((0, 0), (0, 0), (0, _C_PAD - c)))
    gd_kp = jnp.swapaxes(g_depth, 1, 2)
    ga_kp = jnp.swapaxes(g_alpha, 1, 2)
    gu_kp = jnp.swapaxes(g_until, 1, 2)

    spec = lambda last: pl.BlockSpec((1,) + last, lambda i: (i,) + (0,) * len(last), memory_space=pltpu.VMEM)
    dgattr, dfeats = pl.pallas_call(
        _make_lidar_bwd_kernel(wrap, depth_eps),
        grid=(t_total,),
        in_specs=[
            spec((4, p)), spec((1, p)), spec((11, k)), spec((k, _C_PAD)),
            spec((p, _C_PAD)), spec((1, p)), spec((1, p)), spec((1, p)),
        ],
        out_specs=[spec((k, _C_PAD)), spec((k, _C_PAD))],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, k, _C_PAD), jnp.float32),
            jax.ShapeDtypeStruct((t_total, k, _C_PAD), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(pix_kp, times_kp, gattr, feats_pad, gf_pad, gd_kp, ga_kp, gu_kp)

    return (
        dgattr[..., 0:2], dgattr[..., 2:4], dgattr[..., 4:7], dgattr[..., 7],
        dfeats[..., :c], dgattr[..., 8], dgattr[..., 9],
    )
