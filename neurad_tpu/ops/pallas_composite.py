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

    k_total, p = alpha.shape

    def scoped(alpha_sc, depth_sc):
        alpha_sc[:] = alpha
        depth_sc[:] = g_depth

        def body(k, carry):
            trans, feat_acc, depth_acc, alpha_acc = carry
            a_k = alpha_sc[pl.ds(k, 1), :][0]  # [P]
            w = a_k * trans  # [P]
            f_k = feats_ref[0, pl.ds(k, 1), :]  # [1, 128]
            feat_acc = feat_acc + w[:, None] * f_k
            d_k = depth_sc[pl.ds(k, 1), :][0]
            depth_acc = depth_acc + w * d_k
            alpha_acc = alpha_acc + w
            trans = trans * (1.0 - a_k)
            return trans, feat_acc, depth_acc, alpha_acc

        init = (
            jnp.ones((p,), jnp.float32),
            jnp.zeros((p, _C_PAD), jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
        )
        _, feat_acc, depth_acc, alpha_acc = jax.lax.fori_loop(0, k_total, body, init)
        feat_out_ref[0] = feat_acc
        depth_out_ref[0, 0, :] = depth_acc
        alpha_out_ref[0, 0, :] = alpha_acc

    pl.run_scoped(
        scoped,
        alpha_sc=pltpu.VMEM((k_total, p), jnp.float32),
        depth_sc=pltpu.VMEM((k_total, p), jnp.float32),
    )


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


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pallas_tile_composite(pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    """Differentiable per-tile composite; see `_composite` for XLA reference."""
    return _run_fwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid)


def _fwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid):
    out = _run_fwd(pix, times, means, vel, conics, opac, feats, depth, dvel, valid)
    return out, (pix, times, means, vel, conics, opac, feats, depth, dvel, valid)


def _bwd(res, cotangents):
    """Recompute-based backward, mirroring the XLA math via jax.vjp per tile.

    The recompute happens tile-by-tile under lax.map so the backward's live
    memory also stays at one tile's working set (the CUDA rasterizers' strategy,
    traded against a hand-written backward kernel; a Pallas backward kernel can
    replace this without touching callers).
    """
    pix, times, means, vel, conics, opac, feats, depth, dvel, valid = res
    g_feat, g_depth, g_alpha = cotangents

    def one_tile(args):
        (pix_t, times_t, means_t, vel_t, con_t, op_t, f_t, d_t, dv_t, v_t, gf, gd, ga) = args

        def f(means_t, vel_t, con_t, op_t, f_t, d_t, dv_t):
            # identical math to the forward kernel, in plain jnp
            m = means_t[None, :, :] + vel_t[None, :, :] * times_t[:, :, None]
            dd = pix_t[:, None, :] - m
            a, b, c = con_t[:, 0][None], con_t[:, 1][None], con_t[:, 2][None]
            sigma = 0.5 * (a * dd[..., 0] ** 2 + c * dd[..., 1] ** 2) + b * dd[..., 0] * dd[..., 1]
            alpha = jnp.clip(op_t[:, 0][None] * jnp.exp(-jnp.clip(sigma, 0.0, 50.0)), 0.0, 0.999)
            alpha = jnp.where((v_t[:, 0][None] > 0) & (alpha >= 1.0 / 255.0), alpha, 0.0)
            om = 1.0 - alpha
            trans = jnp.concatenate([jnp.ones_like(om[:, :1]), jnp.cumprod(om, axis=-1)[:, :-1]], axis=-1)
            w = alpha * trans
            feat = w @ f_t
            gdep = d_t[:, 0][None] + dv_t[:, 0][None] * times_t
            dep = jnp.sum(w * gdep, axis=-1, keepdims=True)
            acc = jnp.sum(w, axis=-1, keepdims=True)
            return feat, dep, acc

        _, vjp = jax.vjp(f, means_t, vel_t, con_t, op_t, f_t, d_t, dv_t)
        return vjp((gf, gd, ga))

    grads = jax.lax.map(
        one_tile, (pix, times, means, vel, conics, opac, feats, depth, dvel, valid, g_feat, g_depth, g_alpha)
    )
    d_means, d_vel, d_con, d_op, d_feats, d_depth, d_dvel = grads
    zero = lambda x: jnp.zeros_like(x)
    return (zero(pix), zero(times), d_means, d_vel, d_con, d_op, d_feats, d_depth, d_dvel, zero(valid))


pallas_tile_composite.defvjp(_fwd, _bwd)
