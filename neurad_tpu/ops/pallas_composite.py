"""Pallas TPU kernel: per-tile gaussian alpha compositing.

The XLA path (`ops/gaussian_rasterize._composite`) materializes [tiles, pixels,
K] alpha/transmittance tensors in HBM — at 1920x1080/K=256 that is GBs of pure
traffic. This kernel runs one tile per grid step with the whole composite in
VMEM: gathered per-tile gaussian rows stream in, the [P, K] alpha matrix, the
exclusive-cumprod transmittance, and the [P, C] accumulators never leave the
chip. Forward + custom-VJP backward (recompute-based, like the CUDA
rasterizers') so training uses it too.

Inputs are the PRE-GATHERED per-tile arrays (XLA's gather handles the random
access; Pallas does the dense math — the right split on TPU, where in-kernel
random HBM access would serialize into per-row DMAs).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _composite_fwd_kernel(
    pix_ref,  # [P, 2]
    times_ref,  # [P, 1]
    means_ref,  # [K, 2]
    vel_ref,  # [K, 2]
    conics_ref,  # [K, 3]
    opac_ref,  # [K, 1]
    feats_ref,  # [K, C]
    depth_ref,  # [K, 1]
    dvel_ref,  # [K, 1]
    valid_ref,  # [K, 1] (float 0/1)
    feat_out_ref,  # [P, C]
    depth_out_ref,  # [P, 1]
    alpha_out_ref,  # [P, 1]
):
    pix = pix_ref[:]  # [P, 2]
    t = times_ref[:, 0]  # [P]
    # K-major layout: K on the sublane axis so the composite loop can slice it
    # (Mosaic supports neither cumprod/cumsum nor value-level dynamic_slice, and
    # lane-dim ref slicing is restricted — so alpha lives in a [K, P] scratch)
    means = means_ref[:][:, None, :] + vel_ref[:][:, None, :] * t[None, :, None]  # [K, P, 2]
    d = pix[None, :, :] - means  # [K, P, 2]
    a = conics_ref[:, 0][:, None]
    b = conics_ref[:, 1][:, None]
    c = conics_ref[:, 2][:, None]
    sigma = 0.5 * (a * d[..., 0] ** 2 + c * d[..., 1] ** 2) + b * d[..., 0] * d[..., 1]
    alpha = opac_ref[:, 0][:, None] * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    alpha = jnp.clip(alpha, 0.0, 0.999)
    alpha = jnp.where((valid_ref[:, 0][:, None] > 0) & (alpha >= 1.0 / 255.0), alpha, 0.0)  # [K, P]
    g_depth = depth_ref[:, 0][:, None] + dvel_ref[:, 0][:, None] * t[None, :]  # [K, P]

    k_total = alpha.shape[0]
    p = alpha.shape[1]
    cdim = feats_ref.shape[-1]

    def scoped(alpha_sc, depth_sc):
        alpha_sc[:] = alpha
        depth_sc[:] = g_depth
        feats = feats_ref[:]  # [K, C]

        def body(k, carry):
            trans, feat_acc, depth_acc, alpha_acc = carry
            a_k = alpha_sc[pl.ds(k, 1), :][0]  # [P]
            w = a_k * trans
            f_k = feats_ref[pl.ds(k, 1), :]  # [1, C]
            feat_acc = feat_acc + w[:, None] * f_k
            d_k = depth_sc[pl.ds(k, 1), :][0]
            depth_acc = depth_acc + w * d_k
            alpha_acc = alpha_acc + w
            trans = trans * (1.0 - a_k)
            return trans, feat_acc, depth_acc, alpha_acc

        init = (
            jnp.ones((p,), jnp.float32),
            jnp.zeros((p, cdim), jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
        )
        _, feat_acc, depth_acc, alpha_acc = jax.lax.fori_loop(0, k_total, body, init)
        feat_out_ref[:] = feat_acc
        depth_out_ref[:] = depth_acc[:, None]
        alpha_out_ref[:] = alpha_acc[:, None]

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

    spec2 = lambda last: pl.BlockSpec((1,) + last, lambda i: (i,) + (0,) * len(last), memory_space=pltpu.VMEM)

    def squeeze_kernel(*refs):
        # drop the leading length-1 tile axis from every ref view
        args = [r.at[0] for r in refs]
        _composite_fwd_kernel(*args)

    return pl.pallas_call(
        squeeze_kernel,
        grid=(t_total,),
        in_specs=[
            spec2((p, 2)), spec2((p, 1)), spec2((k, 2)), spec2((k, 2)), spec2((k, 3)),
            spec2((k, 1)), spec2((k, c)), spec2((k, 1)), spec2((k, 1)), spec2((k, 1)),
        ],
        out_specs=[spec2((p, c)), spec2((p, 1)), spec2((p, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, p, c), jnp.float32),
            jax.ShapeDtypeStruct((t_total, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_total, p, 1), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(pix, times, means, vel, conics, opac, feats, depth, dvel, valid)


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
