"""Training losses: interlevel (mipnerf360 + zipnerf), distortion, depth, perceptual.

TPU-native counterpart of `nerfstudio/model_components/losses.py` (interlevel_loss
115, zipnerf_interlevel_loss 671, distortion_loss 151, DS-NeRF/URF depth 227-336,
VGGPerceptualLossPix2Pix 582, gradient scaling 544). Everything static-shape and
differentiable under jit; sample histograms come in as (sdist [R,S+1], weights
[R,S]) pairs rather than RaySamples objects.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7


def ray_samples_to_sdist(spacing_starts: jnp.ndarray, spacing_ends: jnp.ndarray) -> jnp.ndarray:
    """[R,S,1],[R,S,1] -> bin edges [R,S+1] (`losses.py:108-113`)."""
    return jnp.concatenate([spacing_starts[..., 0], spacing_ends[..., -1:, 0]], axis=-1)


# ---------------------------------------------------------------------------
# MipNeRF-360 interlevel + distortion
# ---------------------------------------------------------------------------


def _outer(t0_lo, t0_hi, t1_lo, t1_hi, y1):
    """Summed y1 over intervals of t1 covering each t0 interval (`losses.py:60-84`)."""
    cy1 = jnp.concatenate([jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    from neurad_tpu.core.math_utils import searchsorted_dense, take_along_small

    idx_lo = jnp.clip(searchsorted_dense(t1_lo, t0_lo, side="right") - 1, 0, y1.shape[-1] - 1)
    idx_hi = jnp.clip(searchsorted_dense(t1_hi, t0_hi, side="left"), 0, y1.shape[-1])
    cy1_lo = take_along_small(cy1, idx_lo)
    cy1_hi = take_along_small(cy1, idx_hi)
    return cy1_hi - cy1_lo


def lossfun_outer(t: jnp.ndarray, w: jnp.ndarray, t_env: jnp.ndarray, w_env: jnp.ndarray) -> jnp.ndarray:
    """Histogram-bound violation (`losses.py:87-104`)."""
    w_outer = _outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + EPS)


def interlevel_loss(
    weights_list: Sequence[jnp.ndarray], sdist_list: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """MipNeRF-360 proposal loss (`losses.py:115-133`).

    weights_list[i]: [R, S_i, 1]; sdist_list[i]: [R, S_i + 1]; last entry = NeRF.
    """
    c = jax.lax.stop_gradient(sdist_list[-1])
    w = jax.lax.stop_gradient(weights_list[-1][..., 0])
    loss = 0.0
    for sdist, weights in zip(sdist_list[:-1], weights_list[:-1]):
        loss += jnp.mean(lossfun_outer(c, w, sdist, weights[..., 0]))
    return loss


def lossfun_distortion(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-ray distortion (`losses.py:137-149`)."""
    ut = (t[..., 1:] + t[..., :-1]) / 2
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(weights_list: Sequence[jnp.ndarray], sdist_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """MipNeRF-360 distortion on the final samples (`losses.py:151-156`)."""
    return jnp.mean(lossfun_distortion(sdist_list[-1], weights_list[-1][..., 0]))


# ---------------------------------------------------------------------------
# ZipNeRF anti-aliased interlevel
# ---------------------------------------------------------------------------


def _blur_stepfun(x: jnp.ndarray, y: jnp.ndarray, r: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Box-blur a step function (`losses.py:628-638`)."""
    from neurad_tpu.core.math_utils import take_along_small

    xr_cat = jnp.concatenate([x - r, x + r], axis=-1)
    xr_idx = jnp.argsort(xr_cat, axis=-1)
    xr = take_along_small(xr_cat, xr_idx)
    y1 = (
        jnp.concatenate([y, jnp.zeros_like(y[..., :1])], axis=-1)
        - jnp.concatenate([jnp.zeros_like(y[..., :1]), y], axis=-1)
    ) / (2.0 * r)
    y2 = take_along_small(jnp.concatenate([y1, -y1], axis=-1), xr_idx[..., :-1])
    yr = jnp.clip(jnp.cumsum((xr[..., 1:] - xr[..., :-1]) * jnp.cumsum(y2, axis=-1), axis=-1), 0.0, None)
    yr = jnp.concatenate([jnp.zeros_like(yr[..., :1]), yr], axis=-1)
    return xr, yr


def _sorted_interp_quad(x, xp, fpdf, fcdf):
    """Piecewise-quadratic CDF interpolation (`losses.py:641-656`)."""
    from neurad_tpu.core.math_utils import searchsorted_dense, take_along_small

    right_idx = searchsorted_dense(xp, x, side="left")
    left_idx = jnp.clip(right_idx - 1, 0, None)
    right_idx = jnp.clip(right_idx, None, xp.shape[-1] - 1)

    xp0 = take_along_small(xp, left_idx)
    xp1 = take_along_small(xp, right_idx)
    fpdf0 = take_along_small(fpdf, left_idx)
    fpdf1 = take_along_small(fpdf, right_idx)
    fcdf0 = take_along_small(fcdf, left_idx)

    offset = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0)), 0.0, 1.0)
    return fcdf0 + (x - xp0) * (fpdf0 + fpdf1 * offset + fpdf0 * (1.0 - offset)) * 0.5


def zipnerf_interlevel_loss(
    weights_list: Sequence[jnp.ndarray], sdist_list: Sequence[jnp.ndarray], per_ray: bool = False
) -> jnp.ndarray:
    """Anti-aliased interlevel loss (`losses.py:659-705`), mean-reduced like the
    reference (NeuRAD uses mult 1e-3 with this reduction). per_ray=True returns
    the per-ray values [R] instead of the mean (for chunked evaluation)."""
    pulse_widths = [0.03, 0.003]
    c = jax.lax.stop_gradient(sdist_list[-1])
    w = jax.lax.stop_gradient(weights_list[-1][..., 0])
    accum_w = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.concatenate([w[..., :-1], w[..., -1:] + (1.0 - accum_w)], axis=-1)

    w_norm = w / (c[..., 1:] - c[..., :-1])
    loss = 0.0
    for i, (sdist, weights) in enumerate(zip(sdist_list[:-1], weights_list[:-1])):
        cp = sdist
        wp = weights[..., 0]
        c_, w_ = _blur_stepfun(c, w_norm, pulse_widths[min(i, len(pulse_widths) - 1)])

        area = 0.5 * (w_[..., 1:] + w_[..., :-1]) * (c_[..., 1:] - c_[..., :-1])
        cdf = jnp.concatenate([jnp.zeros_like(area[..., :1]), jnp.cumsum(area, axis=-1)], axis=-1)

        c_ = jnp.concatenate([jnp.zeros_like(c_[..., :1]), c_, jnp.ones_like(c_[..., :1])], axis=-1)
        w_ = jnp.concatenate([jnp.zeros_like(w_[..., :1]), w_, jnp.zeros_like(w_[..., :1])], axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1)

        cdf_interp = _sorted_interp_quad(cp, c_, w_, cdf)
        w_s = jnp.diff(cdf_interp, axis=-1)
        ray_vals = jnp.sum(jnp.clip(w_s - wp, 0.0, None) ** 2 / (wp + 1e-5), axis=-1)
        loss += ray_vals if per_ray else jnp.mean(ray_vals)
    return loss


# ---------------------------------------------------------------------------
# Depth losses
# ---------------------------------------------------------------------------


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over masked elements; 0 when mask is empty."""
    denom = jnp.clip(jnp.sum(mask), 1.0, None)
    return jnp.sum(jnp.where(mask, x, 0.0)) / denom


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """q-quantile of the masked elements of x (static-shape: invalid entries are
    pushed to +inf, then we index the sorted array at a mask-aware position).

    Linear interpolation between the bracketing order statistics — the
    torch.quantile default the reference relies on (`models/neurad.py:496`);
    the round-4 full-model loss oracle caught the floor-only variant diverging
    by ~4% on the quantile-masked depth loss."""
    flat = jnp.where(mask.reshape(-1), x.reshape(-1), jnp.inf)
    srt = jnp.sort(flat)
    n = jnp.clip(jnp.sum(mask), 1, None)
    pos = q * (n - 1).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, flat.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, (n - 1).astype(jnp.int32))
    frac = pos - lo.astype(jnp.float32)
    # where frac == 0, srt[hi] may be +inf (masked) — keep it out of the lerp
    return jnp.where(frac > 0, srt[lo] * (1.0 - frac) + srt[hi] * frac, srt[lo])


def gradient_scaling_by_distance_squared(values: jnp.ndarray, ray_dist: jnp.ndarray) -> jnp.ndarray:
    """Scale gradients (not values) by clamp(dist^2, 0, 1) (`losses.py:549-579`)."""
    scale = jnp.clip(ray_dist**2, 0.0, 1.0)
    return values * scale + jax.lax.stop_gradient(values * (1.0 - scale))


def depth_ranking_loss(rendered_depth: jnp.ndarray, gt_depth: jnp.ndarray) -> jnp.ndarray:
    """SparseNeRF depth ranking loss on pair-sampled rays (`losses.py:628-645`)."""
    m = 1e-4
    n = (rendered_depth.shape[0] // 2) * 2
    rendered_depth, gt_depth = rendered_depth[:n], gt_depth[:n]
    dpt_diff = gt_depth[::2] - gt_depth[1::2]
    out_diff = rendered_depth[::2] - rendered_depth[1::2] + m
    differing = jnp.sign(dpt_diff) != jnp.sign(out_diff)
    return masked_mean(out_diff * jnp.sign(out_diff), differing)


def ds_nerf_depth_loss(
    weights: jnp.ndarray, termination_depth: jnp.ndarray, steps: jnp.ndarray, lengths: jnp.ndarray, sigma: jnp.ndarray
) -> jnp.ndarray:
    """DS-NeRF likelihood depth loss (`losses.py:227-253`)."""
    depth_mask = termination_depth > 0
    loss = -jnp.log(weights + EPS) * jnp.exp(-((steps - termination_depth[:, None]) ** 2) / (2 * sigma)) * lengths
    loss = jnp.sum(loss, axis=-2) * depth_mask
    return jnp.mean(loss)


def urban_radiance_field_depth_loss(
    weights: jnp.ndarray, termination_depth: jnp.ndarray, predicted_depth: jnp.ndarray, steps: jnp.ndarray, sigma: jnp.ndarray
) -> jnp.ndarray:
    """URF depth loss: expected-depth + line-of-sight terms (`losses.py:256-292`)."""
    depth_mask = termination_depth > 0
    expected_depth_loss = (termination_depth - predicted_depth) ** 2
    line_of_sight_ends = termination_depth[:, None] - EPS
    target_distribution = jnp.exp(-((steps - termination_depth[:, None]) ** 2) / (2 * sigma))
    target_distribution = target_distribution / jnp.clip(
        jnp.sum(target_distribution, axis=-2, keepdims=True), EPS, None
    )
    before = steps < line_of_sight_ends
    line_of_sight_loss = jnp.sum(jnp.where(before, (weights - target_distribution) ** 2, 0.0), axis=-2)
    loss = (expected_depth_loss + line_of_sight_loss) * depth_mask
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# SSIM / PSNR (dm_pix unavailable in this image; implemented directly)
# ---------------------------------------------------------------------------


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.clip(mse, 1e-12, None))


def ssim(
    pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0, filter_size: int = 11, sigma: float = 1.5
) -> jnp.ndarray:
    """SSIM with gaussian windows, matching torchmetrics defaults
    (k1=0.01, k2=0.03). Inputs [H, W, C] in [0, max_val]."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    half = filter_size // 2
    offs = jnp.arange(-half, half + 1, dtype=pred.dtype)
    g = jnp.exp(-(offs**2) / (2 * sigma**2))
    g = g / g.sum()

    def blur(img):
        # separable gaussian, valid padding, over H then W; channels vectorized
        x = jnp.moveaxis(img, -1, 0)[:, None]  # [C,1,H,W]
        kh = g.reshape(1, 1, -1, 1)
        kw = g.reshape(1, 1, 1, -1)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
        return jnp.moveaxis(x[:, 0], 0, -1)

    mu_p, mu_g = blur(pred), blur(gt)
    mu_p2, mu_g2, mu_pg = mu_p**2, mu_g**2, mu_p * mu_g
    sigma_p2 = blur(pred**2) - mu_p2
    sigma_g2 = blur(gt**2) - mu_g2
    sigma_pg = blur(pred * gt) - mu_pg
    num = (2 * mu_pg + c1) * (2 * sigma_pg + c2)
    den = (mu_p2 + mu_g2 + c1) * (sigma_p2 + sigma_g2 + c2)
    return jnp.mean(num / den)
