"""Torch-oracle test for the SSIM eval metric (the last eval metric without
one — LPIPS/FID got theirs in round 3).

The oracle reimplements torchmetrics' StructuralSimilarityIndexMeasure
protocol faithfully from its source (torchmetrics functional/image/ssim.py,
defaults: gaussian_kernel=True, kernel_size=11, sigma=1.5, k1=0.01, k2=0.03,
data_range=1.0): reflect-pad by kernel//2, grouped conv2d, crop the pad off
the ssim map, mean over the rest. The reference repo scores eval images with
exactly this metric (`models/neurad.py:265-267,584-587`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from neurad_tpu.model_components import losses as L  # noqa: E402


def _torchmetrics_ssim(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    """[H, W, C] in [0, data_range] -> scalar, torchmetrics protocol."""
    kernel_size, sigma = 11, 1.5
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    p = torch.from_numpy(pred).permute(2, 0, 1)[None].double()
    g = torch.from_numpy(gt).permute(2, 0, 1)[None].double()
    ch = p.shape[1]

    coords = torch.arange(kernel_size, dtype=torch.double) - (kernel_size - 1) / 2.0
    g1d = torch.exp(-(coords**2) / (2 * sigma**2))
    g1d = g1d / g1d.sum()
    kernel = (g1d[:, None] @ g1d[None, :]).expand(ch, 1, kernel_size, kernel_size)

    pad = (kernel_size - 1) // 2
    p_pad = F.pad(p, (pad, pad, pad, pad), mode="reflect")
    g_pad = F.pad(g, (pad, pad, pad, pad), mode="reflect")

    inputs = torch.cat([p_pad, g_pad, p_pad * p_pad, g_pad * g_pad, p_pad * g_pad])
    outputs = F.conv2d(inputs, kernel, groups=ch)
    mu_p, mu_g, s_pp, s_gg, s_pg = [outputs[i : i + 1] for i in range(5)]
    sigma_p = s_pp - mu_p * mu_p
    sigma_g = s_gg - mu_g * mu_g
    sigma_pg = s_pg - mu_p * mu_g
    num = (2 * mu_p * mu_g + c1) * (2 * sigma_pg + c2)
    den = (mu_p**2 + mu_g**2 + c1) * (sigma_p + sigma_g + c2)
    ssim_map = num / den
    ssim_map = ssim_map[..., pad:-pad, pad:-pad]
    return float(ssim_map.mean())


@pytest.mark.parametrize("case", ["random", "correlated", "anticorrelated"])
def test_ssim_matches_torchmetrics_protocol(case):
    rng = np.random.default_rng(3)
    gt = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    if case == "random":
        pred = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    elif case == "correlated":
        pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
    else:
        # structurally inverted images produce NEGATIVE ssim — the metric's
        # range is [-1, 1], so negative values in an A/B are legitimate for
        # bad renders, not automatically an eval bug
        pred = (1.0 - gt).astype(np.float32)

    want = _torchmetrics_ssim(pred, gt)
    got = float(L.ssim(jnp.asarray(pred), jnp.asarray(gt)))
    assert got == pytest.approx(want, abs=2e-5), (got, want)
    if case == "anticorrelated":
        assert want < 0


def test_ssim_identical_is_one():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    assert float(L.ssim(jnp.asarray(img), jnp.asarray(img))) == pytest.approx(1.0, abs=1e-5)
