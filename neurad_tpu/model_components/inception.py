"""Inception-v3 feature graph for FID (the pytorch-fid / torchmetrics protocol).

TPU-native counterpart of the reference's torchmetrics FID backbone
(`nerfstudio/pipelines/ad_pipeline.py:26,118-142` uses
`torchmetrics.image.fid.FrechetInceptionDistance`, whose default feature
extractor is pytorch-fid's InceptionV3 at the 2048-d pool3 layer).

This module implements the FID-variant Inception-v3 graph exactly:
- input images in [0, 1], resized to 299x299 (bilinear, half-pixel centers,
  no antialias — torch `F.interpolate(..., mode='bilinear')` semantics),
  then scaled to [-1, 1];
- BasicConv2d = conv (no bias) + batchnorm (eps 1e-3) + relu. Batchnorm is
  FOLDED into the conv weights at load time (inference-only graph);
- the pytorch-fid patches vs torchvision: every in-block 3x3/1-stride avg pool
  uses count_include_pad=False (FIDInceptionA/C/E_1), and Mixed_7c's pool
  branch uses MAX pooling (FIDInceptionE_2);
- output = 2048-d global-average-pooled pool3 features.

Weights: `load_inception_params` reads an .npz of the torch state_dict
(pytorch-fid's `pt_inception-2015-12-05` or torchvision `inception_v3`,
converted by `neurad_tpu/scripts/convert_perceptual_weights.py`). There is no
random fallback here — FID against random inception features is meaningless;
callers fall back to the VGG feature statistic (utils/eval_metrics.py) and
warn when no weights are supplied.

The graph (and its torch-oracle test, tests/model_components/
test_perceptual_exact.py) is written from the Inception-v3 paper
(Szegedy et al., arXiv:1512.00567) and the published FID protocol.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# architecture table: (name, in_ch, out_ch, (kh, kw), (sh, sw), (ph, pw))
# names follow torchvision's state-dict layout so converted weights map 1:1.
# ---------------------------------------------------------------------------


def _block_a(prefix: str, in_ch: int, pool: int) -> List[Tuple]:
    return [
        (f"{prefix}.branch1x1", in_ch, 64, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch5x5_1", in_ch, 48, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch5x5_2", 48, 64, (5, 5), (1, 1), (2, 2)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 64, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch_pool", in_ch, pool, (1, 1), (1, 1), (0, 0)),
    ]


def _block_b(prefix: str, in_ch: int) -> List[Tuple]:
    return [
        (f"{prefix}.branch3x3", in_ch, 384, (3, 3), (2, 2), (0, 0)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 64, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), (2, 2), (0, 0)),
    ]


def _block_c(prefix: str, in_ch: int, c7: int) -> List[Tuple]:
    return [
        (f"{prefix}.branch1x1", in_ch, 192, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7_1", in_ch, c7, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7_2", c7, c7, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch7x7_3", c7, 192, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7dbl_1", in_ch, c7, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch_pool", in_ch, 192, (1, 1), (1, 1), (0, 0)),
    ]


def _block_d(prefix: str, in_ch: int) -> List[Tuple]:
    return [
        (f"{prefix}.branch3x3_1", in_ch, 192, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3_2", 192, 320, (3, 3), (2, 2), (0, 0)),
        (f"{prefix}.branch7x7x3_1", in_ch, 192, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7x3_4", 192, 192, (3, 3), (2, 2), (0, 0)),
    ]


def _block_e(prefix: str, in_ch: int) -> List[Tuple]:
    return [
        (f"{prefix}.branch1x1", in_ch, 320, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3_1", in_ch, 384, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3_2a", 384, 384, (1, 3), (1, 1), (0, 1)),
        (f"{prefix}.branch3x3_2b", 384, 384, (3, 1), (1, 1), (1, 0)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 448, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 448, 384, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), (1, 1), (0, 1)),
        (f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), (1, 1), (1, 0)),
        (f"{prefix}.branch_pool", in_ch, 192, (1, 1), (1, 1), (0, 0)),
    ]


def conv_specs() -> List[Tuple]:
    """Every BasicConv2d in the network, in torchvision state-dict naming."""
    specs: List[Tuple] = [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), (2, 2), (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), (1, 1), (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), (1, 1), (1, 1)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), (1, 1), (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), (1, 1), (0, 0)),
    ]
    specs += _block_a("Mixed_5b", 192, 32)
    specs += _block_a("Mixed_5c", 256, 64)
    specs += _block_a("Mixed_5d", 288, 64)
    specs += _block_b("Mixed_6a", 288)
    specs += _block_c("Mixed_6b", 768, 128)
    specs += _block_c("Mixed_6c", 768, 160)
    specs += _block_c("Mixed_6d", 768, 160)
    specs += _block_c("Mixed_6e", 768, 192)
    specs += _block_d("Mixed_7a", 768)
    specs += _block_e("Mixed_7b", 1280)
    specs += _block_e("Mixed_7c", 2048)
    return specs


def fold_bn(
    w: np.ndarray, gamma: np.ndarray, beta: np.ndarray, mean: np.ndarray, var: np.ndarray, eps: float = 1e-3
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold batchnorm into the (bias-free) conv: returns (w', b') with
    w' [kh, kw, in, out] (HWIO) from torch [out, in, kh, kw]."""
    scale = gamma / np.sqrt(var + eps)
    w_f = np.transpose(w, (2, 3, 1, 0)) * scale[None, None, None, :]
    b_f = beta - mean * scale
    return w_f.astype(np.float32), b_f.astype(np.float32)


def load_inception_params(path: str) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Load a converted torch state_dict (.npz) into folded {name: (w, b)}.

    Accepts both torchvision `inception_v3` and pytorch-fid key layouts (both
    use `<name>.conv.weight` + `<name>.bn.{weight,bias,running_mean,running_var}`).
    Validates every shape against the architecture table."""
    raw = np.load(path)
    params = {}
    for name, in_ch, out_ch, k, _s, _p in conv_specs():
        w = raw[f"{name}.conv.weight"]
        expect = (out_ch, in_ch, k[0], k[1])
        if w.shape != expect:
            raise ValueError(f"{name}: weight shape {w.shape} != expected {expect}")
        w_f, b_f = fold_bn(
            w,
            raw[f"{name}.bn.weight"],
            raw[f"{name}.bn.bias"],
            raw[f"{name}.bn.running_mean"],
            raw[f"{name}.bn.running_var"],
        )
        params[name] = (jnp.asarray(w_f), jnp.asarray(b_f))
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv(params, name: str, x: jnp.ndarray, stride=(1, 1), pad=(0, 0)) -> jnp.ndarray:
    w, b = params[name]
    y = jax.lax.conv_general_dilated(
        x, w, stride, [(pad[0], pad[0]), (pad[1], pad[1])], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jax.nn.relu(y + b)


def _maxpool(x, k=3, s=2, p=0):
    pads = ((0, 0), (p, p), (p, p), (0, 0))
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), pads)


def _avgpool_excl(x, k=3):
    """3x3 stride-1 SAME avg pool with count_include_pad=False (the pytorch-fid
    patch): divide the window sum by the number of VALID (in-bounds) taps."""
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), pads)
    return s / cnt


def _run_a(params, prefix, x, use_max_pool=False):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b5 = _conv(params, f"{prefix}.branch5x5_2", _conv(params, f"{prefix}.branch5x5_1", x), pad=(2, 2))
    b3 = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_2", b3, pad=(1, 1))
    b3 = _conv(params, f"{prefix}.branch3x3dbl_3", b3, pad=(1, 1))
    bp = _conv(params, f"{prefix}.branch_pool", _avgpool_excl(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _run_b(params, prefix, x):
    b3 = _conv(params, f"{prefix}.branch3x3", x, stride=(2, 2))
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd, pad=(1, 1))
    bd = _conv(params, f"{prefix}.branch3x3dbl_3", bd, stride=(2, 2))
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _run_c(params, prefix, x):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b7 = _conv(params, f"{prefix}.branch7x7_1", x)
    b7 = _conv(params, f"{prefix}.branch7x7_2", b7, pad=(0, 3))
    b7 = _conv(params, f"{prefix}.branch7x7_3", b7, pad=(3, 0))
    bd = _conv(params, f"{prefix}.branch7x7dbl_1", x)
    bd = _conv(params, f"{prefix}.branch7x7dbl_2", bd, pad=(3, 0))
    bd = _conv(params, f"{prefix}.branch7x7dbl_3", bd, pad=(0, 3))
    bd = _conv(params, f"{prefix}.branch7x7dbl_4", bd, pad=(3, 0))
    bd = _conv(params, f"{prefix}.branch7x7dbl_5", bd, pad=(0, 3))
    bp = _conv(params, f"{prefix}.branch_pool", _avgpool_excl(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _run_d(params, prefix, x):
    b3 = _conv(params, f"{prefix}.branch3x3_1", x)
    b3 = _conv(params, f"{prefix}.branch3x3_2", b3, stride=(2, 2))
    b7 = _conv(params, f"{prefix}.branch7x7x3_1", x)
    b7 = _conv(params, f"{prefix}.branch7x7x3_2", b7, pad=(0, 3))
    b7 = _conv(params, f"{prefix}.branch7x7x3_3", b7, pad=(3, 0))
    b7 = _conv(params, f"{prefix}.branch7x7x3_4", b7, stride=(2, 2))
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _run_e(params, prefix, x, pool_is_max: bool):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b3 = _conv(params, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [
            _conv(params, f"{prefix}.branch3x3_2a", b3, pad=(0, 1)),
            _conv(params, f"{prefix}.branch3x3_2b", b3, pad=(1, 0)),
        ],
        axis=-1,
    )
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd, pad=(1, 1))
    bd = jnp.concatenate(
        [
            _conv(params, f"{prefix}.branch3x3dbl_3a", bd, pad=(0, 1)),
            _conv(params, f"{prefix}.branch3x3dbl_3b", bd, pad=(1, 0)),
        ],
        axis=-1,
    )
    pooled = _maxpool(x, k=3, s=1, p=1) if pool_is_max else _avgpool_excl(x)
    bp = _conv(params, f"{prefix}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: Dict, images: jnp.ndarray, resize: bool = True) -> jnp.ndarray:
    """FID features: [B, H, W, 3] images in [0, 1] -> [B, 2048] pool3 features.

    resize=True applies the FID protocol's bilinear 299x299 resize; the
    [-1, 1] input scaling is always applied (pytorch-fid `normalize_input`)."""
    x = images.astype(jnp.float32)
    if resize and (x.shape[1] != 299 or x.shape[2] != 299):
        # antialias=False: torch F.interpolate(mode='bilinear') never
        # antialiases, and pytorch-fid/torchmetrics resize with exactly that —
        # with the default antialias=True a 600x800->299 downscale diverges by
        # up to ~0.56 per pixel from the torch protocol.
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear", antialias=False)
    x = x * 2.0 - 1.0
    x = _conv(params, "Conv2d_1a_3x3", x, stride=(2, 2))
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x, pad=(1, 1))
    x = _maxpool(x)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _maxpool(x)
    x = _run_a(params, "Mixed_5b", x)
    x = _run_a(params, "Mixed_5c", x)
    x = _run_a(params, "Mixed_5d", x)
    x = _run_b(params, "Mixed_6a", x)
    x = _run_c(params, "Mixed_6b", x)
    x = _run_c(params, "Mixed_6c", x)
    x = _run_c(params, "Mixed_6d", x)
    x = _run_d(params, "Mixed_7a", x)
    x = _run_e(params, "Mixed_7b", x, pool_is_max=False)
    x = _run_e(params, "Mixed_7c", x, pool_is_max=True)  # FIDInceptionE_2
    return jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 2048]
