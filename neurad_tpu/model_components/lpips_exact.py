"""Exact LPIPS (Zhang et al. 2018, arXiv:1801.03924) — VGG16 + learned linear heads.

TPU-native counterpart of the reference's torchmetrics LPIPS usage
(`nerfstudio/models/neurad.py:265-267`:
`LearnedPerceptualImagePatchSimilarity(net_type="vgg")`), which wraps the
`lpips` package's VGG16 variant:

  1. scale inputs from [-1, 1] by the paper's fixed channel shift/scale;
  2. VGG16 activations at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3;
  3. unit-normalize each activation over channels;
  4. squared difference -> learned 1x1-conv "linear head" per layer
     (non-negative weights, out_channels=1);
  5. spatial average, sum over the 5 layers.

Weights load from an .npz converted by
`neurad_tpu/scripts/convert_perceptual_weights.py` (torchvision
`vgg16.features` keys + lpips `lin{i}.model.1.weight` heads); without weights
callers fall back to utils/eval_metrics.lpips (uniform-weight VGG19 variant)
with a loud warning — a random-backbone LPIPS is relative-only.

The graph is validated against a self-authored torch oracle with random
weights (tests/model_components/test_perceptual_exact.py), so a user-supplied
weight file is verified by construction: the conversion script checks the
shape manifest, and the graph is proven equal to the torch formulation.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the paper's fixed input normalization (lpips ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# torchvision vgg16.features conv indices and channels; LPIPS taps the relu
# AFTER features index {3, 8, 15, 22, 29}.
_VGG16_CONVS: List[Tuple[int, int, int]] = [  # (features_idx, in_ch, out_ch)
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_TAP_AFTER = {3, 8, 15, 22, 29}  # features indices whose relu output is tapped
_POOL_AT = {4, 9, 16, 23}  # maxpool positions in vgg16.features
_HEAD_CH = [64, 128, 256, 512, 512]


def load_lpips_params(path: str) -> Dict:
    """Load converted LPIPS weights: {'convs': [(w,b)...], 'heads': [w...]}.

    Expects torchvision `features.N.weight/bias` for the 13 VGG16 convs and
    `lin{i}.model.1.weight` ([1, C, 1, 1]) for the 5 heads. Shapes validated."""
    raw = np.load(path)
    convs = []
    for idx, in_ch, out_ch in _VGG16_CONVS:
        w = raw[f"features.{idx}.weight"]
        if w.shape != (out_ch, in_ch, 3, 3):
            raise ValueError(f"features.{idx}: {w.shape} != {(out_ch, in_ch, 3, 3)}")
        convs.append(
            (
                jnp.asarray(np.transpose(w, (2, 3, 1, 0)).astype(np.float32)),
                jnp.asarray(raw[f"features.{idx}.bias"].astype(np.float32)),
            )
        )
    heads = []
    for i, c in enumerate(_HEAD_CH):
        w = raw[f"lin{i}.model.1.weight"]
        if w.shape != (1, c, 1, 1):
            raise ValueError(f"lin{i}: {w.shape} != {(1, c, 1, 1)}")
        heads.append(jnp.asarray(w.reshape(c).astype(np.float32)))
    return {"convs": convs, "heads": heads}


def _vgg16_taps(convs, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Run vgg16.features in order, returning the 5 tapped relu activations."""
    taps = []
    ci = 0
    for fi in range(30):  # features indices 0..29
        if fi in _POOL_AT:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        elif fi == _VGG16_CONVS[min(ci, 12)][0]:
            w, b = convs[ci]
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            ci += 1
        else:  # relu
            x = jax.nn.relu(x)
            if fi in _TAP_AFTER:
                taps.append(x)
    return taps


def lpips_exact(params: Dict, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """LPIPS(pred, target): [B, H, W, 3] or [H, W, 3] images in [0, 1] -> scalar.

    torchmetrics normalize=True semantics: [0,1] inputs are mapped to [-1,1]
    before the scaling layer."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    both = jnp.concatenate([pred, target], axis=0).astype(jnp.float32)
    both = both * 2.0 - 1.0
    both = (both - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    taps = _vgg16_taps(params["convs"], both)
    n = pred.shape[0]
    total = 0.0
    for f, head in zip(taps, params["heads"]):
        # lpips normalize_tensor: eps added to the norm (not under the sqrt)
        f = f / (jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True)) + 1e-10)
        d2 = (f[:n] - f[n:]) ** 2  # [B, H, W, C]
        # 1x1 conv with non-negative weights == channel-weighted sum
        val = jnp.sum(d2 * head, axis=-1)  # [B, H, W]
        total = total + jnp.mean(val, axis=(1, 2))
    return jnp.mean(total)
