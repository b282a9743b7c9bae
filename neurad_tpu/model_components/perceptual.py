"""VGG19 perceptual loss (pix2pixHD-style) in flax.

TPU-native counterpart of `nerfstudio/model_components/losses.py:582-625`
(VGGPerceptualLossPix2Pix + Vgg19 slices). The reference pulls pretrained weights
from torchvision; this image has no torchvision and no egress, so weights load
from a local file when available (env NEURAD_TPU_VGG19_WEIGHTS pointing at an
.npz of torchvision's `vgg19.features` state dict) and otherwise fall back to a
fixed He-initialized network — random conv features still impose multi-scale
structure (Ulyanov et al., deep image prior) and keep the loss functional.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19.features conv layer indices, grouped into the 5 pix2pixHD
# slices (relu1_1, relu2_1, relu3_1, relu4_1, relu5_1): losses.py:607-613.
_SLICES = [  # (conv output channels per conv in slice, with maxpool positions implied)
    [64],  # slice1: conv1_1 (+relu)
    [64, 128],  # slice2: conv1_2, pool, conv2_1
    [128, 256],  # slice3: conv2_2, pool, conv3_1
    [256, 256, 256, 512],  # slice4: conv3_2..conv3_4, pool, conv4_1
    [512, 512, 512, 512],  # slice5: conv4_2..conv4_4, pool, conv5_1
]
# whether a 2x2 maxpool precedes the conv (matching vgg19 layer order)
_POOL_BEFORE = [
    [False],
    [False, True],
    [False, True],
    [False, False, False, True],
    [False, False, False, True],
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class Vgg19Slices(nn.Module):
    """VGG19 truncated at relu5_1, returning the 5 slice activations (NHWC)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        i_conv = 0
        for chans, pools in zip(_SLICES, _POOL_BEFORE):
            for c, pool in zip(chans, pools):
                # skip pooling once the map is 1px (tiny patches would otherwise
                # produce 0-element tensors and NaN means)
                if pool and min(x.shape[1], x.shape[2]) >= 2:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Conv(c, (3, 3), padding="SAME", name=f"conv_{i_conv}")(x)
                x = nn.relu(x)
                i_conv += 1
            outs.append(x)
        return outs


def load_vgg19_params(rng: jax.Array, sample_hw: int = 32) -> dict:
    """Init VGG19 params; load pretrained weights from NEURAD_TPU_VGG19_WEIGHTS
    (.npz with torchvision `features.N.weight/bias` keys) when present."""
    module = Vgg19Slices()
    # jitted init: eager flax init dispatches hundreds of ops — pathological
    # over the remote-TPU tunnel
    params = jax.jit(lambda r: module.init(r, jnp.zeros((1, sample_hw, sample_hw, 3))))(rng)
    path = os.environ.get("NEURAD_TPU_VGG19_WEIGHTS")
    if not path or not os.path.exists(path):
        return params
    raw = np.load(path)
    # torchvision conv layer indices in vgg19.features for conv1_1..conv5_1
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
    new = dict(params["params"])
    for i, li in enumerate(tv_idx):
        w = raw[f"features.{li}.weight"]  # [out, in, kh, kw] torch layout
        b = raw[f"features.{li}.bias"]
        new[f"conv_{i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> [kh, kw, in, out]
            "bias": jnp.asarray(b),
        }
    return {"params": new}


def vgg19_slices_apply(vgg_params: dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Pure-function VGG19 slice forward (same math as `Vgg19Slices`, no flax
    module context — callable from inside other modules' methods)."""
    p = vgg_params["params"]
    outs = []
    i_conv = 0
    for chans, pools in zip(_SLICES, _POOL_BEFORE):
        for _c, pool in zip(chans, pools):
            if pool and min(x.shape[1], x.shape[2]) >= 2:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            w = p[f"conv_{i_conv}"]["kernel"]  # [kh, kw, in, out]
            b = p[f"conv_{i_conv}"]["bias"]
            x = (
                jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
                + b
            )
            x = jax.nn.relu(x)
            i_conv += 1
        outs.append(x)
    return outs


def vgg_perceptual_loss(
    vgg_params: dict,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: Sequence[float] = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0),
    normalize_inputs: bool = True,
) -> jnp.ndarray:
    """Weighted L1 over the 5 VGG slices (`losses.py:596-605`). Inputs NHWC in [0,1];
    target features are stop-gradiented like the reference's `.detach()`."""
    if normalize_inputs:
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        pred = (pred - mean) / std
        target = (target - mean) / std
    both = jnp.concatenate([pred, target], axis=0)
    feats = vgg19_slices_apply(vgg_params, both)
    n = pred.shape[0]
    loss = 0.0
    for w, f in zip(weights, feats):
        loss += w * jnp.mean(jnp.abs(f[:n] - jax.lax.stop_gradient(f[n:])))
    return loss
