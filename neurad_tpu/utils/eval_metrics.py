"""Perceptual eval metrics: LPIPS and FID (+ the AD novel-view FID suite inputs).

TPU-native counterpart of the torchmetrics usage in the reference
(`models/neurad.py:265-267` LPIPS, `pipelines/ad_pipeline.py:26,172-192` FID with
lane/vertical/actor shifts). This image has no torchvision/torchmetrics and no
egress, so both metrics run on the flax VGG19 backbone from
`model_components/perceptual.py` — pretrained weights load from
NEURAD_TPU_VGG19_WEIGHTS when available, otherwise a fixed random backbone is
used (valid for *relative* comparisons within a run; absolute numbers are not
comparable to torchmetrics until weights are supplied).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.model_components.perceptual import IMAGENET_MEAN, IMAGENET_STD, Vgg19Slices, load_vgg19_params


def lpips(
    vgg_params: dict, pred: jnp.ndarray, target: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """LPIPS-style distance: unit-normalized VGG feature differences, spatially
    averaged and summed over layers (Zhang et al. 2018, uniform layer weights in
    lieu of the learned linear heads). Inputs [H, W, 3] or [B, H, W, 3] in [0,1]."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    if normalize:
        pred = (pred - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        target = (target - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    module = Vgg19Slices()
    both = jnp.concatenate([pred, target], axis=0)
    feats = module.apply(vgg_params, both)
    n = pred.shape[0]
    total = 0.0
    for f in feats:
        f = f / jnp.clip(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-10, None)
        d = jnp.mean((f[:n] - f[n:]) ** 2, axis=(1, 2, 3))
        total = total + d
    return jnp.mean(total)


def _features_for_fid(vgg_params: dict, images: List[np.ndarray], patch: int = 64) -> np.ndarray:
    """Pooled deep features per image for FID statistics."""
    module = Vgg19Slices()
    feats = []
    for img in images:
        x = jnp.asarray(img, dtype=jnp.float32)[None]
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        out = module.apply(vgg_params, x)[-1]  # deepest slice
        feats.append(np.asarray(jnp.mean(out, axis=(1, 2))[0]))  # global average pool
    return np.stack(feats)


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """Fréchet distance between two gaussians (standard FID formula)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(covmean))


def fid(
    real_images: List[np.ndarray], fake_images: List[np.ndarray], vgg_params: Optional[dict] = None
) -> float:
    """FID over image lists [H, W, 3] in [0,1] (torchmetrics FID counterpart)."""
    if vgg_params is None:
        vgg_params = load_vgg19_params(jax.random.PRNGKey(0))
    fr = _features_for_fid(vgg_params, real_images)
    ff = _features_for_fid(vgg_params, fake_images)
    mu1, mu2 = fr.mean(0), ff.mean(0)
    s1 = np.cov(fr, rowvar=False) + 1e-6 * np.eye(fr.shape[1])
    s2 = np.cov(ff, rowvar=False) + 1e-6 * np.eye(ff.shape[1])
    return frechet_distance(mu1, s1, mu2, s2)


def fid_suite_shifts(lane_shift_sign: int = 1) -> dict:
    """The AD novel-view FID perturbations (`ad_pipeline.py:172-192`):
    lane shifts +-2/3 m (signed per sequence), vertical +1 m."""
    return {
        "lane_shift_2m": (lane_shift_sign * 2.0, 0.0),
        "lane_shift_3m": (lane_shift_sign * 3.0, 0.0),
        "vertical_shift_1m": (0.0, 1.0),
    }
