"""Perceptual eval metrics: LPIPS and FID (+ the AD novel-view FID suite inputs).

TPU-native counterpart of the torchmetrics usage in the reference
(`models/neurad.py:265-267` LPIPS, `pipelines/ad_pipeline.py:26,172-192` FID with
lane/vertical/actor shifts).

Two operating modes:
- EXACT (torchmetrics-comparable): set NEURAD_TPU_LPIPS_WEIGHTS to a converted
  lpips-vgg16 .npz and/or NEURAD_TPU_INCEPTION_WEIGHTS to a converted
  pytorch-fid InceptionV3 .npz (see scripts/convert_perceptual_weights.py).
  LPIPS then runs the VGG16+linear-head graph and FID the 299x299 pool3
  Inception protocol — both torch-oracle-tested
  (tests/model_components/test_perceptual_exact.py).
- FALLBACK: without weights (this image has no egress), metrics run on the
  flax VGG19 backbone from `model_components/perceptual.py` (pretrained via
  NEURAD_TPU_VGG19_WEIGHTS if available, else a fixed random backbone). Valid
  for *relative* comparisons within a run; a loud warning marks the numbers as
  not comparable to torchmetrics.
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.model_components.perceptual import IMAGENET_MEAN, IMAGENET_STD, Vgg19Slices, load_vgg19_params

_EXACT_LPIPS_CACHE: dict = {}
_INCEPTION_CACHE: dict = {}


def _exact_lpips_params() -> Optional[dict]:
    """Load (and cache) the exact LPIPS weights if the env var points at them."""
    path = os.environ.get("NEURAD_TPU_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    if path not in _EXACT_LPIPS_CACHE:
        from neurad_tpu.model_components.lpips_exact import load_lpips_params

        _EXACT_LPIPS_CACHE[path] = load_lpips_params(path)
    return _EXACT_LPIPS_CACHE[path]


def _inception_params() -> Optional[dict]:
    path = os.environ.get("NEURAD_TPU_INCEPTION_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    if path not in _INCEPTION_CACHE:
        from neurad_tpu.model_components.inception import load_inception_params

        _INCEPTION_CACHE[path] = load_inception_params(path)
    return _INCEPTION_CACHE[path]


def _warn_fallback(metric: str, env: str) -> None:
    warnings.warn(
        f"{metric}: no pretrained weights ({env} unset/missing) — falling back to "
        "the VGG19 feature statistic. Numbers are RELATIVE-ONLY, not comparable "
        "to torchmetrics. Convert weights with scripts/convert_perceptual_weights.py.",
        stacklevel=3,
    )


def lpips(
    vgg_params: dict, pred: jnp.ndarray, target: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """LPIPS. With NEURAD_TPU_LPIPS_WEIGHTS set: the exact torchmetrics-equivalent
    VGG16+linear-heads graph (`model_components/lpips_exact.py`; vgg_params is
    ignored). Otherwise: unit-normalized VGG19 feature differences, spatially
    averaged and summed over layers (Zhang et al. 2018, uniform layer weights in
    lieu of the learned linear heads). Inputs [H, W, 3] or [B, H, W, 3] in [0,1]."""
    exact = _exact_lpips_params()
    if exact is not None:
        from neurad_tpu.model_components.lpips_exact import lpips_exact

        return lpips_exact(exact, pred, target)
    _warn_fallback("LPIPS", "NEURAD_TPU_LPIPS_WEIGHTS")
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


def _inception_features(params: dict, images: List[np.ndarray]) -> np.ndarray:
    """FID-protocol features: 299x299 bilinear resize, [-1,1] scaling, pool3."""
    from neurad_tpu.model_components.inception import inception_pool3

    feats = []
    for img in images:
        x = jnp.asarray(img, dtype=jnp.float32)[None]
        feats.append(np.asarray(inception_pool3(params, x)[0]))
    return np.stack(feats)


def fid(
    real_images: List[np.ndarray], fake_images: List[np.ndarray], vgg_params: Optional[dict] = None
) -> float:
    """FID over image lists [H, W, 3] in [0,1] (torchmetrics FID counterpart).

    With NEURAD_TPU_INCEPTION_WEIGHTS set: the exact pytorch-fid protocol
    (299x299, InceptionV3 pool3 2048-d, `model_components/inception.py`).
    Otherwise: VGG19 pooled-feature Fréchet distance (relative-only)."""
    inception = _inception_params()
    if inception is not None:
        fr = _inception_features(inception, real_images)
        ff = _inception_features(inception, fake_images)
        mu1, mu2 = fr.mean(0), ff.mean(0)
        s1 = np.cov(fr, rowvar=False) + 1e-6 * np.eye(fr.shape[1])
        s2 = np.cov(ff, rowvar=False) + 1e-6 * np.eye(ff.shape[1])
        return frechet_distance(mu1, s1, mu2, s2)
    _warn_fallback("FID", "NEURAD_TPU_INCEPTION_WEIGHTS")
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
