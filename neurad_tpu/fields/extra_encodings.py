"""Additional encodings: Fourier-feature family + tensor decompositions.

TPU-native counterpart of the remaining `nerfstudio/field_components/encodings.py`
classes: FFEncoding 194, RFFEncoding 268, PolyhedronFFEncoding 286,
TensorCPEncoding 474, TensorVMEncoding 523, TriplaneEncoding 592,
KPlanesEncoding 676. grid_sample is replaced by an explicit bilinear gather
(align_corners=True semantics), which XLA fuses cleanly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.math_utils import expected_sin


def _bilinear_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """grid [C, H, W], coords [N, 2] in [-1, 1] (x, y), align_corners=True ->
    [N, C]."""
    h, w = grid.shape[1], grid.shape[2]
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    g = lambda yy, xx: grid[:, yy, xx]  # [C, N]
    out = (
        g(y0, x0) * ((1 - fx) * (1 - fy))
        + g(y0, x1) * (fx * (1 - fy))
        + g(y1, x0) * ((1 - fx) * fy)
        + g(y1, x1) * (fx * fy)
    )
    return out.T  # [N, C]


def _linear_sample_1d(line: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """line [C, R], coords [N] in [-1, 1] -> [N, C]."""
    r = line.shape[1]
    x = (coords + 1.0) * 0.5 * (r - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, r - 1)
    x1 = jnp.clip(x0 + 1, 0, r - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    return (line[:, x0] * (1 - fx) + line[:, x1] * fx).T


class FFEncoding(nn.Module):
    """Fourier features over a fixed basis, with optional mip-NeRF integration
    (`encodings.py:194-265`)."""

    basis: tuple  # static [in_dim, M] matrix as nested tuples
    num_frequencies: int = 10
    min_freq_exp: float = 0.0
    max_freq_exp: float = 8.0
    include_input: bool = False

    @property
    def out_dim(self) -> int:
        return len(self.basis[0]) * self.num_frequencies * 2 + (len(self.basis) if self.include_input else 0)

    def __call__(self, in_tensor: jnp.ndarray, covs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b = jnp.asarray(self.basis)
        scaled = 2.0 * jnp.pi * in_tensor @ b  # [..., M]
        freqs = 2.0 ** jnp.linspace(self.min_freq_exp, self.max_freq_exp, self.num_frequencies)
        scaled = (scaled[..., None] * freqs).reshape(in_tensor.shape[:-1] + (-1,))
        both = jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
        if covs is None:
            out = jnp.sin(both)
        else:
            var = jnp.sum((covs @ b) * b, axis=-2)
            var = (var[..., :, None] * freqs**2).reshape(in_tensor.shape[:-1] + (-1,))
            out = expected_sin(both, jnp.concatenate([var, var], axis=-1))
        if self.include_input:
            out = jnp.concatenate([out, in_tensor], axis=-1)
        return out


def rff_basis(in_dim: int, num_frequencies: int, scale: float, seed: int = 0) -> tuple:
    """Random Fourier basis (`encodings.py:268-283`)."""
    rng = np.random.default_rng(seed)
    return tuple(map(tuple, (rng.normal(0, scale, (in_dim, num_frequencies))).tolist()))


def octahedron_basis() -> tuple:
    """Octahedron vertex basis for PolyhedronFFEncoding (`encodings.py:286-308`)."""
    verts = np.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    return tuple(map(tuple, verts.T.tolist()))


class TensorCPEncoding(nn.Module):
    """TensoRF CP decomposition (`encodings.py:474-520`)."""

    resolution: int = 256
    num_components: int = 24
    init_scale: float = 0.1

    @property
    def out_dim(self) -> int:
        return self.num_components

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        line_coef = self.param(
            "line_coef",
            lambda key: self.init_scale * jax.random.normal(key, (3, self.num_components, self.resolution)),
        )
        shape = in_tensor.shape[:-1]
        x = in_tensor.reshape(-1, 3)
        feats = None
        for axis in range(3):
            f = _linear_sample_1d(line_coef[axis], jax.lax.stop_gradient(x[:, 2 - axis]))
            feats = f if feats is None else feats * f
        return feats.reshape(shape + (self.num_components,))


class TensorVMEncoding(nn.Module):
    """TensoRF vector-matrix decomposition (`encodings.py:523-589`)."""

    resolution: int = 128
    num_components: int = 24
    init_scale: float = 0.1

    @property
    def out_dim(self) -> int:
        return self.num_components * 3

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        plane_coef = self.param(
            "plane_coef",
            lambda key: self.init_scale
            * jax.random.normal(key, (3, self.num_components, self.resolution, self.resolution)),
        )
        line_coef = self.param(
            "line_coef",
            lambda key: self.init_scale * jax.random.normal(key, (3, self.num_components, self.resolution)),
        )
        shape = in_tensor.shape[:-1]
        x = jax.lax.stop_gradient(in_tensor.reshape(-1, 3))
        plane_axes = ((0, 1), (0, 2), (1, 2))
        outs = []
        for i, (a, b) in enumerate(plane_axes):
            pf = _bilinear_sample_2d(plane_coef[i], x[:, (a, b)])
            lf = _linear_sample_1d(line_coef[i], x[:, 2 - i])
            outs.append(pf * lf)
        return jnp.concatenate(outs, axis=-1).reshape(shape + (self.out_dim,))


class TriplaneEncoding(nn.Module):
    """Triplane encoding (`encodings.py:592-673`)."""

    resolution: int = 32
    num_components: int = 64
    init_scale: float = 0.1
    reduce: str = "sum"  # 'sum' | 'product'

    @property
    def out_dim(self) -> int:
        return self.num_components

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        plane_coef = self.param(
            "plane_coef",
            lambda key: self.init_scale
            * jax.random.normal(key, (3, self.num_components, self.resolution, self.resolution)),
        )
        shape = in_tensor.shape[:-1]
        x = jax.lax.stop_gradient(in_tensor.reshape(-1, 3))
        outs = [
            _bilinear_sample_2d(plane_coef[0], x[:, (0, 1)]),
            _bilinear_sample_2d(plane_coef[1], x[:, (0, 2)]),
            _bilinear_sample_2d(plane_coef[2], x[:, (1, 2)]),
        ]
        out = outs[0]
        for o in outs[1:]:
            out = out * o if self.reduce == "product" else out + o
        return out.reshape(shape + (self.num_components,))


class KPlanesEncoding(nn.Module):
    """K-Planes encoding over d-dim inputs (`encodings.py:676-757`): one plane per
    coordinate pair, features combined by product (or sum)."""

    in_dim: int = 4  # 3 space + 1 time
    resolution: int = 64
    num_components: int = 32
    init_scale: float = 0.1
    reduce: str = "product"

    @property
    def out_dim(self) -> int:
        return self.num_components

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        from itertools import combinations

        pairs = list(combinations(range(self.in_dim), 2))
        planes = self.param(
            "plane_coef",
            lambda key: self.init_scale
            * jax.random.normal(key, (len(pairs), self.num_components, self.resolution, self.resolution))
            + (1.0 if self.reduce == "product" else 0.0),
        )
        shape = in_tensor.shape[:-1]
        x = jax.lax.stop_gradient(in_tensor.reshape(-1, self.in_dim))
        out = None
        for i, (a, b) in enumerate(pairs):
            f = _bilinear_sample_2d(planes[i], x[:, (a, b)])
            out = f if out is None else (out * f if self.reduce == "product" else out + f)
        return out.reshape(shape + (self.num_components,))
