"""Multi-resolution hash encoding (iNGP), 3D and 4D, functional core.

TPU-native replacement for tiny-cuda-nn's HashGrid encoding
(reference call sites: `nerfstudio/field_components/encodings.py:311-470`,
4D actor grid at `field_components/neurad_encoding.py:112-131`).

Design notes (TPU-first):
- One flat table [num_levels * table_size, F]; per-level offset like the reference.
- Corner enumeration is vectorized over a static [2^D, D] binary matrix instead of
  the reference's 8 unrolled hash calls — XLA fuses hashing + weights into one
  elementwise block, and the only expensive op is the table gather (take along
  axis 0), which XLA lowers to a TPU dynamic-gather.
- Backward through gather is scatter-add into the table, which XLA also handles;
  the table is fp32 (tcnn stores fp16 — we keep fp32 master and can cast reads
  to bf16 later if HBM-bound).
- All shapes static; positions expected in [0, 1]^D (same contract as tcnn).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Same spatial-hash primes as the reference 3D fallback (`encodings.py:415-421`),
# extended with tcnn's 4th prime for 4D grids.
_PRIMES = (1, 2654435761, 805459861, 3674653429)


def level_scales(num_levels: int, min_res: int, max_res: int) -> np.ndarray:
    """Per-level grid resolutions: floor(min_res * growth^level) (`encodings.py:348-350`)."""
    if num_levels > 1:
        growth = np.exp((np.log(max_res) - np.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    return np.floor(min_res * growth ** np.arange(num_levels)).astype(np.float32)


def init_hash_table(
    key: jax.Array,
    num_levels: int,
    table_size: int,
    features_per_level: int,
    scale: float = 0.001,
    corners_packed: int = 1,
) -> jnp.ndarray:
    """Uniform(-1, 1) * scale init (`encodings.py:382-386`).

    corners_packed=2^D stores all corner features of a CELL in one row (row
    width 2^D * F): one gather per (sample, level) instead of 2^D — the
    TPU-native layout, since XLA's gather is row-latency-bound (~23ns/row on
    v5e regardless of row width up to ~32B).
    """
    shape = (num_levels * table_size, features_per_level * corners_packed)
    return (jax.random.uniform(key, shape, minval=-1.0, maxval=1.0) * scale).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _hash(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial hash of integer coords [..., D] -> [...] (`encodings.py:406-421`)."""
    d = coords.shape[-1]
    primes = jnp.asarray(_PRIMES[:d], dtype=jnp.uint32)
    x = (coords.astype(jnp.uint32) * primes)
    h = x[..., 0]
    for i in range(1, d):
        h = h ^ x[..., i]
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def _corner_offsets(d: int) -> np.ndarray:
    """[2^D, D] binary corner offsets."""
    corners = np.arange(2**d)
    return np.stack([(corners >> i) & 1 for i in range(d)], axis=-1).astype(np.int32)


@jax.custom_vjp
def _gather_bf16_fwd_fp32_bwd(table: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Table gather reading bf16 (half the HBM traffic — the op's bottleneck,
    matching tcnn's fp16 feature storage) while the backward scatter-add
    accumulates in full fp32 (bf16 accumulation would corrupt hash-table grads)."""
    return jnp.take(table.astype(jnp.bfloat16), flat_idx, axis=0).astype(table.dtype)


def _gather_fwd(table, flat_idx):
    # residuals must be arrays/ints; shape as a tuple of python ints is static
    return _gather_bf16_fwd_fp32_bwd(table, flat_idx), (flat_idx, tuple(table.shape))


def _gather_bwd(res, g):
    flat_idx, shape = res
    dtable = jnp.zeros(shape, g.dtype).at[flat_idx].add(g)
    return dtable, None


_gather_bf16_fwd_fp32_bwd.defvjp(_gather_fwd, _gather_bwd)


def hash_encode(
    positions: jnp.ndarray,
    table: jnp.ndarray,
    scales: jnp.ndarray,
    table_size: int,
    level_weights: Optional[jnp.ndarray] = None,
    gather_dtype: Optional[jnp.dtype] = jnp.bfloat16,
    cell_packed: bool = False,
) -> jnp.ndarray:
    """Multi-level hash lookup with D-linear interpolation.

    Args:
        positions: [..., D] in [0,1]^D (D = 3 or 4).
        table: [num_levels * table_size, F].
        scales: [num_levels] per-level grid resolution.
        table_size: entries per level (static).
        level_weights: optional [..., num_levels] per-level feature downweighting
            (NeuRAD's anti-aliasing, `neurad_encoding.py:297-304`).
        gather_dtype: dtype for the table READ. bf16 halves HBM traffic on the
            gather — the op's bottleneck — matching tcnn's fp16 feature storage
            while the master table (and its gradients) stay fp32. None = fp32.
        cell_packed: table rows hold all 2^D corner features of a cell
            (one gather per sample-level, the TPU-native fast path; corner
            features are per-cell, i.e. not shared across cell faces — the MLP
            absorbs the resulting discontinuity like it absorbs hash collisions).

    Returns:
        [..., num_levels * F] encoded features (fp32).
    """
    num_levels = scales.shape[0]
    d = positions.shape[-1]
    n_corners = 2**d
    f = table.shape[-1] // (n_corners if cell_packed else 1)
    corners = jnp.asarray(_corner_offsets(d))  # [C, D], C = 2^D

    scaled = positions[..., None, :] * scales[:, None]  # [..., L, D]
    floor = jnp.floor(scaled)
    offset = scaled - floor  # [..., L, D] in [0,1)
    floor_i = floor.astype(jnp.int32)

    level_offset = jnp.arange(num_levels, dtype=jnp.int32) * table_size
    if cell_packed:
        # one row per CELL: [..., L] gathers of 2^D * F features
        hashed = _hash(floor_i, table_size)  # [..., L]
        idx = hashed + level_offset
        if gather_dtype is not None:
            flat_feats = _gather_bf16_fwd_fp32_bwd(table, idx.reshape(-1))
        else:
            flat_feats = jnp.take(table, idx.reshape(-1), axis=0)
        feats = flat_feats.reshape(idx.shape + (n_corners, f))  # [..., L, C, F]
    else:
        # corner coords: floor + {0,1}^D  -> [..., L, C, D]
        corner_coords = floor_i[..., None, :] + corners
        hashed = _hash(corner_coords, table_size)  # [..., L, C]
        idx = hashed + level_offset[:, None]  # [..., L, C]
        if gather_dtype is not None:
            flat_feats = _gather_bf16_fwd_fp32_bwd(table, idx.reshape(-1))
        else:
            flat_feats = jnp.take(table, idx.reshape(-1), axis=0)
        feats = flat_feats.reshape(idx.shape + (f,))  # [..., L, C, F]

    # D-linear interpolation weights: prod over dims of (offset if corner bit else 1-offset)
    w = jnp.where(corners.astype(bool), offset[..., None, :], 1.0 - offset[..., None, :])  # [..., L, C, D]
    w = jnp.prod(w, axis=-1)  # [..., L, C]

    out = jnp.sum(feats * w[..., None], axis=-2)  # [..., L, F]
    if level_weights is not None:
        out = out * level_weights[..., None]
    return out.reshape(out.shape[:-2] + (num_levels * f,))


def gaussian_level_weights(std: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """NeuRAD EMA-style per-level downweighting by gaussian std
    (`neurad_encoding.py:297-304`): weight = 1 / clamp(res * 2 * std, 1, inf).

    Args:
        std: [..., 1] isotropic std in grid-normalized units.
        scales: [L].
    Returns: [..., L]
    """
    return 1.0 / jnp.clip(std * (2.0 * scales), 1.0, None)


def hash_encode_gaussians(
    gauss_mean: jnp.ndarray,
    gauss_std: jnp.ndarray,
    table: jnp.ndarray,
    scales: jnp.ndarray,
    table_size: int,
    cell_packed: bool = False,
) -> jnp.ndarray:
    """Encode multisampled gaussians and average over multisamples
    (`neurad_encoding.py:265-268,297-304`).

    Args:
        gauss_mean: [..., M, D] multisample means in [0,1]^D.
        gauss_std: [..., M, 1] stds (grid units).
    Returns:
        [..., num_levels * F] features averaged over the M multisamples.
    """
    w = gaussian_level_weights(gauss_std, scales)  # [..., M, L]
    feats = hash_encode(
        gauss_mean, table, scales, table_size, level_weights=w, cell_packed=cell_packed
    )  # [..., M, L*F]
    return feats.mean(axis=-2)


class HashEncodingSpec:
    """Static configuration bundle for a hash encoding (shapes/scales are static)."""

    def __init__(
        self,
        num_levels: int = 16,
        min_res: int = 16,
        max_res: int = 1024,
        log2_hashmap_size: int = 19,
        features_per_level: int = 2,
        n_input_dims: int = 3,
        hash_init_scale: float = 0.001,
    ):
        self.num_levels = num_levels
        self.min_res = min_res
        self.max_res = max_res
        self.table_size = 2**log2_hashmap_size
        self.features_per_level = features_per_level
        self.n_input_dims = n_input_dims
        self.hash_init_scale = hash_init_scale
        self.scales = jnp.asarray(level_scales(num_levels, min_res, max_res))

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def init(self, key: jax.Array) -> jnp.ndarray:
        return init_hash_table(key, self.num_levels, self.table_size, self.features_per_level, self.hash_init_scale)

    def __call__(self, positions: jnp.ndarray, table: jnp.ndarray, level_weights=None) -> jnp.ndarray:
        return hash_encode(positions, table, self.scales, self.table_size, level_weights)
