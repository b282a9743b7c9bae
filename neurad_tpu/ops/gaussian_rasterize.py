"""Tile-binned gaussian rasterization (camera pixels + lidar query points).

TPU-native replacement for the gsplat fork's CUDA rasterizers
(`rasterization` at `nerfstudio/models/splatad.py:977-1003`,
`lidar_rasterization` at 1135-1166). Design:

- STATIC shapes throughout: every gaussian emits exactly `max_tiles_per_gaussian`
  (tile, gaussian) pairs (sentinel tile for non-covered slots), pairs are
  depth-ordered globally then STABLE-sorted by tile id — within a tile, pairs
  remain front-to-back. Each tile keeps its first `max_per_tile` gaussians.
- Alpha compositing is an exclusive cumprod of (1 - alpha) along the per-tile
  list — a vectorized prefix product over [tiles, pixels, K] instead of CUDA's
  sequential per-pixel loop with early exit. Tiles are processed in chunks via
  `lax.map` to bound live memory; `jax.checkpoint` keeps the backward from
  materializing all chunks at once.
- Rolling shutter: each pixel has a time offset; gaussian screen centers move by
  `vel2d * t_pix` (the fork warps identically per `splatad.py:918-1003`).
- Fully differentiable by construction (autodiff through cumprod) — no custom
  VJP needed for correctness; a Pallas forward/backward pair can swap in later
  for speed-of-light.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neurad_tpu.ops.gaussians import Projected


class TileBinning(NamedTuple):
    tile_gauss: jnp.ndarray  # [T, K] gaussian indices (front-to-back)
    tile_valid: jnp.ndarray  # [T, K] bool
    num_tiles_x: int
    num_tiles_y: int
    # overflow telemetry (scalars) — silent truncation otherwise degrades dense
    # scenes invisibly; the reference CUDA rasterizer has no caps at all
    dropped_pairs: jnp.ndarray = jnp.int32(0)  # (tile,gauss) pairs beyond max_per_tile
    cropped_gaussians: jnp.ndarray = jnp.int32(0)  # gaussians covering > max_tiles_per_gaussian tiles
    culled_visible: jnp.ndarray = jnp.int32(0)  # visible gaussians beyond max_visible (depth-culled)


def bin_gaussians(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    grid_min: Tuple[float, float],
    tile_size: Tuple[float, float],
    num_tiles: Tuple[int, int],
    max_tiles_per_gaussian: int = 16,
    max_per_tile: int = 256,
    wrap_x: bool = False,
    max_visible: int = 0,
) -> TileBinning:
    """Assign gaussians to tiles, depth-ordered per tile.

    Works in any 2D coordinate system (pixels or spherical degrees): tile (i, j)
    covers [grid_min + (j, i)*tile_size, +tile_size).

    wrap_x: treat the x axis as circular (360° azimuth for spherical lidar) —
    a gaussian whose footprint crosses the ±180° seam is binned into tiles on
    both sides via modulo tile indices (the reference CUDA lidar rasterizer
    bins circularly too).

    max_visible (0 = off): static frustum-cull cap — only the `max_visible`
    NEAREST visible gaussians emit tile slots. In AD scenes one camera sees a
    fraction of the gaussians, so the slot sort/emission (the binning's cost)
    shrinks by the cull ratio; visible gaussians beyond the cap are dropped
    back-to-front and counted in `culled_visible`.
    """
    ntx, nty = num_tiles
    t_total = ntx * nty
    n = means2d.shape[0]
    c = max_tiles_per_gaussian

    # depth order (front to back); invalid gaussians (radius 0) pushed to the back
    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf))
    culled_visible = jnp.int32(0)
    if max_visible and max_visible < n:
        culled_visible = jnp.maximum(jnp.sum(radii > 0) - max_visible, 0).astype(jnp.int32)
        # Slice with a data-dependent (always-0) start: a STATIC slice of a sort
        # is rewritten by XLA into TopK, which at K~2^17 is ~11 ms/frame slower
        # than the full 500k sort it replaces (measured on v5e; TopK is built
        # for small K). f32*0 is not algebraically folded (NaN semantics), so
        # the rewrite can't fire.
        traced_zero = (depths.reshape(-1)[0] * 0.0).astype(jnp.int32)
        order = jax.lax.dynamic_slice_in_dim(order, traced_zero, max_visible)
        n = max_visible
    m2 = means2d[order]
    rad = radii[order]
    valid_g = rad > 0

    # covered tile range per gaussian
    x0 = jnp.floor((m2[:, 0] - rad - grid_min[0]) / tile_size[0]).astype(jnp.int32)
    x1 = jnp.floor((m2[:, 0] + rad - grid_min[0]) / tile_size[0]).astype(jnp.int32)
    y0 = jnp.floor((m2[:, 1] - rad - grid_min[1]) / tile_size[1]).astype(jnp.int32)
    y1 = jnp.floor((m2[:, 1] + rad - grid_min[1]) / tile_size[1]).astype(jnp.int32)
    if wrap_x:
        # circular x: keep the raw (possibly negative / >= ntx) tile range and
        # wrap with a modulo when emitting slots; cap the span at ntx tiles
        x1 = jnp.minimum(x1, x0 + ntx - 1)
    else:
        x0 = jnp.clip(x0, 0, ntx - 1)
        x1 = jnp.clip(x1, 0, ntx - 1)
    y0 = jnp.clip(y0, 0, nty - 1)
    y1 = jnp.clip(y1, 0, nty - 1)
    wx = x1 - x0 + 1
    wy = y1 - y0 + 1
    cropped = jnp.sum(((wx * wy > c) & valid_g).astype(jnp.int32))

    # Cap the covered rect at C tiles, recentered on the gaussian: oversized
    # gaussians keep their central tiles instead of a row-major corner slice.
    cx = jnp.floor((m2[:, 0] - grid_min[0]) / tile_size[0]).astype(jnp.int32)
    cx = cx if wrap_x else jnp.clip(cx, 0, ntx - 1)
    cy = jnp.clip(jnp.floor((m2[:, 1] - grid_min[1]) / tile_size[1]).astype(jnp.int32), 0, nty - 1)
    wx_c = jnp.minimum(wx, c)
    # c // wx_c via exact float reciprocal (same trick as the slot emission)
    c_over_wx = jnp.floor((float(c) + 0.5) / jnp.clip(wx_c, 1, None).astype(jnp.float32)).astype(jnp.int32)
    wy_c = jnp.minimum(wy, jnp.maximum(c_over_wx, 1))
    x0 = jnp.clip(cx - wx_c // 2, x0, x1 - wx_c + 1)
    y0 = jnp.clip(cy - wy_c // 2, y0, y1 - wy_c + 1)
    wx, wy = wx_c, wy_c

    # emit up to C tile slots per gaussian (row-major over the covered rect).
    # Integer %/​// over [N, C] expand to slow division loops on the VPU; with
    # slot < C and wx <= C both tiny, exact float math is much faster:
    # floor((slot + 0.5) * (1/wx)) == slot // wx (the +0.5 keeps the product
    # safely inside the correct unit interval under f32 rounding).
    slot = jnp.arange(c, dtype=jnp.int32)  # [C]
    inv_wx = 1.0 / jnp.clip(wx, 1, None).astype(jnp.float32)
    sy = jnp.floor((slot[None, :].astype(jnp.float32) + 0.5) * inv_wx[:, None]).astype(jnp.int32)
    sx = slot[None, :] - sy * jnp.clip(wx, 1, None)[:, None]
    tile_x = x0[:, None] + sx
    if wrap_x:
        tile_x = jnp.mod(tile_x, ntx)
    tile_y = y0[:, None] + sy
    in_rect = (slot[None, :] < (wx * wy)[:, None]) & valid_g[:, None]
    tile_id = jnp.where(in_rect, tile_y * ntx + tile_x, t_total)  # sentinel = t_total

    import math

    rank_bits = max(1, math.ceil(math.log2(max(n, 2))))
    tile_bits = max(1, math.ceil(math.log2(t_total + 2)))
    k = max_per_tile
    if rank_bits + tile_bits <= 31:
        # PACKED-KEY path: (tile_id << rank_bits) | depth_rank in one int31 —
        # a payload-free UNSTABLE sort is 3x the stable key-val sort on v5e
        # (7.4 ms vs 21.7 ms at 8M pairs); the rank bits both carry the
        # payload and make keys unique, so unstable == stable here, and the
        # per-tile order stays front-to-back by construction.
        rank = jnp.arange(n, dtype=jnp.int32)  # position in depth order
        flat_keys = (tile_id << rank_bits | rank[:, None]).reshape(-1)
        sorted_keys = jax.lax.sort(flat_keys, is_stable=False)
        bounds = (jnp.arange(t_total + 1, dtype=jnp.int32) << rank_bits)
        edges = jnp.searchsorted(sorted_keys, bounds, side="left")
        starts, ends = edges[:-1], edges[1:]
        gather_idx = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]  # [T, K]
        tile_valid = gather_idx < ends[:, None]
        gather_idx = jnp.clip(gather_idx, 0, sorted_keys.shape[0] - 1)
        tile_gauss = order[sorted_keys[gather_idx] & ((1 << rank_bits) - 1)]
    else:
        flat_tiles = tile_id.reshape(-1)  # [N*C], depth-ordered within equal tiles
        flat_gauss = jnp.broadcast_to(order[:, None], (n, c)).reshape(-1)

        # one stable sort carrying the payload: saves two N*C-row gathers vs
        # argsort + indexing (the binning sort is the rasterizer's hottest op)
        sorted_tiles, sorted_gauss = jax.lax.sort_key_val(flat_tiles, flat_gauss, is_stable=True)

        # per-tile segment [start, end)
        tile_range = jnp.arange(t_total, dtype=flat_tiles.dtype)
        starts = jnp.searchsorted(sorted_tiles, tile_range, side="left")
        ends = jnp.searchsorted(sorted_tiles, tile_range, side="right")

        gather_idx = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]  # [T, K]
        tile_valid = gather_idx < ends[:, None]
        gather_idx = jnp.clip(gather_idx, 0, sorted_gauss.shape[0] - 1)
        tile_gauss = sorted_gauss[gather_idx]
    dropped = jnp.sum(jnp.maximum(ends - starts - k, 0))
    return TileBinning(
        tile_gauss=tile_gauss,
        tile_valid=tile_valid,
        num_tiles_x=ntx,
        num_tiles_y=nty,
        dropped_pairs=dropped.astype(jnp.int32),
        cropped_gaussians=cropped,
        culled_visible=culled_visible,
    )


def _packed_gather(projected: Projected, opac: jnp.ndarray, features: jnp.ndarray, tg: jnp.ndarray):
    """One wide row-gather instead of seven narrow ones.

    Measured on v5e (1M rows from a 500k-row table): f32 row-gathers run at
    ~7-14 ms at widths <=8 or >=64 but 43-66 ms at widths 16-32 (lane-tile
    pathology), and every separate array pays the per-row cost again. Packing
    all per-gaussian render attributes into one 64/128-column f32 table turns
    ~70 ms of gathers into one ~14 ms gather; the backward collapses seven
    scatter-adds into one for the same reason."""
    c = features.shape[-1]
    packed = jnp.concatenate(
        [
            projected.means2d,
            projected.vel2d,
            projected.conics,
            opac[:, None],
            projected.depths[:, None],
            projected.depth_vel[:, None],
            features.astype(jnp.float32),
        ],
        axis=1,
    )  # [N, 10 + C]
    width = packed.shape[1]
    target = 64 if width <= 64 else 128
    # Widening to a full-lane row only pays when the GATHER is big enough to
    # amortize building the [N, 64] table (the concat itself costs ~4.5 ms at
    # 500k gaussians): measured crossover ~400k gathered rows on v5e
    # (1080p camera / 65k-pt lidar win; 480x720 camera loses).
    if width < target and tg.size >= 300_000:
        # Pad with TRACED zeros (x * 0.0 is not folded for floats — NaN rules):
        # constant zero-padding gets algebraically simplified back into a
        # narrow gather + pad, which reinstates the width-16..32 gather
        # pathology this function exists to avoid (verified in the xplane
        # trace: jnp.pad here produced f32[...,26] gathers at 2.7x the cost).
        zcol = packed[:, :1] * 0.0
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(zcol, (packed.shape[0], target - width))], axis=1
        )
    g = packed[tg]  # [..., target]
    return (
        g[..., 0:2],  # means2d
        g[..., 2:4],  # vel2d
        g[..., 4:7],  # conics
        g[..., 7],  # opac
        g[..., 8],  # depths
        g[..., 9],  # depth_vel
        g[..., 10 : 10 + c],  # features
    )


def _composite(
    pix_coords: jnp.ndarray,  # [T_chunk, P, 2]
    pix_times: Optional[jnp.ndarray],  # [T_chunk, P] or None
    g_means: jnp.ndarray,  # [T_chunk, K, 2]
    g_vel2d: jnp.ndarray,  # [T_chunk, K, 2]
    g_conics: jnp.ndarray,  # [T_chunk, K, 3]
    g_opac: jnp.ndarray,  # [T_chunk, K]
    g_feat: jnp.ndarray,  # [T_chunk, K, C]
    g_depth: jnp.ndarray,  # [T_chunk, K]
    g_depth_vel: jnp.ndarray,  # [T_chunk, K]
    valid: jnp.ndarray,  # [T_chunk, K]
    alpha_threshold: float = 1.0 / 255.0,
    compute_dtype: jnp.dtype = jnp.bfloat16,
):
    """Front-to-back alpha compositing of per-tile gaussian lists.

    The [T, P, K] tensors dominate the rasterizer's traffic; the gaussian
    quadratic-form evaluation runs in `compute_dtype` (default bf16: pixel
    offsets are computed in fp32 FIRST, so no cancellation; bf16's ~0.4%
    relative error on sigma only matters where alpha is already near the 1/255
    cutoff) while the alpha clamp, transmittance cumprod, and reductions stay
    fp32."""
    bf = compute_dtype
    means = g_means[:, None, :, :]  # [T, 1, K, 2]
    if pix_times is not None:
        means = means + g_vel2d[:, None, :, :] * pix_times[..., None, None]
    d = (pix_coords[:, :, None, :] - means).astype(bf)  # [T, P, K, 2]
    a, b, cc = (g_conics[..., 0].astype(bf), g_conics[..., 1].astype(bf), g_conics[..., 2].astype(bf))
    sigma = 0.5 * (
        a[:, None, :] * d[..., 0] ** 2 + cc[:, None, :] * d[..., 1] ** 2
    ) + b[:, None, :] * d[..., 0] * d[..., 1]
    alpha = g_opac[:, None, :] * jnp.exp(-jnp.clip(sigma.astype(jnp.float32), 0.0, 50.0))  # [T, P, K]
    alpha = jnp.clip(alpha, 0.0, 0.999)
    alpha = jnp.where(valid[:, None, :] & (alpha >= alpha_threshold), alpha, 0.0)

    one_minus = 1.0 - alpha
    # exclusive cumprod: transmittance before each gaussian
    trans = jnp.concatenate(
        [jnp.ones_like(one_minus[..., :1]), jnp.cumprod(one_minus, axis=-1)[..., :-1]], axis=-1
    )
    w = alpha * trans  # [T, P, K]

    feat_out = jnp.einsum(
        "tpk,tkc->tpc", w.astype(bf), g_feat.astype(bf), preferred_element_type=jnp.float32
    )
    depth = g_depth[:, None, :]
    if pix_times is not None:
        depth = depth + g_depth_vel[:, None, :] * pix_times[..., None]
    depth_out = jnp.sum(w * depth, axis=-1, keepdims=True)
    alpha_out = jnp.sum(w, axis=-1, keepdims=True)
    return feat_out, depth_out, alpha_out, w


def rasterize_camera(
    projected: Projected,
    features: jnp.ndarray,
    opacities: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int = 16,
    max_per_tile: int = 256,
    max_tiles_per_gaussian: int = 16,
    rolling_shutter_time: float = 0.0,
    rs_direction: str = "vertical",
    tile_chunk: int = 64,
    backend: str = "xla",  # 'xla' | 'pallas' (VMEM composite) | 'hybrid' (xla fwd + pallas bwd)
    return_binning: bool = False,
    compute_dtype: jnp.dtype = jnp.bfloat16,  # xla backend's gaussian-eval dtype
    max_visible: int = 0,
) -> Tuple[jnp.ndarray, ...]:
    """Rasterize projected gaussians to (features [H,W,C], depth [H,W,1],
    alpha [H,W,1]). gsplat-`rasterization` equivalent (render_mode RGB+ED)."""
    ntx = -(-width // tile_size)
    nty = -(-height // tile_size)
    binning = bin_gaussians(
        projected.means2d,
        projected.radii,
        projected.depths,
        grid_min=(0.0, 0.0),
        tile_size=(float(tile_size), float(tile_size)),
        num_tiles=(ntx, nty),
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        max_per_tile=max_per_tile,
        max_visible=max_visible,
    )
    t_total = ntx * nty
    p = tile_size * tile_size

    # per-tile pixel coords (+ rolling-shutter per-pixel times)
    tile_ids = jnp.arange(t_total, dtype=jnp.int32)
    tx = (tile_ids % ntx).astype(jnp.float32) * tile_size
    ty = (tile_ids // ntx).astype(jnp.float32) * tile_size
    py, px = jnp.meshgrid(jnp.arange(tile_size), jnp.arange(tile_size), indexing="ij")
    local = jnp.stack([px.reshape(-1) + 0.5, py.reshape(-1) + 0.5], axis=-1)  # [P, 2]
    pix = jnp.stack([tx, ty], axis=-1)[:, None, :] + local[None, :, :]  # [T, P, 2]

    # rolling_shutter_time may be a traced scalar (0 = no warp, costs nothing)
    if rs_direction == "vertical":
        frac = pix[..., 1] / float(height)
    else:
        frac = pix[..., 0] / float(width)
    pix_times = (frac - 0.5) * rolling_shutter_time  # [T, P]

    opac = opacities * projected.compensations
    cdim = features.shape[-1]

    if backend in ("pallas", "hybrid") and jax.default_backend() == "cpu" and t_total > 64:
        # Pallas interpret mode at real tile counts is minutes-slow on the CPU
        # mesh; ops tests cover the kernels in interpret mode at small shapes
        backend = "xla"
    if backend in ("pallas", "hybrid"):
        from neurad_tpu.ops.pallas_composite import hybrid_tile_composite, pallas_tile_composite

        import functools as _ft

        fn = (
            pallas_tile_composite
            if backend == "pallas"
            else _ft.partial(hybrid_tile_composite, compute_dtype)
        )
        g_means, g_vel, g_con, g_op, g_dep, g_dvel, g_feat = _packed_gather(
            projected, opac, features, binning.tile_gauss
        )
        feat, depth, alpha = fn(
            pix,
            pix_times[..., None],
            g_means,
            g_vel,
            g_con,
            g_op[..., None],
            g_feat,
            g_dep[..., None],
            g_dvel[..., None],
            binning.tile_valid.astype(jnp.float32)[..., None],
        )
    else:

        def chunk_fn(args):
            tg, tv, pc, pt = args
            # packed gather per chunk: the chunked lax.map + checkpoint keeps
            # the gathered [T,K,*] arrays from materializing all at once (the
            # no-cull K=256 config at 1080p would otherwise hold ~534 MB)
            gm, gv, gc, go, gd, gdv, gf = _packed_gather(projected, opac, features, tg)
            return _composite(
                pc, pt, gm, gv, gc, go, gf, gd, gdv, tv, compute_dtype=compute_dtype
            )[:3]

        # pad tiles to a multiple of tile_chunk and map over chunks
        pad = (-t_total) % tile_chunk
        def padded(x):
            return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0) if pad else x

        tg = padded(binning.tile_gauss).reshape(-1, tile_chunk, max_per_tile)
        tv = padded(binning.tile_valid).reshape(-1, tile_chunk, max_per_tile)
        pc = padded(pix).reshape(-1, tile_chunk, p, 2)
        pt = padded(pix_times).reshape(-1, tile_chunk, p)

        feat, depth, alpha = jax.lax.map(jax.checkpoint(chunk_fn), (tg, tv, pc, pt))

    def to_image(x, c):
        x = x.reshape(-1, p, c)[:t_total]  # [T, P, C]
        x = x.reshape(nty, ntx, tile_size, tile_size, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(nty * tile_size, ntx * tile_size, c)
        return x[:height, :width]

    imgs = (to_image(feat, cdim), to_image(depth, 1), to_image(alpha, 1))
    return imgs + (binning,) if return_binning else imgs


def rasterize_lidar_points(
    projected: Projected,
    features: jnp.ndarray,
    opacities: jnp.ndarray,
    raster_pts: jnp.ndarray,
    azim_range: Tuple[float, float] = (-180.0, 180.0),
    elev_range: Tuple[float, float] = (-25.0, 15.0),
    tile_size_azim: float = 2.0,
    tile_size_elev: float = 2.0,
    max_per_tile: int = 128,
    max_tiles_per_gaussian: int = 16,
    compute_alpha_sum_until_points: bool = True,
    depth_eps: float = 0.4,
    # 0 = no chunking (one fused pass; the [M, K] intermediates are ~30 MB at
    # 65k points / K=128 — chunked lax.map + remat measured far slower on the
    # NeuRAD path, same lesson applies here). Set >0 only for M >> 10^5.
    point_chunk: int = 0,
) -> dict:
    """Rasterize gaussians at arbitrary spherical query points (gsplat fork
    `lidar_rasterization`, `splatad.py:1135-1166`).

    raster_pts: [M, 4] (azim_deg, elev_deg, gt_depth, time). Returns per-point
    features/depth/alpha (+ alpha accumulated strictly in front of the gt depth,
    the line-of-sight loss input, and median depth).
    """
    ntx = max(1, int(-(-(azim_range[1] - azim_range[0]) // tile_size_azim)))
    nty = max(1, int(-(-(elev_range[1] - elev_range[0]) // tile_size_elev)))
    wrap = (azim_range[1] - azim_range[0]) >= 360.0 - 1e-6
    binning = bin_gaussians(
        projected.means2d,
        projected.radii,
        projected.depths,
        grid_min=(azim_range[0], elev_range[0]),
        tile_size=(tile_size_azim, tile_size_elev),
        num_tiles=(ntx, nty),
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        max_per_tile=max_per_tile,
        # full-turn azimuth grids are circular: bin seam-crossing gaussians on
        # both sides of ±180°
        wrap_x=wrap,
    )

    m = raster_pts.shape[0]
    k = max_per_tile
    # tile of each query point
    qx = jnp.clip(((raster_pts[:, 0] - azim_range[0]) // tile_size_azim).astype(jnp.int32), 0, ntx - 1)
    qy = jnp.clip(((raster_pts[:, 1] - elev_range[0]) // tile_size_elev).astype(jnp.int32), 0, nty - 1)
    q_tile = qy * ntx + qx  # [M]

    opac = opacities * projected.compensations

    def chunk_fn(args):
        pts, tile_idx = args  # [mc, 4], [mc]
        tg = binning.tile_gauss[tile_idx]  # [mc, K]
        tv = binning.tile_valid[tile_idx]
        means = projected.means2d[tg] + projected.vel2d[tg] * pts[:, None, 3:4]  # RS warp
        d = pts[:, None, :2] - means
        if wrap:
            # circular azimuth: a query at -179.5° is 1.1° from a gaussian at
            # +179.4°, not 358.9°
            d_az = jnp.mod(d[..., 0] + 180.0, 360.0) - 180.0
            d = jnp.stack([d_az, d[..., 1]], axis=-1)
        # bf16 quadratic form (offsets subtracted in fp32 first) — same
        # precision budget as the camera compositor
        d = d.astype(jnp.bfloat16)
        con = projected.conics[tg].astype(jnp.bfloat16)
        sigma = (
            0.5 * (con[..., 0] * d[..., 0] ** 2 + con[..., 2] * d[..., 1] ** 2)
            + con[..., 1] * d[..., 0] * d[..., 1]
        ).astype(jnp.float32)
        alpha = jnp.clip(opac[tg] * jnp.exp(-jnp.clip(sigma, 0.0, 50.0)), 0.0, 0.999)
        alpha = jnp.where(tv & (alpha >= 1.0 / 255.0), alpha, 0.0)
        one_minus = 1.0 - alpha
        trans = jnp.concatenate(
            [jnp.ones_like(one_minus[..., :1]), jnp.cumprod(one_minus, axis=-1)[..., :-1]], axis=-1
        )
        w = alpha * trans  # [mc, K]
        g_depth = projected.depths[tg] + projected.depth_vel[tg] * pts[:, None, 3]
        feat = jnp.einsum("mk,mkc->mc", w, features[tg])
        depth = jnp.sum(w * g_depth, axis=-1, keepdims=True)
        acc = jnp.sum(w, axis=-1, keepdims=True)
        # median depth, reference semantics (`splatad.py:1297-1299`): depth of
        # the first gaussian whose cumulative weight crosses ABSOLUTE 0.5; rays
        # that never reach alpha 0.5 fall back to normalized expected depth
        cum_w = jnp.cumsum(w, axis=-1)
        med_idx = jnp.argmax(cum_w >= 0.5, axis=-1)
        median_depth = jnp.take_along_axis(g_depth, med_idx[:, None], axis=-1)
        median_depth = jnp.where(acc > 0.5, median_depth, depth / jnp.maximum(acc, 1e-10))
        if compute_alpha_sum_until_points:
            before = g_depth < (pts[:, None, 2] - depth_eps)
            alpha_until = jnp.sum(jnp.where(before, w, 0.0), axis=-1, keepdims=True)
        else:
            alpha_until = jnp.zeros_like(acc)
        return feat, depth, acc, alpha_until, median_depth

    if point_chunk and m > point_chunk:
        pad = (-m) % point_chunk
        pts_p = jnp.concatenate([raster_pts, jnp.zeros((pad, raster_pts.shape[1]))]) if pad else raster_pts
        tile_p = jnp.concatenate([q_tile, jnp.zeros(pad, q_tile.dtype)]) if pad else q_tile
        n_chunks = pts_p.shape[0] // point_chunk
        feat, depth, acc, alpha_until, med = jax.lax.map(
            jax.checkpoint(chunk_fn),
            (pts_p.reshape(n_chunks, point_chunk, -1), tile_p.reshape(n_chunks, point_chunk)),
        )
    else:
        feat, depth, acc, alpha_until, med = chunk_fn((raster_pts, q_tile))
    cdim = features.shape[-1]
    return {
        "features": feat.reshape(-1, cdim)[:m],
        "depth": depth.reshape(-1, 1)[:m],
        "alpha": acc.reshape(-1, 1)[:m],
        "alpha_sum_until_points": alpha_until.reshape(-1, 1)[:m],
        "median_depth": med.reshape(-1, 1)[:m],
        # truncation telemetry — nonzero means the caps are clipping the scene
        "binning_dropped_pairs": binning.dropped_pairs,
        "binning_cropped_gaussians": binning.cropped_gaussians,
    }


def _lidar_composite_xla(
    wrap, depth_eps, compute_until,
    pts_c, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv,
):
    """Lidar tile-slot compositing, pure XLA math (autodiff-able).

    pts_c [T,P,>=4] (azim, elev, gt_depth, time); vmask [T,P]; gaussian arrays
    [T,K,...]; tv [T,K]. Returns (feat, depth, acc, alpha_until, median)."""
    # masks may arrive as bool (xla path) or float32 (hybrid custom-VJP path:
    # float inputs keep the cotangent pytree all-float, avoiding float0 leaves)
    tv = tv if tv.dtype == jnp.bool_ else tv > 0
    vmask = vmask if vmask.dtype == jnp.bool_ else vmask > 0
    t_pt = pts_c[..., 3]  # [T, P]
    mu = g_means[:, None] + g_vel[:, None] * t_pt[..., None, None]  # [T,P,K,2]
    d = pts_c[..., None, :2] - mu
    if wrap:
        d_az = jnp.mod(d[..., 0] + 180.0, 360.0) - 180.0
        d = jnp.stack([d_az, d[..., 1]], axis=-1)
    d = d.astype(jnp.bfloat16)
    con = g_con[:, None].astype(jnp.bfloat16)
    sigma = (
        0.5 * (con[..., 0] * d[..., 0] ** 2 + con[..., 2] * d[..., 1] ** 2)
        + con[..., 1] * d[..., 0] * d[..., 1]
    ).astype(jnp.float32)
    alpha = jnp.clip(g_op[:, None] * jnp.exp(-jnp.clip(sigma, 0.0, 50.0)), 0.0, 0.999)
    alpha = jnp.where(tv[:, None] & (alpha >= 1.0 / 255.0) & vmask[..., None], alpha, 0.0)
    one_minus = 1.0 - alpha
    trans = jnp.concatenate(
        [jnp.ones_like(one_minus[..., :1]), jnp.cumprod(one_minus, axis=-1)[..., :-1]], axis=-1
    )
    w = alpha * trans  # [T, P, K]
    g_depth = g_dep[:, None] + g_dvel[:, None] * t_pt[..., None]  # [T,P,K]
    feat = jnp.einsum("tpk,tkc->tpc", w, g_feat)  # MXU contraction
    depth = jnp.sum(w * g_depth, axis=-1, keepdims=True)
    acc = jnp.sum(w, axis=-1, keepdims=True)
    # reference median semantics (`splatad.py:1297-1299`): absolute-0.5 crossing,
    # normalized-expected-depth fill-in where total alpha never reaches 0.5
    cum_w = jnp.cumsum(w, axis=-1)
    med_idx = jnp.argmax(cum_w >= 0.5, axis=-1)
    median_depth = jnp.take_along_axis(g_depth, med_idx[..., None], axis=-1)
    median_depth = jnp.where(acc > 0.5, median_depth, depth / jnp.maximum(acc, 1e-10))
    if compute_until:
        before = g_depth < (pts_c[..., None, 2] - depth_eps)
        alpha_until = jnp.sum(jnp.where(before, w, 0.0), axis=-1, keepdims=True)
    else:
        alpha_until = jnp.zeros_like(acc)
    return feat, depth, acc, alpha_until, median_depth


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _hybrid_lidar_composite(
    wrap, depth_eps, compute_until, tile_chunk,
    pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv,
):
    """Lidar slot compositing: XLA forward (vectorized cumprod, chunked over
    tiles with NO checkpoint — the backward never recomputes it) + the fused
    Pallas backward (`pallas_composite.run_lidar_bwd`), the same hybrid split
    that won the camera compositor A/B on v5e. Median depth is eval-only and
    gradient-free."""
    return _hybrid_lidar_fwd_impl(
        wrap, depth_eps, compute_until, tile_chunk,
        pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv,
    )


def _hybrid_lidar_fwd_impl(wrap, depth_eps, compute_until, tile_chunk, pts_slot, vmask,
                           g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv):
    t_total = pts_slot.shape[0]
    pad = (-t_total) % tile_chunk

    def padded(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0) if pad else x

    def chunk_fn(args):
        return _lidar_composite_xla(wrap, depth_eps, compute_until, *args)

    args = tuple(
        padded(x).reshape((-1, tile_chunk) + x.shape[1:])
        for x in (pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv)
    )
    outs = jax.lax.map(chunk_fn, args)
    return tuple(o.reshape((-1,) + o.shape[2:])[:t_total] for o in outs)


def _hybrid_lidar_fwd(wrap, depth_eps, compute_until, tile_chunk, pts_slot, vmask,
                      g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv):
    out = _hybrid_lidar_fwd_impl(
        wrap, depth_eps, compute_until, tile_chunk,
        pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv,
    )
    return out, (pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv)


def _hybrid_lidar_bwd(wrap, depth_eps, compute_until, tile_chunk, res, cots):
    from neurad_tpu.ops.pallas_composite import run_lidar_bwd

    pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv = res
    gf, gd, ga, gu, _gmed = cots  # median cotangent intentionally dropped
    d_means, d_vel, d_con, d_opac, d_feats, d_depth, d_dvel = run_lidar_bwd(
        wrap, depth_eps, pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel,
        tv, gf, gd, ga, gu,
    )
    zeros = jnp.zeros_like
    return (
        zeros(pts_slot), zeros(vmask), d_means, d_vel, d_con, d_opac, d_feats,
        d_depth, d_dvel, zeros(tv),
    )


_hybrid_lidar_composite.defvjp(_hybrid_lidar_fwd, _hybrid_lidar_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _pallas_lidar_composite(
    wrap, depth_eps, compute_until, tile_chunk,
    pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv,
):
    """Full-Pallas lidar slot compositing: vectorized VMEM forward
    (`pallas_composite.run_lidar_fwd`) + the same fused Pallas backward as the
    hybrid path. tile_chunk is unused (kept for signature parity)."""
    from neurad_tpu.ops.pallas_composite import run_lidar_fwd

    return run_lidar_fwd(
        wrap, depth_eps, compute_until, pts_slot, vmask,
        g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv,
    )


def _pallas_lidar_fwd(wrap, depth_eps, compute_until, tile_chunk, pts_slot, vmask,
                      g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv):
    from neurad_tpu.ops.pallas_composite import run_lidar_fwd

    out = run_lidar_fwd(
        wrap, depth_eps, compute_until, pts_slot, vmask,
        g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv,
    )
    return out, (pts_slot, vmask, g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel, tv)


_pallas_lidar_composite.defvjp(_pallas_lidar_fwd, _hybrid_lidar_bwd)


def rasterize_lidar_points_tiled(
    projected: Projected,
    features: jnp.ndarray,
    opacities: jnp.ndarray,
    raster_pts: jnp.ndarray,
    azim_range: Tuple[float, float] = (-180.0, 180.0),
    elev_range: Tuple[float, float] = (-25.0, 15.0),
    tile_size_azim: float = 2.0,
    tile_size_elev: float = 2.0,
    max_per_tile: int = 128,
    max_tiles_per_gaussian: int = 16,
    compute_alpha_sum_until_points: bool = True,
    depth_eps: float = 0.4,
    pts_per_tile: int = 128,
    tile_chunk: int = 512,
    # 'pallas' (vectorized VMEM fwd + fused Pallas bwd; best measured A/B on
    # v5e) | 'hybrid' (XLA fwd + fused Pallas bwd) | 'xla' (autodiff)
    backend: str = "pallas",
) -> dict:
    """Tile-grouped lidar rasterization — the TPU fast path.

    Same math as `rasterize_lidar_points`, restructured like the camera
    compositor: query points are sorted by tile and placed into a
    [num_tiles, pts_per_tile] slot grid, so each tile's K gaussians are
    gathered ONCE (num_tiles*K rows) instead of once per point (M*K rows), and
    the feature contraction becomes a per-tile [P,K]x[K,C] MXU matmul. At 65k
    points / 3600 tiles this cuts the gather AND backward scatter-add row
    count ~18x — the per-point path measured 1.83 s fwd+bwd on one v5e, with
    ~1.6 s of it in exactly those rows (benchmarks/splatad_profile.py).

    Points beyond `pts_per_tile` in one tile get zero outputs and are counted
    in `points_overflowed` (lidar beams spread <=
    beams_per_deg * tile_elev * azim_cols points per tile; 128 covers
    Pandar128-class sensors at the 2 deg x 2 deg default tiling).
    """
    ntx = max(1, int(-(-(azim_range[1] - azim_range[0]) // tile_size_azim)))
    nty = max(1, int(-(-(elev_range[1] - elev_range[0]) // tile_size_elev)))
    wrap = (azim_range[1] - azim_range[0]) >= 360.0 - 1e-6
    binning = bin_gaussians(
        projected.means2d,
        projected.radii,
        projected.depths,
        grid_min=(azim_range[0], elev_range[0]),
        tile_size=(tile_size_azim, tile_size_elev),
        num_tiles=(ntx, nty),
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        max_per_tile=max_per_tile,
        wrap_x=wrap,
    )
    t_total = ntx * nty
    m = raster_pts.shape[0]
    p = pts_per_tile
    k = max_per_tile

    qx = jnp.clip(((raster_pts[:, 0] - azim_range[0]) // tile_size_azim).astype(jnp.int32), 0, ntx - 1)
    qy = jnp.clip(((raster_pts[:, 1] - elev_range[0]) // tile_size_elev).astype(jnp.int32), 0, nty - 1)
    q_tile = qy * ntx + qx  # [M]

    # slot assignment: sort points by tile, rank within tile = position - tile start
    t_sorted, order_s = jax.lax.sort_key_val(q_tile, jnp.arange(m, dtype=jnp.int32), is_stable=True)
    counts = jnp.zeros((t_total,), jnp.int32).at[q_tile].add(1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(m, dtype=jnp.int32) - starts[t_sorted]
    ok = rank < p
    overflow = jnp.sum(~ok).astype(jnp.int32)
    slot_raw = t_sorted * p + rank
    # overflow ranks land inside the NEXT tile's slot range — mask them to an
    # out-of-bounds index so mode="drop" discards them
    slot_masked = jnp.where(ok, slot_raw, t_total * p)
    pt_of_slot = jnp.full((t_total * p,), m, jnp.int32).at[slot_masked].set(order_s, mode="drop")
    pts_pad = jnp.concatenate([raster_pts, jnp.zeros((1, raster_pts.shape[1]), raster_pts.dtype)])
    pts_slot = pts_pad[pt_of_slot].reshape(t_total, p, -1)  # [T, P, >=4]
    valid_slot = (pt_of_slot < m).reshape(t_total, p)

    opac = opacities * projected.compensations

    pad = (-t_total) % tile_chunk
    def padded(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0) if pad else x

    if backend in ("hybrid", "pallas") and jax.default_backend() == "cpu" and t_total > 64:
        # Pallas interpret mode at real tile counts is minutes-slow on the CPU
        # mesh; the XLA autodiff backward is the same math (ops tests cover the
        # kernel in interpret mode at small shapes)
        backend = "xla"
    if backend in ("hybrid", "pallas"):
        # one packed wide gather instead of seven narrow ones (_packed_gather);
        # the gathered [T, K] arrays double as the custom-VJP residuals.
        # 'pallas': vectorized VMEM forward + fused Pallas backward;
        # 'hybrid': XLA forward + the same fused backward (ops/pallas_composite)
        g_means, g_vel, g_con, g_op, g_dep, g_dvel, g_feat = _packed_gather(
            projected, opac, features, binning.tile_gauss
        )
        composite = _pallas_lidar_composite if backend == "pallas" else _hybrid_lidar_composite
        feat, depth, acc, alpha_until, med = composite(
            wrap, depth_eps, compute_alpha_sum_until_points, tile_chunk,
            pts_slot, valid_slot.astype(jnp.float32),
            g_means, g_vel, g_con, g_op, g_feat, g_dep, g_dvel,
            binning.tile_valid.astype(jnp.float32),
        )
    else:
        def tile_fn(args):
            tg, tv, pts_c, vmask = args  # [Tc,K] [Tc,K] [Tc,P,4+] [Tc,P]
            gm, gv, gc, go, gd, gdv, gf = _packed_gather(projected, opac, features, tg)
            return _lidar_composite_xla(
                wrap, depth_eps, compute_alpha_sum_until_points,
                pts_c, vmask, gm, gv, gc, go, gf, gd, gdv, tv,
            )

        tg = padded(binning.tile_gauss).reshape(-1, tile_chunk, k)
        tv = padded(binning.tile_valid).reshape(-1, tile_chunk, k)
        pc = padded(pts_slot).reshape(-1, tile_chunk, p, pts_slot.shape[-1])
        vm = padded(valid_slot).reshape(-1, tile_chunk, p)
        feat, depth, acc, alpha_until, med = jax.lax.map(jax.checkpoint(tile_fn), (tg, tv, pc, vm))

    cdim = features.shape[-1]
    # slot of each ORIGINAL point (overflow -> padded zero row)
    slot_of_pt = jnp.full((m,), t_total * p, jnp.int32).at[order_s].set(
        jnp.where(ok, slot_raw, t_total * p), mode="drop"
    )
    def per_point(x, c):
        flat = x.reshape(-1, c)[: t_total * p]
        flat = jnp.concatenate([flat, jnp.zeros((1, c), flat.dtype)])
        return flat[jnp.clip(slot_of_pt, 0, t_total * p)]

    return {
        "features": per_point(feat, cdim),
        "depth": per_point(depth, 1),
        "alpha": per_point(acc, 1),
        "alpha_sum_until_points": per_point(alpha_until, 1),
        "median_depth": per_point(med, 1),
        "binning_dropped_pairs": binning.dropped_pairs,
        "binning_cropped_gaussians": binning.cropped_gaussians,
        "points_overflowed": overflow,
    }
