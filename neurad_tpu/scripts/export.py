"""nt-export: export point clouds / gaussian splats from a checkpoint.

TPU-native counterpart of `nerfstudio/scripts/exporter.py` (pointcloud 50-200,
gaussian splat PLY 500-608).
"""

from __future__ import annotations

import argparse
import struct
from pathlib import Path

import numpy as np


def write_ply(path: Path, fields: dict):
    """Minimal binary-little-endian PLY writer (vertex elements only)."""
    names = list(fields)
    n = len(next(iter(fields.values())))
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    for name in names:
        header.append(f"property float {name}")
    header.append("end_header")
    arr = np.stack([np.asarray(fields[k], dtype="<f4") for k in names], axis=-1)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(arr.tobytes())


def export_pointcloud(pipeline, state, out_path: Path, num_rays: int = 50000):
    """Render eval lidar scans and dump predicted points (`exporter.py:50-200`).
    Works for both pipeline families via the shared render_eval_lidar keys."""
    if not hasattr(pipeline, "render_eval_lidar"):
        raise SystemExit(
            "pointcloud export renders eval lidar scans — use a lidar-capable "
            "method (neurad/splatad); for splatfacto use `gaussian-splat`"
        )
    pts, cols = [], []
    for si in pipeline.outputs.eval_lidar_indices:
        out = pipeline.render_eval_lidar(state, si)
        xyz = np.asarray(out["origins"]) + np.asarray(out["directions"]) * np.asarray(out["depth"])
        keep = out["depth"][:, 0] < 1e3
        pts.append(xyz[keep])
        cols.append(np.repeat(out["intensity"][keep], 3, axis=-1))
    pts = np.concatenate(pts) if pts else np.zeros((0, 3))
    cols = np.concatenate(cols) if cols else np.zeros((0, 3))
    write_ply(out_path, {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                         "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2]})
    return len(pts)


def export_gaussian_splat(params: dict, out_path: Path):
    """Dump gaussians as a 3DGS-convention PLY (`exporter.py:500-608`).
    Handles both param schemas: SplatAD ('features') and splatfacto
    ('sh_dc'/'sh_rest')."""
    p = params["params"]
    means = np.asarray(p["means"])
    scales = np.asarray(p["scales"])
    quats = np.asarray(p["quats"])
    op = np.asarray(p["opacities"])
    if "features" in p:
        feats = np.asarray(p["features"])
    else:
        feats = np.concatenate([np.asarray(p["sh_dc"]), np.asarray(p["sh_rest"])], axis=-1)
    fields = {
        "x": means[:, 0], "y": means[:, 1], "z": means[:, 2],
        "scale_0": scales[:, 0], "scale_1": scales[:, 1], "scale_2": scales[:, 2],
        "rot_0": quats[:, 0], "rot_1": quats[:, 1], "rot_2": quats[:, 2], "rot_3": quats[:, 3],
        "opacity": op,
    }
    for i in range(min(feats.shape[1], 16)):
        fields[f"f_dc_{i}" if i < 3 else f"f_rest_{i-3}"] = feats[:, i]
    write_ply(out_path, fields)
    return means.shape[0]


def export_tsdf_mesh(pipeline, state, out_path: Path, resolution: int = 128):
    """Render eval-camera depths, TSDF-fuse, marching-tetrahedra mesh
    (`exporter.py` tsdf path)."""
    from neurad_tpu.exporter.tsdf import marching_tetrahedra, tsdf_fuse, write_mesh_ply

    depths, Ks, c2ws = [], [], []
    cams = pipeline.outputs.cameras
    for ci in pipeline.outputs.eval_camera_indices:
        bundle, _, (hs, ws) = pipeline.datamanager.eval_camera_bundle(ci)
        nff = pipeline._chunked_nff(state.params, bundle, all_camera=True)
        depths.append(np.asarray(nff["depth"]).reshape(hs, ws))
        up = pipeline.config.datamanager.rgb_upsample_factor
        Ks.append(
            np.array(
                [
                    [float(cams.fx[ci, 0]) / up, 0, float(cams.cx[ci, 0]) / up],
                    [0, float(cams.fy[ci, 0]) / up, float(cams.cy[ci, 0]) / up],
                    [0, 0, 1],
                ]
            )
        )
        c2ws.append(np.asarray(cams.camera_to_worlds[ci]))
    aabb = np.asarray(pipeline.outputs.scene_box.aabb)
    tsdf, weights = tsdf_fuse(depths, Ks, c2ws, aabb, resolution=resolution)
    verts, faces = marching_tetrahedra(tsdf, aabb, mask=weights > 0)
    write_mesh_ply(out_path, verts, faces)
    return len(verts), len(faces)


def export_poisson_mesh(
    pipeline, state, out_path: Path, resolution: int = 192, num_points: int = 500_000
):
    """Depth-render eval cameras -> oriented point cloud -> Poisson surface
    reconstruction -> mesh (`exporter.py:261-380` ExportPoissonMesh; open3d's
    screened Poisson replaced by the FFT indicator solve in
    `exporter/poisson.py`)."""
    from neurad_tpu.exporter.poisson import normals_from_depth, poisson_reconstruct
    from neurad_tpu.exporter.tsdf import marching_tetrahedra, write_mesh_ply

    pts, nrms = [], []
    for ci in pipeline.outputs.eval_camera_indices:
        bundle, _, (hs, ws) = pipeline.datamanager.eval_camera_bundle(ci)
        nff = pipeline._chunked_nff(state.params, bundle, all_camera=True)
        depth = np.asarray(nff["depth"]).reshape(hs, ws, 1)
        origins = np.asarray(bundle.origins).reshape(hs, ws, 3)
        dirs = np.asarray(bundle.directions).reshape(hs, ws, 3)
        positions = origins + dirs * depth
        normals, valid = normals_from_depth(positions, cam_center=origins[0, 0])
        keep = valid & (depth[..., 0] < 1e3)
        pts.append(positions[keep])
        nrms.append(normals[keep])
    pts = np.concatenate(pts) if pts else np.zeros((0, 3))
    nrms = np.concatenate(nrms) if nrms else np.zeros((0, 3))
    if len(pts) > num_points:
        sel = np.random.default_rng(0).choice(len(pts), num_points, replace=False)
        pts, nrms = pts[sel], nrms[sel]
    chi, iso, aabb = poisson_reconstruct(pts, nrms, resolution=resolution)
    verts, faces = marching_tetrahedra(-chi, aabb, iso=-iso)
    write_mesh_ply(out_path, verts, faces)
    return len(verts), len(faces)


def export_field_mesh(pipeline, state, out_path: Path, resolution: int = 256, time: float = 0.0,
                      chunk: int = 131072):
    """Direct field iso-surface: evaluate the model's SDF (or density) on a
    dense grid and mesh the zero/threshold level set with marching tetrahedra.

    Counterpart of the reference's marching-cubes export
    (`exporter.py` ExportMarchingCubesMesh + `exporter/marching_cubes.py`
    multi-res evaluation); iso-extraction is marching tetrahedra (no 256-case
    tables; same surface family). Grid evaluation is chunked so any resolution
    fits device memory.
    """
    import jax
    import jax.numpy as jnp

    from neurad_tpu.exporter.tsdf import marching_tetrahedra, write_mesh_ply
    from neurad_tpu.models.neurad import NeuRADModel

    aabb = np.asarray(pipeline.outputs.scene_box.aabb)
    r = resolution
    grid = np.stack(
        np.meshgrid(*[np.linspace(aabb[0, i], aabb[1, i], r) for i in range(3)], indexing="ij"),
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)

    query = jax.jit(
        lambda pts: pipeline.model.apply(state.params, pts, time, method=NeuRADModel.query_geometry)
    )
    vals = []
    pad = (-len(grid)) % chunk
    gpad = np.concatenate([grid, np.zeros((pad, 3), np.float32)]) if pad else grid
    for i in range(0, len(gpad), chunk):
        vals.append(np.asarray(query(jnp.asarray(gpad[i:i + chunk]))))
    vol = np.concatenate(vals)[: len(grid)].reshape(r, r, r)

    use_sdf = getattr(pipeline.model, "use_sdf", True)
    iso = 0.0 if use_sdf else float(np.quantile(vol, 0.98))
    # marching_tetrahedra treats vals < iso as inside; SDF is negative inside,
    # density is LARGE inside -> negate for the density path
    verts, faces = marching_tetrahedra(vol if use_sdf else -vol, aabb, iso=iso if use_sdf else -iso)
    write_mesh_ply(out_path, verts, faces)
    return len(verts), len(faces)


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Export from a trained neurad_tpu run")
    parser.add_argument(
        "mode",
        choices=["pointcloud", "gaussian-splat", "camera-poses", "tsdf-mesh", "field-mesh", "poisson"],
    )
    parser.add_argument("run_dir")
    parser.add_argument("--output", default=None)
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--time", type=float, default=0.0)
    args = parser.parse_args(argv)

    from neurad_tpu.scripts.eval import load_run

    pipeline, state, step = load_run(args.run_dir)
    out = Path(args.output or (Path(args.run_dir) / f"export_{args.mode}.ply"))

    if args.mode == "pointcloud":
        n = export_pointcloud(pipeline, state, out)
        print(f"[nt-export] wrote {n} points to {out}")
    elif args.mode == "tsdf-mesh":
        nv, nf = export_tsdf_mesh(pipeline, state, out, resolution=args.resolution)
        print(f"[nt-export] wrote mesh with {nv} verts / {nf} faces to {out}")
    elif args.mode == "field-mesh":
        nv, nf = export_field_mesh(pipeline, state, out, resolution=args.resolution, time=args.time)
        print(f"[nt-export] wrote field mesh with {nv} verts / {nf} faces to {out}")
    elif args.mode == "poisson":
        nv, nf = export_poisson_mesh(pipeline, state, out, resolution=args.resolution)
        print(f"[nt-export] wrote poisson mesh with {nv} verts / {nf} faces to {out}")
    elif args.mode == "gaussian-splat":
        n = export_gaussian_splat(state.params, out)
        print(f"[nt-export] wrote {n} gaussians to {out}")
    else:  # camera-poses (transforms.json-style, `exporter.py` ExportCameraPoses)
        import json

        cams = pipeline.outputs.cameras
        frames = []
        for i in range(np.asarray(cams.camera_to_worlds).shape[0]):
            frames.append({
                "camera_to_world": np.asarray(cams.camera_to_worlds[i]).tolist(),
                "fx": float(np.asarray(cams.fx[i]).reshape(-1)[0]),
                "fy": float(np.asarray(cams.fy[i]).reshape(-1)[0]),
                "cx": float(np.asarray(cams.cx[i]).reshape(-1)[0]),
                "cy": float(np.asarray(cams.cy[i]).reshape(-1)[0]),
                "w": int(np.asarray(cams.width[i]).reshape(-1)[0]),
                "h": int(np.asarray(cams.height[i]).reshape(-1)[0]),
                "time": float(np.asarray(cams.times[i]).reshape(-1)[0]) if cams.times is not None else None,
                "split": "eval" if i in set(pipeline.outputs.eval_camera_indices) else "train",
            })
        out = out.with_suffix(".json")
        out.write_text(json.dumps({"frames": frames}, indent=1))
        print(f"[nt-export] wrote {len(frames)} camera poses to {out}")


if __name__ == "__main__":
    entrypoint()
