"""TSDF fusion + marching tetrahedra tests."""

import numpy as np

from neurad_tpu.exporter.tsdf import marching_tetrahedra, tsdf_fuse, write_mesh_ply


def test_marching_tetrahedra_sphere():
    r = 32
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    grid = np.stack(
        np.meshgrid(*[np.linspace(-1, 1, r)] * 3, indexing="ij"), axis=-1
    )
    vol = np.linalg.norm(grid, axis=-1) - 0.6  # sphere SDF radius 0.6
    verts, faces = marching_tetrahedra(vol, aabb)
    assert len(verts) > 100 and len(faces) > 50
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.05)
    assert radii.std() < 0.05


def test_tsdf_fuse_flat_wall(tmp_path):
    # camera at origin looking down -z at a wall at depth 2
    h, w = 32, 32
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1]])
    c2w = np.eye(4)[:3]
    depth = np.full((h, w), 2.0, dtype=np.float32)
    aabb = np.array([[-1.0, -1.0, -3.0], [1.0, 1.0, -1.0]])
    tsdf, weights = tsdf_fuse([depth], [K], [c2w], aabb, resolution=32, trunc=0.3)
    assert weights.max() > 0
    verts, faces = marching_tetrahedra(tsdf, aabb, mask=weights > 0)
    assert len(verts) > 0
    # surface near z = -2
    np.testing.assert_allclose(verts[:, 2].mean(), -2.0, atol=0.2)
    out = tmp_path / "mesh.ply"
    write_mesh_ply(out, verts, faces)
    assert out.stat().st_size > 100
