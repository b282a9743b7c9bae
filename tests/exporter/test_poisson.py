"""Poisson surface reconstruction (counterpart of `ns-export poisson`,
`nerfstudio/scripts/exporter.py:261-380`): FFT indicator solve + marching
tetrahedra recovers a known surface from oriented points."""

import numpy as np

from neurad_tpu.exporter.poisson import normals_from_depth, poisson_reconstruct
from neurad_tpu.exporter.tsdf import marching_tetrahedra


def _sphere_cloud(n=20000, radius=1.0, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v * radius, v  # points on sphere, outward normals


def test_poisson_reconstructs_sphere():
    pts, nrm = _sphere_cloud()
    chi, iso, aabb = poisson_reconstruct(pts, nrm, resolution=64)
    # indicator is higher inside than outside
    r = chi.shape[0]
    center = chi[r // 2, r // 2, r // 2]
    corner = chi[2, 2, 2]
    assert center > iso > corner

    verts, faces = marching_tetrahedra(-chi, aabb, iso=-iso)
    assert len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    # surface vertices sit near the unit sphere
    assert abs(float(np.median(radii)) - 1.0) < 0.08
    assert float(np.std(radii)) < 0.08


def test_poisson_off_center_sphere_with_given_aabb():
    pts, nrm = _sphere_cloud(radius=0.5)
    pts = pts + np.array([0.3, -0.2, 0.1])
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    chi, iso, aabb_out = poisson_reconstruct(pts, nrm, resolution=64, aabb=aabb)
    np.testing.assert_allclose(aabb_out, aabb)
    verts, faces = marching_tetrahedra(-chi, aabb_out, iso=-iso)
    assert len(faces) > 100
    radii = np.linalg.norm(verts - np.array([0.3, -0.2, 0.1]), axis=-1)
    assert abs(float(np.median(radii)) - 0.5) < 0.06


def test_normals_from_depth_plane():
    # a z=2 plane seen from a camera at origin: normals should point -z (toward cam)
    xs, ys = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32))
    positions = np.stack([xs, ys, np.full_like(xs, 2.0)], axis=-1)
    normals, valid = normals_from_depth(positions, cam_center=np.zeros(3))
    assert valid.all()
    np.testing.assert_allclose(np.abs(normals[..., 2]), 1.0, atol=1e-6)
    assert (normals[..., 2] < 0).all()  # toward the camera at z=0
