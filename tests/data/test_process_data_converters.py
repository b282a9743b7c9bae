"""Capture-app converters -> transforms.json (counterparts of
`nerfstudio/process_data/{polycam,record3d,realitycapture,metashape,odm}_utils.py`),
exercised on synthetic app exports with known geometry."""

import json

import numpy as np
import pytest

from neurad_tpu import process_data_converters as C


def test_quat_xyzw_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = C.quat_xyzw_to_matrix(q)
    # orthonormal, det +1
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
    # identity quaternion (0,0,0,1) -> identity matrix (scalar-LAST convention)
    np.testing.assert_allclose(C.quat_xyzw_to_matrix(np.array([[0.0, 0, 0, 1]]))[0], np.eye(3), atol=1e-12)


def test_rodrigues_matches_small_angle_and_90deg():
    np.testing.assert_allclose(C.rodrigues_to_matrix(np.zeros(3)), np.eye(3))
    # 90 deg about z: x -> y
    R = C.rodrigues_to_matrix(np.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)


def _write_colmap_bin(recon, qvec, tvec):
    import struct

    with open(recon / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 4, 640, 480))  # OPENCV model
        f.write(struct.pack("<8d", 500.0, 510.0, 320.0, 240.0, 0.1, 0.01, 0.001, 0.002))
    with open(recon / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<4d", *qvec))
        f.write(struct.pack("<3d", *tvec))
        f.write(struct.pack("<i", 1))
        f.write(b"im0.jpg\x00")
        f.write(struct.pack("<Q", 2))  # two 2D points (skipped by the parser)
        f.write(struct.pack("<2dq", 1.0, 2.0, -1) + struct.pack("<2dq", 3.0, 4.0, 5))


def test_colmap_binary(tmp_path):
    """COLMAP binary model parse + OpenGL/world conversion (identity pose)."""
    _write_colmap_bin(tmp_path, qvec=(1.0, 0.0, 0.0, 0.0), tvec=(1.0, 2.0, 3.0))
    data = C.colmap_to_transforms(tmp_path, tmp_path)
    assert data["fl_x"] == 500.0 and data["fl_y"] == 510.0
    assert data["k1"] == 0.1 and data["p2"] == 0.002
    assert data["camera_model"] == "OPENCV"
    f = data["frames"][0]
    assert f["file_path"].endswith("im0.jpg") and f["colmap_im_id"] == 7
    tm = np.asarray(f["transform_matrix"])
    # identity rotation, w2c translation t -> c2w translation -t, then the
    # world permutation (0, 2, 1) with the new z row negated
    np.testing.assert_allclose(tm[:3, 3], [-1.0, -3.0, 2.0], atol=1e-12)
    assert abs(np.linalg.det(tm[:3, :3])) == pytest.approx(1.0)


def test_colmap_text(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 SIMPLE_RADIAL 640 480 500 320 240 0.05\n"
    )
    (tmp_path / "images.txt").write_text(
        "# comment\n7 1 0 0 0 0.5 0.5 0.5 1 im1.jpg\n1.0 2.0 -1\n"
    )
    data = C.colmap_to_transforms(tmp_path, tmp_path)
    assert data["fl_x"] == 500.0 and data["k1"] == 0.05
    assert len(data["frames"]) == 1
    # matches the binary path for the same pose
    _write_colmap_bin(tmp_path, qvec=(1.0, 0.0, 0.0, 0.0), tvec=(0.5, 0.5, 0.5))
    data_bin = C.colmap_to_transforms(tmp_path, tmp_path)
    np.testing.assert_allclose(
        np.asarray(data["frames"][0]["transform_matrix"]),
        np.asarray(data_bin["frames"][0]["transform_matrix"]),
        atol=1e-12,
    )


def test_polycam(tmp_path):
    cams = tmp_path / "cameras"
    cams.mkdir()
    pose = {f"t_{r}{c}": float(np.eye(4)[r, c]) for r in range(3) for c in range(4)}
    pose["t_03"] = 5.0  # x translation
    for i, (stem, blur) in enumerate((("a", 100.0), ("b", 1.0))):
        (cams / f"{stem}.json").write_text(json.dumps({
            "fx": 500.0, "fy": 500.0, "cx": 320.0, "cy": 240.0,
            "width": 640, "height": 480, "blur_score": blur, **pose,
        }))
    data = C.polycam_to_transforms(cams, ["a.jpg", "b.jpg"], tmp_path, min_blur_score=10.0)
    assert len(data["frames"]) == 1 and data["skipped_frames"] == 1
    f = data["frames"][0]
    assert f["w"] == 640 and f["fl_x"] == 500.0
    tm = np.asarray(f["transform_matrix"])
    # polycam rows permuted (2, 0, 1): x-translation row moves to row 1
    assert tm[1, 3] == 5.0
    assert (tmp_path / "transforms.json").exists()


def test_record3d(tmp_path):
    t = np.array([1.0, 2.0, 3.0])
    md = {
        "poses": [[0.0, 0.0, 0.0, 1.0, *t]] * 3,  # identity rotations
        "K": np.array([[500.0, 0, 0], [0, 500.0, 0], [320.0, 240.0, 1]]).reshape(-1).tolist(),
        "w": 640, "h": 480,
    }
    (tmp_path / "metadata.json").write_text(json.dumps(md))
    data = C.record3d_to_transforms(tmp_path / "metadata.json", ["0.jpg", "1.jpg"], tmp_path,
                                    indices=np.array([0, 2]))
    assert len(data["frames"]) == 2
    assert data["fl_x"] == 500.0 and data["cx"] == 320.0
    tm = np.asarray(data["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(tm[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(tm[:3, 3], t)


def test_realitycapture(tmp_path):
    csv_path = tmp_path / "poses.csv"
    csv_path.write_text(
        "#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
        "img1.jpg,1,2,3,0,0,0,36,0,0,0,0,0,0,0,0\n"
        "missing.jpg,0,0,0,0,0,0,36,0,0,0,0,0,0,0,0\n"
    )
    data = C.realitycapture_to_transforms(csv_path, {"img1": (480, 640)}, tmp_path)
    assert len(data["frames"]) == 1 and data["missing_images"] == 1
    f = data["frames"][0]
    # f=36mm-equivalent means fl = max(w,h) pixels
    assert f["fl_x"] == 640.0
    tm = np.asarray(f["transform_matrix"])
    np.testing.assert_allclose(tm[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(tm[:3, 3], [1, 2, 3])


def test_metashape(tmp_path):
    xml = """<document><chunk>
      <sensors>
        <sensor id="0" type="frame">
          <resolution width="640" height="480"/>
          <calibration><f>500</f><cx>2</cx><cy>-3</cy><k1>0.1</k1></calibration>
        </sensor>
      </sensors>
      <components>
        <component id="0"><transform>
          <rotation>1 0 0 0 1 0 0 0 1</rotation>
          <translation>1 1 1</translation><scale>1</scale>
        </transform></component>
      </components>
      <cameras>
        <camera sensor_id="0" component_id="0" label="im0.jpg">
          <transform>1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1</transform>
        </camera>
        <camera sensor_id="0" label="no_pose.jpg"/>
      </cameras>
    </chunk></document>"""
    p = tmp_path / "cams.xml"
    p.write_text(xml)
    data = C.metashape_to_transforms(p, tmp_path)
    assert len(data["frames"]) == 1 and data["skipped_frames"] == 1
    f = data["frames"][0]
    assert f["cx"] == 322.0 and f["cy"] == 237.0 and f["k1"] == 0.1
    tm = np.asarray(f["transform_matrix"])
    # component translation (1,1,1) permuted to rows (2,0,1); y/z columns negated
    np.testing.assert_allclose(tm[:3, 3], [1, 1, 1])
    np.testing.assert_allclose(np.abs(np.linalg.det(tm[:3, :3])), 1.0, atol=1e-12)


def test_equirect_to_perspective():
    """Pinhole crops from an equirectangular panorama (`equirect_utils.py:86-160`):
    the crop center lands on the (theta, phi) panorama pixel, and yaw wraps."""
    from neurad_tpu.process_data import equirect_to_perspective, generate_planar_projections

    h, w = 64, 128
    # color encodes longitude: R ramps with u; G encodes latitude
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.linspace(0, 1, w)[None, :]
    img[..., 1] = np.linspace(0, 1, h)[:, None]

    # theta=0 looks at lon 0 = panorama center column; phi=0 = equator row
    crop = equirect_to_perspective(img, fov_deg=60.0, theta_deg=0.0, phi_deg=0.0, out_h=33, out_w=33)
    assert crop.shape == (33, 33, 3)
    assert abs(float(crop[16, 16, 0]) - 0.5) < 0.02  # center column
    assert abs(float(crop[16, 16, 1]) - 0.5) < 0.02  # equator row
    # theta=90 looks a quarter turn away -> R ~ 0.75 (or 0.25 depending on sign)
    crop90 = equirect_to_perspective(img, 60.0, 90.0, 0.0, 33, 33)
    assert abs(float(crop90[16, 16, 0]) - 0.5) > 0.2
    # pitch up: G decreases (lat grows toward the top of the panorama)
    crop_up = equirect_to_perspective(img, 60.0, 0.0, 30.0, 33, 33)
    assert float(crop_up[16, 16, 1]) < 0.4
    # seam crossing (theta=180) must not produce NaNs or zeros-only output
    seam = equirect_to_perspective(img, 90.0, 180.0, 0.0, 33, 33)
    assert np.isfinite(seam).all() and seam[..., 0].std() > 0.01

    views = generate_planar_projections(img, fov_deg=90.0, yaw_steps=4, pitches=(0.0, 30.0))
    assert len(views) == 8
    for crop_i, c2w in views:
        assert crop_i.shape == (480, 640, 3) and c2w.shape == (3, 4)
        np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3), atol=1e-6)


def test_odm(tmp_path):
    (tmp_path / "cameras.json").write_text(json.dumps({
        "v2 cam": {"projection_type": "brown", "width": 640, "height": 480,
                    "focal_x": 0.8, "focal_y": 0.8, "c_x": 0.01, "c_y": -0.02,
                    "k1": 0.1, "k2": 0.01}
    }))
    shots = {"features": [{"properties": {
        "filename": "im0.jpg", "rotation": [0.0, 0.0, 0.0], "translation": [4.0, 5.0, 6.0],
    }}]}
    (tmp_path / "shots.geojson").write_text(json.dumps(shots))
    data = C.odm_to_transforms(tmp_path / "cameras.json", tmp_path / "shots.geojson", tmp_path)
    assert data["camera_model"] == "OPENCV"
    f = data["frames"][0]
    assert f["fl_x"] == pytest.approx(0.8 * 640)
    assert f["k1"] == 0.1
    tm = np.asarray(f["transform_matrix"])
    np.testing.assert_allclose(tm[:3, 3], [4, 5, 6])
    # OpenGL flip: y/z basis negated
    np.testing.assert_allclose(tm[:3, :3], np.diag([1.0, -1.0, -1.0]))
