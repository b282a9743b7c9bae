"""points_in_box / remove_dynamic_points (`data/utils/data_utils.py:92-140`)."""

import numpy as np

from neurad_tpu.data.data_utils import points_in_box, remove_dynamic_points


def test_points_in_box_oriented():
    # box rotated 90 deg about z, centered at (10, 0, 0), extents (4, 2, 2)
    c, s = 0.0, 1.0
    box2world = np.array([
        [c, -s, 0, 10.0],
        [s, c, 0, 0.0],
        [0, 0, 1, 0.0],
        [0, 0, 0, 1.0],
    ])
    pts = np.array([
        [10.0, 0.0, 0.0],   # center -> in
        [10.0, 1.9, 0.0],   # along rotated x (half=2) -> in
        [10.9, 0.0, 0.0],   # along rotated y (half=1) -> in
        [11.1, 0.0, 0.0],   # beyond rotated y half -> out
        [10.0, 0.0, 1.1],   # above -> out
    ])
    mask = points_in_box(pts, box2world, np.array([4.0, 2.0, 2.0]))
    assert mask.tolist() == [True, True, True, False, False]


def test_remove_dynamic_points():
    # one dynamic actor at x=20 at t=0; one static ignored
    traj_dyn = {
        "poses": np.broadcast_to(np.eye(4), (2, 4, 4)).copy(),
        "timestamps": np.array([0.0, 1.0]),
        "dims": np.array([4.0, 4.0, 4.0]),
        "stationary": False,
    }
    traj_dyn["poses"] = traj_dyn["poses"].copy()
    traj_dyn["poses"][:, 0, 3] = 20.0
    traj_static = {**traj_dyn, "stationary": True}
    pc = np.array([[1.0, 0, 0, 0.5], [20.0, 0, 0, 0.5], [40.0, 0, 0, 0.5]], dtype=np.float32)
    l2w = np.eye(4)
    out = remove_dynamic_points([pc], [l2w], [0.0], [traj_dyn, traj_static])
    assert out[0].shape == (2, 4)
    assert np.allclose(out[0][:, 0], [1.0, 40.0])
    # no matching timestamp -> nothing removed
    out2 = remove_dynamic_points([pc], [l2w], [5.0], [traj_dyn])
    assert out2[0].shape == (3, 4)


def test_external_methods_registry():
    import pytest

    from neurad_tpu.configs.external_methods import get_external_methods
    from neurad_tpu.configs.method_configs import get_method_config

    assert "unisim" in get_external_methods()
    with pytest.raises(KeyError, match="external method"):
        get_method_config("unisim")
    with pytest.raises(KeyError, match="unknown method"):
        get_method_config("not-a-method")
