"""MODEL-LEVEL golden parity for SplatAD vs the reference torch implementation.

VERDICT round-2 missing #1 (second half): the SplatAD Python-side math from
`/root/reference/nerfstudio/models/splatad.py:835-1035` run as a torch oracle
against our jnp counterparts:

  - `_get_actor_adjusted_means` (actor box transforms + velocity composition,
    `splatad.py:835-869`) vs `models/splatad.actor_adjusted_means`, driven by
    REAL DynamicActors on both sides (so 6D pose interpolation and velocity
    interpolation are exercised too, with moving actors),
  - `get_viewmat` (`splatfacto.py:131-142`) vs `viewmat_from_c2w_opengl`,
  - `get_ray_dirs_pinhole` (`splatad.py:100-115`) vs `ray_dirs_pinhole`,
  - `RGBDecoderCNN` forward + input gradients (`splatad.py:118-150`) with
    TRANSPLANTED conv weights (torch OIHW -> flax HWIO),
  - the lidar decoder `MLP` (`splatad.py:364-371`) with transplanted weights,
    including the world-frame ray-dir input convention (`splatad.py:1183-1196`)
    and the sigmoid intensity / raw ray-drop-logit split.

The gsplat fork's CUDA projection/compositing kernels are not importable here;
their numerics are covered by the per-point-vs-tiled allclose tests in
tests/ops/test_gaussians.py and the reference-formula median-depth test below
(`splatad.py:1297-1299`).

Skipped wholesale when /root/reference is unavailable.
"""

import importlib.abc
import importlib.machinery
import os
import sys
import types
from types import SimpleNamespace
from unittest import mock

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not available")

H, W = 12, 16
FEAT_DIM = 16  # features_dc(3) + features_rest(13), reference default
APP_DIM = 8

# data-SDK imports pulled in transitively by splatad.py's dataparser-config
# import chain: attribute access yields MagicMocks (enum members, functions)
_MOCK_ROOTS = (
    "av2", "pandas", "pyquaternion", "nuscenes", "pyarrow",
    "pandaset", "zod", "pykitti", "open3d", "plotly", "matplotlib",
)
# gsplat / msssim symbols are SUBCLASSED or instantiated at import time ->
# attribute access must yield real (permissive) classes, not mocks
_CLASS_ROOTS = ("gsplat", "pytorch_msssim")


class _PermissiveBase:
    def __init__(self, *a, **k):
        pass


class _AutoStub(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] in _MOCK_ROOTS + _CLASS_ROOTS:
            return importlib.machinery.ModuleSpec(name, self, is_package=True)
        return None

    def create_module(self, spec):
        m = types.ModuleType(spec.name)
        m.__path__ = []
        as_class = spec.name.split(".")[0] in _CLASS_ROOTS

        def _ga(a, _n=spec.name, _c=as_class):
            if a.startswith("__"):
                raise AttributeError(a)
            if _c:
                return type(a, (_PermissiveBase,), {})
            return mock.MagicMock(name=f"{_n}.{a}")

        m.__getattr__ = _ga
        return m

    def exec_module(self, module):
        pass


@pytest.fixture(scope="module")
def sref():
    """Reference splatad module with CUDA/data-SDK deps stubbed."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_reference_parity import ref as _ref_fixture

    ns = _ref_fixture.__wrapped__()  # base stubbing (tyro/viser/cv2/...) + sys.path

    if not any(isinstance(f, _AutoStub) for f in sys.meta_path):
        sys.meta_path.insert(0, _AutoStub())
    tyro = sys.modules.get("tyro")
    if tyro is not None and not getattr(tyro, "__file__", None):
        tyro.extras = mock.MagicMock(name="tyro.extras")
        tyro.conf = mock.MagicMock(name="tyro.conf")

    import torch

    from nerfstudio.cameras.cameras import Cameras as RefCameras
    from nerfstudio.field_components.mlp import MLP as RefMLP
    from nerfstudio.model_components.dynamic_actors import (
        DynamicActors as RefDynamicActors,
        DynamicActorsConfig as RefDynamicActorsConfig,
    )
    from nerfstudio.models import splatad as ref_splatad
    from nerfstudio.models.splatfacto import get_viewmat as ref_get_viewmat

    ns.torch = torch
    ns.splatad = ref_splatad
    ns.get_viewmat = ref_get_viewmat
    ns.RefCameras = RefCameras
    ns.RefMLP = RefMLP
    ns.RefDynamicActors = RefDynamicActors
    ns.RefDynamicActorsConfig = RefDynamicActorsConfig
    return ns


import jax  # noqa: E402  (after conftest has pinned the CPU platform)
import jax.numpy as jnp  # noqa: E402


def _conv_to_flax(torch_conv):
    return {
        "kernel": jnp.asarray(torch_conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(torch_conv.bias.detach().numpy()),
    }


def test_rgb_decoder_parity_outputs_and_grads(sref):
    """RGBDecoderCNN with transplanted weights: outputs + input grads allclose."""
    import flax

    from neurad_tpu.models.splatad import RGBDecoderCNN

    torch = sref.torch
    torch.manual_seed(0)
    # net input = (features - skip 3 albedo ch) + 3 ray-dir ch = FEAT + APP
    in_dim = FEAT_DIM + APP_DIM
    ref_dec = sref.splatad.RGBDecoderCNN(in_dim, hidden_dim=32, kernel_size=3, num_hidden_blocks=1)
    ref_dec.eval()

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(H, W, FEAT_DIM + APP_DIM)).astype(np.float32)
    dirs = rng.normal(size=(H, W, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    our_dec = RGBDecoderCNN(hidden_dim=32, kernel_size=3, num_hidden_blocks=1, compute_dtype=jnp.float32)
    params = our_dec.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(dirs))

    # transplant: net = [BasicBlock(in->32), BasicBlock(32->32), Conv2d(32,6,1)]
    blocks = list(ref_dec.net)
    p = flax.core.unfreeze(params)["params"]
    b0 = blocks[0]
    p["BasicBlock_0"] = {
        "Conv_0": _conv_to_flax(b0.res_branch),  # 1x1 res conv (in != dim)
        "Conv_1": _conv_to_flax(b0.main_branch[0]),
        "Conv_2": _conv_to_flax(b0.main_branch[3]),
    }
    b1 = blocks[1]
    p["BasicBlock_1"] = {
        "Conv_0": _conv_to_flax(b1.main_branch[0]),  # res is Identity (in == dim)
        "Conv_1": _conv_to_flax(b1.main_branch[3]),
    }
    p["Conv_0"] = _conv_to_flax(blocks[2])
    params = {"params": p}

    ft = torch.from_numpy(feats).requires_grad_(True)
    # the model passes ray_dirs batched (`splatad.py:1014`: ray_dirs.unsqueeze(0))
    ref_out = ref_dec(ft, torch.from_numpy(dirs)[None])
    ref_out.sum().backward()

    def f(x):
        return our_dec.apply(params, x, jnp.asarray(dirs)).sum()

    our_out = our_dec.apply(params, jnp.asarray(feats), jnp.asarray(dirs))
    our_grad = jax.grad(f)(jnp.asarray(feats))

    np.testing.assert_allclose(np.asarray(our_out), ref_out.detach().numpy()[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_grad), ft.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_lidar_decoder_mlp_parity(sref):
    """Lidar decoder MLP (feature+appearance+world ray dir -> intensity, drop)."""
    from neurad_tpu.fields.mlp import MLP

    torch = sref.torch
    torch.manual_seed(1)
    in_dim = FEAT_DIM + APP_DIM + 3
    ref_mlp = sref.RefMLP(in_dim=in_dim, num_layers=3, layer_width=32, out_dim=2, implementation="torch")
    ref_mlp.eval()

    our_mlp = MLP(out_dim=2, num_layers=3, layer_width=32, compute_dtype=None)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(64, in_dim)).astype(np.float32)
    params = our_mlp.init(jax.random.PRNGKey(0), jnp.asarray(x))

    import flax

    p = flax.core.unfreeze(params)["params"]
    layers = list(ref_mlp.layers)
    for i, layer in enumerate(layers):
        key = "output" if i == len(layers) - 1 else f"hidden_{i}"
        p[key] = {
            "kernel": jnp.asarray(layer.weight.detach().numpy().T),
            "bias": jnp.asarray(layer.bias.detach().numpy()),
        }
    params = {"params": p}

    with torch.no_grad():
        ref_out = ref_mlp(torch.from_numpy(x)).numpy()
    our_out = np.asarray(our_mlp.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)

    # the model consumes this as sigmoid(intensity), raw drop logits
    # (`splatad.py:1221-1230` / our get_lidar_outputs)
    np.testing.assert_allclose(
        1.0 / (1.0 + np.exp(-ref_out[:, :1])), np.asarray(jax.nn.sigmoid(jnp.asarray(our_out[:, :1]))),
        rtol=1e-5, atol=1e-6,
    )


def test_get_viewmat_parity(sref):
    from neurad_tpu.models.splatad import viewmat_from_c2w_opengl

    torch = sref.torch
    rng = np.random.default_rng(7)
    # random valid OpenGL c2w
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )
    t = rng.normal(size=3).astype(np.float32) * 10
    c2w = np.concatenate([R, t[:, None]], axis=1)  # [3, 4]

    ref_vm = sref.get_viewmat(torch.from_numpy(c2w[None])).numpy()[0]
    our_vm = np.asarray(viewmat_from_c2w_opengl(jnp.asarray(c2w)))
    np.testing.assert_allclose(our_vm, ref_vm, rtol=1e-6, atol=1e-6)


def test_ray_dirs_pinhole_parity(sref):
    from neurad_tpu.models.splatad import ray_dirs_pinhole

    torch = sref.torch
    rng = np.random.default_rng(9)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )
    c2w = np.concatenate([R, rng.normal(size=(3, 1)).astype(np.float32)], axis=1)
    fx, fy, cx, cy = 20.0, 22.0, W / 2 - 0.3, H / 2 + 0.4

    cam = sref.RefCameras(
        camera_to_worlds=torch.from_numpy(c2w[None]),
        fx=fx, fy=fy, cx=cx, cy=cy, width=W, height=H,
    )
    ref_dirs = sref.splatad.get_ray_dirs_pinhole(cam, W, H, torch.from_numpy(c2w[None])).numpy()

    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    our_dirs = np.asarray(ray_dirs_pinhole(K, W, H, jnp.asarray(c2w)))
    np.testing.assert_allclose(our_dirs, ref_dirs, rtol=1e-5, atol=1e-6)


def _moving_trajectories(torch, n_times=4, duration=3.0):
    """Two actors moving along +x / +y with a slow yaw, so velocities are nonzero."""
    trajs = []
    ts = torch.linspace(0.0, duration, n_times)
    for k, (c0, v) in enumerate([((8.0, 0.0, 0.0), (2.0, 0.0, 0.0)), ((20.0, 4.0, 0.5), (0.0, 1.5, 0.0))]):
        poses = torch.eye(4).repeat(n_times, 1, 1)
        yaw_rate = 0.1 * (k + 1)
        for i, t in enumerate(ts):
            yaw = yaw_rate * float(t)
            poses[i, 0, 0] = np.cos(yaw)
            poses[i, 0, 1] = -np.sin(yaw)
            poses[i, 1, 0] = np.sin(yaw)
            poses[i, 1, 1] = np.cos(yaw)
            poses[i, :3, 3] = torch.tensor(c0) + torch.tensor(v) * t
        trajs.append(
            {
                "poses": poses,
                "timestamps": ts.clone(),
                "dims": torch.tensor([2.0, 4.0, 1.8]),
                "label": "car",
                "stationary": False,
                "symmetric": False,
                "deformable": False,
                # both frameworks read explicit per-time velocity channels
                # (`dynamic_actors.py:135-140`)
                "linear_velocities_global": torch.tensor(v).repeat(n_times, 1),
                "angular_velocities_local": torch.tensor([0.0, 0.0, yaw_rate]).repeat(n_times, 1),
            }
        )
    return trajs


def test_actor_adjusted_means_parity(sref):
    """`_get_actor_adjusted_means` vs ours, through REAL DynamicActors on both
    sides: 6D pose interpolation, velocity interpolation, world transform and
    the v = lin + omega x r composition must all agree."""
    torch = sref.torch
    trajs = _moving_trajectories(torch)
    ref_actors = sref.RefDynamicActors(sref.RefDynamicActorsConfig(), trajs)
    ref_actors.eval()
    n_actors = 2

    rng = np.random.default_rng(13)
    n = 50
    means = rng.normal(size=(n, 3)).astype(np.float32)  # box frame for actors
    ids = rng.integers(0, n_actors + 1, size=n).astype(np.int64)  # n_actors = static
    t_query = 1.37

    stub_self = SimpleNamespace(
        training=False,
        dynamic_actors=ref_actors,
        config=SimpleNamespace(actor_flip_probability=0.0),
        device="cpu",
    )
    with torch.no_grad():
        ref_means, ref_vels = sref.splatad.SplatADModel._get_actor_adjusted_means(
            stub_self,
            torch.from_numpy(means),
            torch.full((1, 1), t_query),
            torch.from_numpy(ids)[:, None],
        )

    from neurad_tpu.model_components.dynamic_actors import (
        DynamicActors,
        actor_data_from_trajectories,
    )
    from neurad_tpu.models.splatad import actor_adjusted_means

    np_trajs = [
        {
            "poses": t["poses"].numpy(),
            "timestamps": t["timestamps"].numpy(),
            "dims": t["dims"].numpy(),
            "symmetric": False,
            "deformable": False,
            "linear_velocities_global": t["linear_velocities_global"].numpy(),
            "angular_velocities_local": t["angular_velocities_local"].numpy(),
        }
        for t in trajs
    ]
    actors = DynamicActors(data=actor_data_from_trajectories(np_trajs))
    aparams = actors.init(jax.random.PRNGKey(0), jnp.array([t_query]))
    b2w, _ = actors.apply(aparams, jnp.array([t_query]), method=DynamicActors.get_boxes2world)
    vels6 = actors.apply(aparams, jnp.array([t_query]), method=DynamicActors.get_velocities)[0]
    our_means, our_vels = actor_adjusted_means(
        jnp.asarray(means), jnp.asarray(ids), n_actors, b2w[0], vels6
    )

    np.testing.assert_allclose(np.asarray(our_means), ref_means.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(our_vels), ref_vels.numpy(), rtol=1e-4, atol=1e-4)
    # sanity: moving actors -> nonzero velocities for actor gaussians
    assert np.abs(ref_vels.numpy()[ids < n_actors]).max() > 0.1


def test_median_depth_reference_formula():
    """Median depth follows the reference protocol (`splatad.py:1297-1299`):
    depth of the first gaussian whose CUMULATIVE weight crosses absolute 0.5;
    rays that never reach alpha 0.5 get expected-depth / alpha instead."""
    from neurad_tpu.ops import gaussians as G
    from neurad_tpu.ops.gaussian_rasterize import rasterize_lidar_points

    n = 4
    means = jnp.array([[5.0, 0, 0], [8.0, 0, 0], [11.0, 0, 0], [300.0, 200, 0]])
    covar6 = G.quat_scale_to_covar6(
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)), jnp.full((n, 3), 1.2)
    )
    viewmat = jnp.eye(4)
    proj = G.project_gaussians_lidar(
        means, covar6=covar6, viewmat=viewmat,
        velocities=jnp.zeros((n, 3)),
        lidar_linear_velocity=jnp.zeros(3), lidar_angular_velocity=jnp.zeros(3),
    )
    feats = jnp.ones((n, 4))
    raster = jnp.array([[0.0, 0.0, 6.0, 0.0]])  # one query straight down +x

    # opaque case: cumulative weight crosses 0.5 at the first gaussian
    out_hi = rasterize_lidar_points(
        proj, feats, jnp.full((n,), 0.95), raster, elev_range=(-30.0, 30.0)
    )
    assert float(out_hi["alpha"][0, 0]) > 0.5
    np.testing.assert_allclose(float(out_hi["median_depth"][0, 0]), 5.0, atol=0.2)

    # translucent case: alpha never reaches 0.5 -> expected depth / alpha
    out_lo = rasterize_lidar_points(
        proj, feats, jnp.full((n,), 0.10), raster, elev_range=(-30.0, 30.0)
    )
    alpha = float(out_lo["alpha"][0, 0])
    assert alpha < 0.5
    np.testing.assert_allclose(
        float(out_lo["median_depth"][0, 0]),
        float(out_lo["depth"][0, 0]) / max(alpha, 1e-10),
        rtol=1e-5,
    )
