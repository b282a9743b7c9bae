"""FULL NeuRADModel.get_outputs + loss-dict golden parity vs the reference.

Round-3 proved the FIELD (hashgrid -> MLPs -> SDF -> pixel render) and the actor
association against the reference's torch code; this module extends the oracle
to everything ABOVE the field (VERDICT round-3 missing #1):

  - the proposal-sampling chain: PowerSampler initial samples -> 2 PDF rounds
    (`/root/reference/nerfstudio/model_components/ray_samplers.py:569-666,838-852`),
  - sky-sample stretch + leftover accumulation (`models/neurad.py:368-455`),
  - temporal appearance interpolation (`models/neurad.py:423-441`),
  - the RGB decoder CNN with transplanted conv/BN weights (`models/neurad.py:201-216`),
  - the lidar decoder, and the full training loss dict (`models/neurad.py:461-561`).

Both models run rng-free (eval-mode samplers, flip_prob=0) with transplanted
weights; outputs, losses, and gradients of every parameter must agree.

The reference's heavy CUDA deps are replaced with exact pure-torch stand-ins:
nerfacc's render/accumulate ops are implemented with the same math they compute
(already golden-tested at op level in tests/test_reference_parity.py), and the
VGG perceptual loss is zeroed on BOTH sides (its exactness is covered by
tests/model_components/test_perceptual_exact.py).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not available")

# --- tiny-but-structured config shared by both sides ---
L_STATIC, HASH_LOG2, F_STATIC = 4, 12, 4
BASE_RES, MAX_RES = 16, 128
L_PROP, PROP_LOG2 = 3, 12
NUM_PROP_SAMPLES, NUM_NERF_SAMPLES = (16, 8), 8
POWER_LAMBDA, POWER_SCALING, SKY = -1.0, 0.1, 100.0
APP_DIM, DURATION, N_SENSORS = 4, 2.0, 2
RGB_HIDDEN, UPSAMPLE = 8, 3
PATCH = 4
N_PATCHES, N_LIDAR = 2, 16
N_CAM = N_PATCHES * PATCH * PATCH
R = N_CAM + N_LIDAR
AABB = 30.0


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_reference_parity import ref as _ref_fixture

    ns = _ref_fixture.__wrapped__()  # stubs tyro/viser/torchvision etc.
    import torch

    # ---- stub nerfacc with exact pure-torch math (CPU) ----
    def render_weight_from_alpha(alphas, **kw):
        trans = torch.cumprod(
            torch.cat([torch.ones_like(alphas[..., :1]), 1.0 - alphas[..., :-1]], dim=-1), dim=-1
        )
        return alphas * trans, trans

    def render_weight_from_density(t_starts=None, t_ends=None, sigmas=None, **kw):
        delta = t_ends - t_starts
        alphas = 1.0 - torch.exp(-sigmas * delta)
        w, trans = render_weight_from_alpha(alphas)
        return w, trans, alphas

    def accumulate_along_rays(weights, values=None, ray_indices=None, n_rays=None):
        assert ray_indices is None, "packed mode not used by NeuRAD on CPU"
        if values is None:
            values = torch.ones_like(weights[..., None])
        return torch.sum(weights[..., None] * values, dim=-2)

    nerfacc = types.ModuleType("nerfacc")
    nerfacc.render_weight_from_alpha = render_weight_from_alpha
    nerfacc.render_weight_from_density = render_weight_from_density
    nerfacc.accumulate_along_rays = accumulate_along_rays
    nerfacc.OccGridEstimator = type("OccGridEstimator", (), {})
    sys.modules.setdefault("nerfacc", nerfacc)

    # ---- stub torchmetrics (metrics objects unused by the compared values) ----
    class _Metric:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return torch.zeros(())

    tm = types.ModuleType("torchmetrics")
    tm.__path__ = []
    tmf = types.ModuleType("torchmetrics.functional")
    tmf.structural_similarity_index_measure = _Metric()
    tmi = types.ModuleType("torchmetrics.image")
    tmi.PeakSignalNoiseRatio = _Metric
    tmil = types.ModuleType("torchmetrics.image.lpip")
    tmil.LearnedPerceptualImagePatchSimilarity = _Metric
    tmi.lpip = tmil
    for name, mod in (
        ("torchmetrics", tm), ("torchmetrics.functional", tmf),
        ("torchmetrics.image", tmi), ("torchmetrics.image.lpip", tmil),
    ):
        sys.modules.setdefault(name, mod)

    import nerfstudio.models.neurad as ref_neurad

    # zero-VGG on both sides (exactness covered by the perceptual oracle tests)
    class _ZeroVGG(torch.nn.Module):
        def forward(self, *a, **k):
            return torch.zeros(())

    ref_neurad.VGGPerceptualLossPix2Pix = _ZeroVGG

    # the reference's _render_weights has a CPU escape hatch returning FAKE
    # 0.5 weights (`models/neurad.py:713-715`, "for debugging on devices
    # without cuda") — replace it with the real nerfacc math so the oracle
    # renders true weights
    from nerfstudio.field_components.field_heads import FieldHeadNames

    def _real_render_weights(self, outputs, ray_samples):
        if self.config.field.use_sdf:
            value = outputs[FieldHeadNames.ALPHA].squeeze(-1)
            weights, _ = render_weight_from_alpha(value)
        else:
            value = outputs[FieldHeadNames.DENSITY].squeeze(-1)
            weights, _, _ = render_weight_from_density(
                t_starts=ray_samples.frustums.starts.squeeze(-1),
                t_ends=ray_samples.frustums.ends.squeeze(-1),
                sigmas=value,
            )
        return weights

    ref_neurad.NeuRADModel._render_weights = _real_render_weights

    from nerfstudio.data.scene_box import SceneBox
    from nerfstudio.field_components.neurad_encoding import (
        ActorSettings as RefActorSettings,
        NeuRADHashEncodingConfig as RefGridConfig,
        StaticSettings as RefStaticSettings,
    )
    from nerfstudio.fields.neurad_field import (
        NeuRADFieldConfig as RefFieldConfig,
        NeuRADProposalFieldConfig as RefPropConfig,
    )

    ns.torch = torch
    ns.ref_neurad = ref_neurad
    ns.SceneBox = SceneBox
    ns.RefStaticSettings = RefStaticSettings
    ns.RefActorSettings = RefActorSettings
    ns.RefGridConfig = RefGridConfig
    ns.RefFieldConfig = RefFieldConfig
    ns.RefPropConfig = RefPropConfig
    return ns


def _ref_model(ref):
    torch = ref.torch
    torch.manual_seed(3)
    static = ref.RefStaticSettings(
        hashgrid_dim=F_STATIC, num_levels=L_STATIC, base_res=BASE_RES,
        max_res=MAX_RES, log2_hashmap_size=HASH_LOG2,
    )
    prop_grid = lambda: ref.RefGridConfig(
        static=ref.RefStaticSettings(
            hashgrid_dim=1, num_levels=L_PROP, base_res=BASE_RES, max_res=MAX_RES,
            log2_hashmap_size=PROP_LOG2,
        ),
        actor=ref.RefActorSettings(flip_prob=0.0),
        require_actor_grad=False,
    )
    config = ref.ref_neurad.NeuRADModelConfig(
        implementation="torch",
        enable_collider=False,
        field=ref.RefFieldConfig(
            grid=ref.RefGridConfig(
                static=static, actor=ref.RefActorSettings(flip_prob=0.0), require_actor_grad=False
            ),
        ),
        sampling=ref.ref_neurad.SamplingSettings(
            num_proposal_samples=NUM_PROP_SAMPLES,
            num_nerf_samples=NUM_NERF_SAMPLES,
            power_lambda=POWER_LAMBDA,
            power_scaling=POWER_SCALING,
            sky_distance=SKY,
            proposal_field_1=ref.RefPropConfig(grid=prop_grid()),
            proposal_field_2=ref.RefPropConfig(grid=prop_grid()),
        ),
        loss=ref.ref_neurad.LossSettings(vgg_mult=0.0),
        appearance_dim=APP_DIM,
        use_temporal_appearance=True,
        temporal_appearance_freq=1.0,
        rgb_upsample_factor=UPSAMPLE,
        rgb_hidden_dim=RGB_HIDDEN,
    )
    aabb = ref.torch.tensor([[-AABB, -AABB, -AABB], [AABB, AABB, AABB]], dtype=torch.float32)
    model = ref.ref_neurad.NeuRADModel(
        config=config,
        scene_box=ref.SceneBox(aabb=aabb),
        num_train_data=4,
        metadata={
            "trajectories": [],
            "duration": DURATION,
            "sensor_idx_to_name": {0: "camera", 1: "lidar"},
        },
    )
    model.eval()
    # REFERENCE BUG (documented in PARITY.md): `models/neurad.py:248` builds
    # density_fns with late-binding lambdas, so BOTH proposal rounds query the
    # LAST proposal field and proposal_fields.0 never receives gradients. Our
    # framework binds each round to its own field (the intended architecture,
    # cf. upstream nerfacto's correctly-bound density_fns); rebind here so the
    # oracle compares intended semantics.
    import functools

    model.density_fns = [
        functools.partial(lambda f, x: f.get_density(x)[0], f) for f in model.proposal_fields
    ]
    return model


def _our_model():
    from neurad_tpu.fields.neurad_encoding import ActorSettings, StaticSettings
    from neurad_tpu.model_components.dynamic_actors import empty_actor_data
    from neurad_tpu.models.neurad import LossSettings, NeuRADModel, SamplingSettings

    return NeuRADModel(
        actor_data=empty_actor_data(),
        static_scale=AABB,
        num_sensors=N_SENSORS,
        duration=DURATION,
        num_train_images=4,
        loss=LossSettings(vgg_mult=0.0),
        sampling=SamplingSettings(
            num_proposal_samples=NUM_PROP_SAMPLES,
            num_nerf_samples=NUM_NERF_SAMPLES,
            power_lambda=POWER_LAMBDA,
            power_scaling=POWER_SCALING,
            sky_distance=SKY,
        ),
        field_static=StaticSettings(
            hashgrid_dim=F_STATIC, num_levels=L_STATIC, base_res=BASE_RES, max_res=MAX_RES,
            log2_hashmap_size=HASH_LOG2, cell_packed=False, parity=True,
        ),
        field_actor=ActorSettings(flip_prob=0.0, cell_packed=False, parity=True),
        proposal_mode="hashgrid",
        proposal_static=tuple(
            StaticSettings(
                hashgrid_dim=1, num_levels=L_PROP, base_res=BASE_RES, max_res=MAX_RES,
                log2_hashmap_size=PROP_LOG2, cell_packed=False, parity=True,
            )
            for _ in range(2)
        ),
        proposal_actor=ActorSettings(
            flip_prob=0.0, cell_packed=False, parity=True, hashgrid_dim=1
        ),
        compute_fp32=True,
        appearance_dim=APP_DIM,
        use_temporal_appearance=True,
        temporal_appearance_freq=1.0,
        rgb_upsample_factor=UPSAMPLE,
        rgb_hidden_dim=RGB_HIDDEN,
        rgb_decoder_norm="batch",
        camera_opt_mode="off",
        optimize_trajectories=False,
        actor_compaction=0,
    )


def _ray_inputs(rng):
    """Deterministic mixed camera+lidar ray bundle, shared by both sides."""
    origins = rng.uniform(-2, 2, size=(R, 3)).astype(np.float32)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pixel_area = np.full((R, 1), 1e-4, np.float32)
    times = rng.uniform(0.0, DURATION, size=(R, 1)).astype(np.float32)
    cam_idx = np.zeros((R, 1), np.int64)
    is_lidar = np.zeros((R, 1), bool)
    is_lidar[N_CAM:] = True
    sensor_idxs = np.where(is_lidar, 1, 0).astype(np.int64)
    directions_norm = rng.uniform(5.0, 25.0, size=(R, 1)).astype(np.float32)
    did_return = np.ones((R, 1), bool)
    did_return[N_CAM + 2 :: 5] = False  # a few non-returning lidar rays
    return dict(
        origins=origins, dirs=dirs, pixel_area=pixel_area, times=times, cam_idx=cam_idx,
        is_lidar=is_lidar, sensor_idxs=sensor_idxs, directions_norm=directions_norm,
        did_return=did_return,
    )


def _ref_bundle(ref, inp):
    torch = ref.torch
    from nerfstudio.cameras.rays import RayBundle

    return RayBundle(
        origins=torch.from_numpy(inp["origins"]),
        directions=torch.from_numpy(inp["dirs"]),
        pixel_area=torch.from_numpy(inp["pixel_area"].copy()),
        camera_indices=torch.from_numpy(inp["cam_idx"]),
        times=torch.from_numpy(inp["times"]),
        metadata={
            "is_lidar": torch.from_numpy(inp["is_lidar"]),
            "sensor_idxs": torch.from_numpy(inp["sensor_idxs"]),
            "directions_norm": torch.from_numpy(inp["directions_norm"]),
            "did_return": torch.from_numpy(inp["did_return"]),
        },
    )


def _our_bundle(inp):
    import jax.numpy as jnp

    from neurad_tpu.core.structs import RayBundle

    return RayBundle(
        origins=jnp.asarray(inp["origins"]),
        directions=jnp.asarray(inp["dirs"]),
        pixel_area=jnp.asarray(inp["pixel_area"]),
        camera_indices=jnp.asarray(inp["cam_idx"].astype(np.int32)),
        times=jnp.asarray(inp["times"]),
        metadata={
            "is_lidar": jnp.asarray(inp["is_lidar"]),
            "sensor_idxs": jnp.asarray(inp["sensor_idxs"].astype(np.int32)),
            "directions_norm": jnp.asarray(inp["directions_norm"]),
            "did_return": jnp.asarray(inp["did_return"]),
        },
    )


# ---------------------------------------------------------------------------
# weight transplant
# ---------------------------------------------------------------------------


def _copy_hash_table(torch_table, num_levels, log2):
    import jax.numpy as jnp

    T = 2**log2
    t = torch_table.detach().numpy()
    return tuple(jnp.asarray(t[i * T : (i + 1) * T]).reshape(-1) for i in range(num_levels))


def _copy_mlp(torch_mlp, n_layers):
    import jax.numpy as jnp

    dst = {}
    for i, layer in enumerate(torch_mlp.layers):
        key = "output" if i == n_layers - 1 else f"hidden_{i}"
        dst[key] = {
            "kernel": jnp.asarray(layer.weight.detach().numpy().T),
            "bias": jnp.asarray(layer.bias.detach().numpy()),
        }
    return dst


def _copy_conv(conv):
    import jax.numpy as jnp

    # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    d = {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    if conv.bias is not None:
        d["bias"] = jnp.asarray(conv.bias.detach().numpy())
    return d


def _copy_conv_transpose(conv):
    import jax.numpy as jnp

    # torch ConvTranspose2d weight [in, out, kh, kw] -> flax ConvTranspose
    # kernel [kh, kw, in, out] with a SPATIAL FLIP: lax.conv_transpose
    # (transpose_kernel=False) mirrors the kernel relative to torch's
    # gradient-of-conv convention (verified empirically: flipped mapping is
    # exact to 0 ulp at stride == kernel).
    k = conv.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    return {
        "kernel": jnp.asarray(k),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }


def _copy_bn(bn):
    import jax.numpy as jnp

    params = {"scale": jnp.asarray(bn.weight.detach().numpy()), "bias": jnp.asarray(bn.bias.detach().numpy())}
    stats = {"mean": jnp.asarray(bn.running_mean.numpy()), "var": jnp.asarray(bn.running_var.numpy())}
    return params, stats


def _transplant(ref_model, variables):
    """Copy every reference parameter into our flax variables pytree."""
    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))

    # --- field ---
    fld = dict(params["field"])
    hg = dict(fld["hashgrid"])
    hg["static_hash_table"] = _copy_hash_table(
        ref_model.field.hashgrid.static_grid.hash_table, L_STATIC, HASH_LOG2
    )
    fld["hashgrid"] = hg
    fld["mlp_geo"] = _copy_mlp(ref_model.field.mlp_geo, 2)
    fld["mlp_feature"] = _copy_mlp(ref_model.field.mlp_feature, 3)
    fld["sdf_to_alpha"] = {
        "beta": __import__("jax.numpy", fromlist=["asarray"]).asarray(
            ref_model.field.sdf_to_density.beta.detach().numpy()
        )
    }
    params["field"] = fld

    # --- proposal fields ---
    import jax.numpy as jnp

    for i, rp in enumerate(ref_model.proposal_fields):
        dst = dict(params[f"proposal_field_{i}"])
        phg = dict(dst["hashgrid"])
        phg["static_hash_table"] = _copy_hash_table(
            rp.hashgrid.static_grid.hash_table, L_PROP, PROP_LOG2
        )
        dst["hashgrid"] = phg
        dst["density_decoder"] = {
            "kernel": jnp.asarray(rp.density_decoder.weight.detach().numpy().T)
        }
        params[f"proposal_field_{i}"] = dst

    # --- appearance embedding ---
    params["appearance_embedding"] = {
        "embedding": jnp.asarray(ref_model.appearance_embedding.weight.detach().numpy())
    }

    # --- lidar decoder ---
    params["lidar_decoder"] = _copy_mlp(ref_model.lidar_decoder, 3)

    # --- rgb decoder CNN ---
    seq = ref_model.rgb_decoder
    dec = dict(params["rgb_decoder"])
    dec_stats = dict(batch_stats.get("rgb_decoder", {}))
    dec["Conv_0"] = _copy_conv(seq[0])
    for bi, si in enumerate((2, 3, 5, 6)):
        blk = {}
        blk_stats = {}
        main = seq[si].main_branch
        blk["Conv_0"] = _copy_conv(main[0])
        blk["BatchNorm_0"], blk_stats["BatchNorm_0"] = _copy_bn(main[1])
        blk["Conv_1"] = _copy_conv(main[3])
        blk["BatchNorm_1"], blk_stats["BatchNorm_1"] = _copy_bn(main[4])
        dec[f"BasicBlock_{bi}"] = blk
        dec_stats[f"BasicBlock_{bi}"] = blk_stats
    dec["ConvTranspose_0"] = _copy_conv_transpose(seq[4])
    dec["Conv_1"] = _copy_conv(seq[7])
    params["rgb_decoder"] = dec
    batch_stats["rgb_decoder"] = dec_stats

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


import jax  # noqa: E402  (after conftest pins the CPU platform)


@pytest.fixture(scope="module")
def setup(ref):
    import jax.numpy as jnp

    from neurad_tpu.models.neurad import NeuRADModel

    rng = np.random.default_rng(17)
    inp = _ray_inputs(rng)
    ref_model = _ref_model(ref)
    our_model = _our_model()
    bundle = _our_bundle(inp)
    variables = our_model.init(
        jax.random.PRNGKey(0), bundle, (PATCH, PATCH), N_CAM, False, None,
        method=NeuRADModel.get_outputs,
    )
    variables = _transplant(ref_model, variables)
    return types.SimpleNamespace(
        inp=inp, ref_model=ref_model, our_model=our_model, bundle=bundle, variables=variables
    )


def test_full_model_eval_outputs_match(ref, setup):
    torch = ref.torch
    from neurad_tpu.models.neurad import NeuRADModel

    with torch.no_grad():
        ref_out = setup.ref_model.get_outputs(_ref_bundle(ref, setup.inp), (PATCH, PATCH))

    our_out = setup.our_model.apply(
        setup.variables, setup.bundle, (PATCH, PATCH), N_CAM, False, None,
        method=NeuRADModel.get_outputs,
    )

    rtol, atol = 1e-4, 2e-5
    np.testing.assert_allclose(
        np.asarray(our_out["depth"]), ref_out["depth"].numpy(), rtol=rtol, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(our_out["accumulation"]), ref_out["accumulation"].numpy(), rtol=rtol, atol=atol
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(our_out[f"prop_depth_{i}"]), ref_out[f"prop_depth_{i}"].numpy(),
            rtol=rtol, atol=1e-3, err_msg=f"prop_depth_{i}",
        )
    # decoded modalities
    assert np.abs(ref_out["rgb"].numpy()).max() > 1e-3, "degenerate rgb oracle"
    np.testing.assert_allclose(
        np.asarray(our_out["rgb"]), ref_out["rgb"].numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(our_out["intensity"]), ref_out["intensity"].numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(our_out["ray_drop_logits"]), ref_out["ray_drop_logits"].numpy(), rtol=1e-3, atol=1e-4
    )


def test_full_model_param_grads_match(ref, setup):
    """Gradients of a fixed projection of (rgb, intensity, logits, depth,
    prop_depths) w.r.t. EVERY transplanted parameter agree."""
    torch = ref.torch
    import jax.numpy as jnp

    from neurad_tpu.models.neurad import NeuRADModel

    rng = np.random.default_rng(23)
    w_rgb = rng.normal(size=(N_PATCHES, PATCH * UPSAMPLE, PATCH * UPSAMPLE, 3)).astype(np.float32)
    w_int = rng.normal(size=(N_LIDAR, 1)).astype(np.float32)
    w_drop = rng.normal(size=(N_LIDAR, 1)).astype(np.float32)
    w_depth = rng.normal(size=(R, 1)).astype(np.float32)
    w_prop = [rng.normal(size=(R, 1)).astype(np.float32) for _ in range(2)]

    def scalarize(out, lib):
        s = (out["rgb"] * lib.asarray(w_rgb)).sum()
        s = s + (out["intensity"] * lib.asarray(w_int)).sum()
        s = s + (out["ray_drop_logits"] * lib.asarray(w_drop)).sum()
        s = s + (out["depth"] * lib.asarray(w_depth)).sum()
        for i in range(2):
            s = s + (out[f"prop_depth_{i}"] * lib.asarray(w_prop[i])).sum()
        return s

    # ---- reference backward (eval-mode forward keeps everything deterministic) ----
    class TorchLib:
        asarray = staticmethod(torch.from_numpy)

    ref_model = setup.ref_model
    ref_model.zero_grad()
    ref_out = ref_model.get_outputs(_ref_bundle(ref, setup.inp), (PATCH, PATCH))
    scalarize(ref_out, TorchLib).backward()

    # ---- ours ----
    def loss_fn(variables):
        out = setup.our_model.apply(
            variables, setup.bundle, (PATCH, PATCH), N_CAM, False, None,
            method=NeuRADModel.get_outputs,
        )
        return scalarize(out, jnp)

    grads = jax.grad(loss_fn)(setup.variables)["params"]

    def close(ours, theirs, name, atol=3e-5, rtol=2e-3):
        theirs = theirs.numpy() if hasattr(theirs, "numpy") else theirs
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=rtol, atol=atol, err_msg=name)

    # field
    T = 2**HASH_LOG2
    g_table = np.concatenate(
        [np.asarray(x).reshape(-1, F_STATIC) for x in grads["field"]["hashgrid"]["static_hash_table"]]
    )
    assert np.abs(g_table).max() > 1e-6, "vacuous table grad"
    close(g_table, ref_model.field.hashgrid.static_grid.hash_table.grad, "field.table")
    for name, mlp, n in (("mlp_geo", ref_model.field.mlp_geo, 2), ("mlp_feature", ref_model.field.mlp_feature, 3)):
        for i, layer in enumerate(mlp.layers):
            key = "output" if i == n - 1 else f"hidden_{i}"
            close(grads["field"][name][key]["kernel"], layer.weight.grad.T, f"field.{name}.{key}.k")
            close(grads["field"][name][key]["bias"], layer.bias.grad, f"field.{name}.{key}.b")
    close(grads["field"]["sdf_to_alpha"]["beta"], ref_model.field.sdf_to_density.beta.grad, "beta")

    # proposal fields (grads flow through prop_depth projections)
    for i, rp in enumerate(ref_model.proposal_fields):
        gp = np.concatenate(
            [np.asarray(x).reshape(-1, 1) for x in grads[f"proposal_field_{i}"]["hashgrid"]["static_hash_table"]]
        )
        assert np.abs(gp).max() > 1e-8, f"vacuous proposal {i} table grad"
        close(gp, rp.hashgrid.static_grid.hash_table.grad, f"prop{i}.table", atol=5e-5)
        close(
            grads[f"proposal_field_{i}"]["density_decoder"]["kernel"],
            rp.density_decoder.weight.grad.T,
            f"prop{i}.decoder",
            atol=5e-4,
        )

    # appearance + lidar decoder
    close(grads["appearance_embedding"]["embedding"], ref_model.appearance_embedding.weight.grad, "appearance")
    for i, layer in enumerate(ref_model.lidar_decoder.layers):
        key = "output" if i == 2 else f"hidden_{i}"
        close(grads["lidar_decoder"][key]["kernel"], layer.weight.grad.T, f"lidar.{key}.k")
        close(grads["lidar_decoder"][key]["bias"], layer.bias.grad, f"lidar.{key}.b")

    # rgb decoder CNN (convs + BN affine)
    seq = ref_model.rgb_decoder
    dec = grads["rgb_decoder"]
    close(dec["Conv_0"]["kernel"], seq[0].weight.grad.permute(2, 3, 1, 0), "dec.conv0.k", atol=1e-4)
    close(dec["Conv_0"]["bias"], seq[0].bias.grad, "dec.conv0.b", atol=1e-4)
    for bi, si in enumerate((2, 3, 5, 6)):
        main = seq[si].main_branch
        blk = dec[f"BasicBlock_{bi}"]
        close(blk["Conv_0"]["kernel"], main[0].weight.grad.permute(2, 3, 1, 0), f"dec.b{bi}.c0.k", atol=1e-4)
        close(blk["BatchNorm_0"]["scale"], main[1].weight.grad, f"dec.b{bi}.bn0.s", atol=1e-4)
        close(blk["BatchNorm_0"]["bias"], main[1].bias.grad, f"dec.b{bi}.bn0.b", atol=1e-4)
        close(blk["Conv_1"]["kernel"], main[3].weight.grad.permute(2, 3, 1, 0), f"dec.b{bi}.c1.k", atol=1e-4)
        close(blk["BatchNorm_1"]["scale"], main[4].weight.grad, f"dec.b{bi}.bn1.s", atol=1e-4)
        close(blk["BatchNorm_1"]["bias"], main[4].bias.grad, f"dec.b{bi}.bn1.b", atol=1e-4)
    close(
        dec["ConvTranspose_0"]["kernel"],
        seq[4].weight.grad.permute(2, 3, 0, 1).numpy()[::-1, ::-1].copy(),  # same flip as transplant
        "dec.convT.k",
        atol=1e-4,
    )
    close(dec["ConvTranspose_0"]["bias"], seq[4].bias.grad, "dec.convT.b", atol=1e-4)
    close(dec["Conv_1"]["kernel"], seq[7].weight.grad.permute(2, 3, 1, 0), "dec.conv1.k", atol=1e-4)
    close(dec["Conv_1"]["bias"], seq[7].bias.grad, "dec.conv1.b", atol=1e-4)


def test_full_model_train_loss_dict_matches(ref, setup):
    """Training forward + the full loss dict agree (jitter disabled on both
    sides: ref samplers forced to eval so PDF/initial sampling is the
    deterministic midpoint rule; ours runs rng=None)."""
    torch = ref.torch
    import jax.numpy as jnp

    from neurad_tpu.models.neurad import NeuRADModel

    rng = np.random.default_rng(31)
    gt_img = rng.uniform(0, 1, size=(N_PATCHES, PATCH * UPSAMPLE, PATCH * UPSAMPLE, 3)).astype(np.float32)
    gt_intensity = rng.uniform(0, 1, size=(N_LIDAR, 1)).astype(np.float32)

    ref_model = setup.ref_model
    ref_model.train()
    ref_model.sampler.eval()  # kill PDF/initial stratified jitter; keep train losses
    try:
        ref_bundle = _ref_bundle(ref, setup.inp)
        ref_out = ref_model.get_outputs(ref_bundle, (PATCH, PATCH))

        lidar_pts = np.concatenate(
            [np.zeros((N_LIDAR, 3), np.float32), gt_intensity, np.zeros((N_LIDAR, 1), np.float32)],
            axis=1,
        )
        batch_t = {
            "image": torch.from_numpy(gt_img),
            "lidar": torch.from_numpy(lidar_pts),
            "is_lidar": torch.from_numpy(setup.inp["is_lidar"]),
            "did_return": torch.from_numpy(setup.inp["did_return"]),
            "distance": torch.from_numpy(setup.inp["directions_norm"][N_CAM:]),
        }
        with torch.no_grad():
            ref_metrics = ref_model.get_metrics_dict(ref_out, batch_t)
            ref_losses = ref_model.get_loss_dict(ref_out, batch_t, ref_metrics)
    finally:
        ref_model.eval()

    # ---- ours (train=True, rng=None -> deterministic) ----
    out, _ = setup.our_model.apply(
        setup.variables, setup.bundle, (PATCH, PATCH), N_CAM, True, None,
        method=NeuRADModel.get_outputs, mutable=["batch_stats"],
    )
    batch_j = {
        "image": jnp.asarray(gt_img),
        "distance": jnp.asarray(setup.inp["directions_norm"][N_CAM:]),
        "did_return": jnp.asarray(setup.inp["did_return"][N_CAM:]),
        "intensity": jnp.asarray(gt_intensity),
    }
    _total, our_metrics = setup.our_model.apply(
        setup.variables, out, batch_j, N_CAM, method=NeuRADModel.compute_losses
    )

    pairs = [
        ("rgb_loss", "rgb_loss"),
        ("depth_loss", "depth_loss"),
        ("intensity_loss", "intensity_loss"),
        ("ray_drop_loss", "ray_drop_loss"),
        ("carving_loss", "carving_loss"),
        ("depth_loss_0", "depth_loss_0"),
        ("depth_loss_1", "depth_loss_1"),
        ("carving_loss_0", "carving_loss_0"),
        ("carving_loss_1", "carving_loss_1"),
        ("interlevel_loss", "interlevel_loss"),
        ("distortion_loss", "distortion_loss"),
    ]
    for ours_key, ref_key in pairs:
        want = float(ref_losses[ref_key])
        got = float(our_metrics[ours_key])
        # interlevel divides by (wp + 1e-5): fp-level sample-position diffs
        # (~2e-5 after two PDF rounds) amplify to ~0.3% there
        rel = 1e-2 if ours_key == "interlevel_loss" else 2e-3
        assert got == pytest.approx(want, rel=rel, abs=1e-6), (ours_key, got, want)
    # the distortion METRIC too (unweighted)
    assert float(our_metrics["distortion"]) == pytest.approx(
        float(ref_metrics["distortion"]), rel=2e-3, abs=1e-7
    )
