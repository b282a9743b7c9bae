"""Torch-oracle validation of the exact perceptual stack (LPIPS + FID inception).

The true pretrained weights are unavailable in this image (no egress, no
torchvision), so these tests validate what CAN go wrong offline: the graph
wiring, the conversion script's key mapping / layout transposes, batchnorm
folding, and every pooling/padding/normalization semantic — by building the
SAME architecture in raw torch (the oracle), randomizing its weights, running
the conversion path, and asserting the JAX forward matches torch to fp32
tolerance. With a verified graph + verified converter, a user-supplied
pretrained .npz is correct by construction (shapes are validated at both
convert and load time).

Reference metric stack being reproduced: torchmetrics LPIPS (lpips package,
VGG16 + lin heads) at `/root/reference/nerfstudio/models/neurad.py:265-267`
and torchmetrics FID (pytorch-fid InceptionV3, 2048-d pool3) at
`/root/reference/nerfstudio/pipelines/ad_pipeline.py:26`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _seeded(seed):
    g = torch.Generator().manual_seed(seed)
    return lambda *shape: torch.randn(*shape, generator=g) * 0.1


# ---------------------------------------------------------------------------
# LPIPS (VGG16 + lin heads)
# ---------------------------------------------------------------------------


def _random_lpips_state(seed=0):
    from neurad_tpu.model_components.lpips_exact import _HEAD_CH, _VGG16_CONVS

    r = _seeded(seed)
    state = {}
    for fi, in_ch, out_ch in _VGG16_CONVS:
        state[f"features.{fi}.weight"] = r(out_ch, in_ch, 3, 3)
        state[f"features.{fi}.bias"] = r(out_ch)
    for i, c in enumerate(_HEAD_CH):
        state[f"lin{i}.model.1.weight"] = torch.abs(r(1, c, 1, 1))  # non-negative heads
    return state


def _torch_lpips(state, pred, target):
    """Oracle: the LPIPS formula in raw torch (NCHW), following the paper."""
    from neurad_tpu.model_components.lpips_exact import _POOL_AT, _TAP_AFTER, _VGG16_CONVS

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    x = torch.cat([pred, target], 0) * 2.0 - 1.0
    x = (x - shift) / scale
    conv_at = {fi: i for i, (fi, _, _) in enumerate(_VGG16_CONVS)}
    taps = []
    for fi in range(30):
        if fi in _POOL_AT:
            x = F.max_pool2d(x, 2, 2)
        elif fi in conv_at:
            ci = conv_at[fi]
            x = F.conv2d(x, state[f"features.{fi}.weight"], state[f"features.{fi}.bias"], padding=1)
            del ci
        else:
            x = F.relu(x)
            if fi in _TAP_AFTER:
                taps.append(x)
    n = pred.shape[0]
    total = 0.0
    for i, f in enumerate(taps):
        f = f / (torch.sqrt(torch.sum(f**2, dim=1, keepdim=True)) + 1e-10)
        d2 = (f[:n] - f[n:]) ** 2
        w = state[f"lin{i}.model.1.weight"]
        val = F.conv2d(d2, w)  # 1x1 conv head
        total = total + val.mean(dim=(1, 2, 3))
    return total.mean()


def test_lpips_exact_matches_torch_oracle(tmp_path):
    import jax.numpy as jnp

    from neurad_tpu.model_components.lpips_exact import load_lpips_params, lpips_exact
    from neurad_tpu.scripts.convert_perceptual_weights import convert_lpips

    state = _random_lpips_state()
    rng = np.random.default_rng(1)
    pred = rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32)

    want = float(
        _torch_lpips(
            state,
            torch.from_numpy(pred).permute(0, 3, 1, 2),
            torch.from_numpy(target).permute(0, 3, 1, 2),
        )
    )

    npz = tmp_path / "lpips.npz"
    np.savez(npz, **convert_lpips({k: v.numpy() for k, v in state.items()}))
    params = load_lpips_params(str(npz))
    got = float(lpips_exact(params, jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_converter_accepts_lpips_package_layout(tmp_path):
    """The lpips package nests the backbone as net.slice{1..5}.<orig_idx>."""
    from neurad_tpu.model_components.lpips_exact import _VGG16_CONVS, load_lpips_params
    from neurad_tpu.scripts.convert_perceptual_weights import convert_lpips

    state = {k: v.numpy() for k, v in _random_lpips_state(3).items()}
    slices = {3: 1, 8: 2, 15: 3, 22: 4, 29: 5}  # tap idx -> slice number
    nested = {}
    bounds = sorted(slices)
    for fi, _, _ in _VGG16_CONVS:
        sl = next(s for b, s in zip(bounds, (1, 2, 3, 4, 5)) if fi <= b)
        nested[f"net.slice{sl}.{fi}.weight"] = state[f"features.{fi}.weight"]
        nested[f"net.slice{sl}.{fi}.bias"] = state[f"features.{fi}.bias"]
    for i in range(5):
        nested[f"lin{i}.model.1.weight"] = state[f"lin{i}.model.1.weight"]

    out_flat = convert_lpips(state)
    out_nested = convert_lpips(nested)
    assert set(out_flat) == set(out_nested)
    for k in out_flat:
        np.testing.assert_array_equal(out_flat[k], out_nested[k])
    np.savez(tmp_path / "l.npz", **out_nested)
    load_lpips_params(str(tmp_path / "l.npz"))  # shape validation passes


def test_lpips_converter_rejects_bad_shapes():
    from neurad_tpu.scripts.convert_perceptual_weights import convert_lpips

    state = {k: v.numpy() for k, v in _random_lpips_state().items()}
    state["features.0.weight"] = state["features.0.weight"][:32]  # wrong out_ch
    with pytest.raises(ValueError, match="features.0"):
        convert_lpips(state)


# ---------------------------------------------------------------------------
# FID InceptionV3
# ---------------------------------------------------------------------------


def _random_inception_state(seed=0):
    from neurad_tpu.model_components.inception import conv_specs

    r = _seeded(seed)
    state = {}
    for name, in_ch, out_ch, k, _s, _p in conv_specs():
        state[f"{name}.conv.weight"] = r(out_ch, in_ch, k[0], k[1])
        state[f"{name}.bn.weight"] = 1.0 + 0.1 * r(out_ch)
        state[f"{name}.bn.bias"] = 0.1 * r(out_ch)
        state[f"{name}.bn.running_mean"] = 0.1 * r(out_ch)
        state[f"{name}.bn.running_var"] = torch.abs(1.0 + 0.1 * r(out_ch))
    return state


class _TorchFIDInception:
    """Oracle: the FID InceptionV3 forward in raw torch (NCHW), eval-mode BN."""

    def __init__(self, state):
        self.s = state

    def conv(self, name, x, stride=1, pad=0):
        s = self.s
        x = F.conv2d(x, s[f"{name}.conv.weight"], None, stride=stride, padding=pad)
        x = F.batch_norm(
            x,
            s[f"{name}.bn.running_mean"],
            s[f"{name}.bn.running_var"],
            s[f"{name}.bn.weight"],
            s[f"{name}.bn.bias"],
            training=False,
            eps=1e-3,
        )
        return F.relu(x)

    def block_a(self, p, x):
        b1 = self.conv(f"{p}.branch1x1", x)
        b5 = self.conv(f"{p}.branch5x5_2", self.conv(f"{p}.branch5x5_1", x), pad=2)
        b3 = self.conv(f"{p}.branch3x3dbl_1", x)
        b3 = self.conv(f"{p}.branch3x3dbl_2", b3, pad=1)
        b3 = self.conv(f"{p}.branch3x3dbl_3", b3, pad=1)
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        bp = self.conv(f"{p}.branch_pool", bp)
        return torch.cat([b1, b5, b3, bp], 1)

    def block_b(self, p, x):
        b3 = self.conv(f"{p}.branch3x3", x, stride=2)
        bd = self.conv(f"{p}.branch3x3dbl_1", x)
        bd = self.conv(f"{p}.branch3x3dbl_2", bd, pad=1)
        bd = self.conv(f"{p}.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(self, p, x):
        b1 = self.conv(f"{p}.branch1x1", x)
        b7 = self.conv(f"{p}.branch7x7_1", x)
        b7 = self.conv(f"{p}.branch7x7_2", b7, pad=(0, 3))
        b7 = self.conv(f"{p}.branch7x7_3", b7, pad=(3, 0))
        bd = self.conv(f"{p}.branch7x7dbl_1", x)
        bd = self.conv(f"{p}.branch7x7dbl_2", bd, pad=(3, 0))
        bd = self.conv(f"{p}.branch7x7dbl_3", bd, pad=(0, 3))
        bd = self.conv(f"{p}.branch7x7dbl_4", bd, pad=(3, 0))
        bd = self.conv(f"{p}.branch7x7dbl_5", bd, pad=(0, 3))
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        bp = self.conv(f"{p}.branch_pool", bp)
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(self, p, x):
        b3 = self.conv(f"{p}.branch3x3_1", x)
        b3 = self.conv(f"{p}.branch3x3_2", b3, stride=2)
        b7 = self.conv(f"{p}.branch7x7x3_1", x)
        b7 = self.conv(f"{p}.branch7x7x3_2", b7, pad=(0, 3))
        b7 = self.conv(f"{p}.branch7x7x3_3", b7, pad=(3, 0))
        b7 = self.conv(f"{p}.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(self, p, x, pool_is_max):
        b1 = self.conv(f"{p}.branch1x1", x)
        b3 = self.conv(f"{p}.branch3x3_1", x)
        b3 = torch.cat(
            [self.conv(f"{p}.branch3x3_2a", b3, pad=(0, 1)), self.conv(f"{p}.branch3x3_2b", b3, pad=(1, 0))], 1
        )
        bd = self.conv(f"{p}.branch3x3dbl_1", x)
        bd = self.conv(f"{p}.branch3x3dbl_2", bd, pad=1)
        bd = torch.cat(
            [self.conv(f"{p}.branch3x3dbl_3a", bd, pad=(0, 1)), self.conv(f"{p}.branch3x3dbl_3b", bd, pad=(1, 0))], 1
        )
        if pool_is_max:
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        bp = self.conv(f"{p}.branch_pool", bp)
        return torch.cat([b1, b3, bd, bp], 1)

    def pool3(self, images):
        """images NCHW in [0,1], already 299x299."""
        x = images * 2.0 - 1.0
        x = self.conv("Conv2d_1a_3x3", x, stride=2)
        x = self.conv("Conv2d_2a_3x3", x)
        x = self.conv("Conv2d_2b_3x3", x, pad=1)
        x = F.max_pool2d(x, 3, 2)
        x = self.conv("Conv2d_3b_1x1", x)
        x = self.conv("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = self.block_a("Mixed_5b", x)
        x = self.block_a("Mixed_5c", x)
        x = self.block_a("Mixed_5d", x)
        x = self.block_b("Mixed_6a", x)
        x = self.block_c("Mixed_6b", x)
        x = self.block_c("Mixed_6c", x)
        x = self.block_c("Mixed_6d", x)
        x = self.block_d("Mixed_7a", x)
        x = self.block_e("Mixed_7b", x, pool_is_max=False)
        x = self.block_e("Mixed_7c", x, pool_is_max=True)
        return x.mean(dim=(2, 3))


def test_inception_pool3_matches_torch_oracle(tmp_path):
    import jax.numpy as jnp

    from neurad_tpu.model_components.inception import inception_pool3, load_inception_params
    from neurad_tpu.scripts.convert_perceptual_weights import convert_inception

    state = _random_inception_state()
    rng = np.random.default_rng(7)
    imgs = rng.uniform(0, 1, (2, 299, 299, 3)).astype(np.float32)

    with torch.no_grad():
        want = _TorchFIDInception(state).pool3(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()

    npz = tmp_path / "inception.npz"
    np.savez(npz, **convert_inception({k: v.numpy() for k, v in state.items()}))
    params = load_inception_params(str(npz))
    got = np.asarray(inception_pool3(params, jnp.asarray(imgs), resize=False))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("hw", [(96, 128), (600, 800)])
def test_inception_resize_matches_torch_interpolate(hw):
    """jax.image.resize bilinear (antialias=False) == torch F.interpolate.

    The downsampling case (600x800 -> 299, the normal AD-dataset eval shape)
    is the one where jax's default antialias=True diverges from torch by up to
    ~0.56 in [0,1] — the FID path must resize with antialias=False.
    """
    import jax.numpy as jnp

    import jax

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (1, *hw, 3)).astype(np.float32)
    want = (
        F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=(299, 299), mode="bilinear")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(
        jax.image.resize(jnp.asarray(img), (1, 299, 299, 3), method="bilinear", antialias=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-6)


def test_inception_converter_rejects_bad_shapes():
    from neurad_tpu.scripts.convert_perceptual_weights import convert_inception

    state = {k: v.numpy() for k, v in _random_inception_state().items()}
    state["Mixed_5b.branch1x1.conv.weight"] = state["Mixed_5b.branch1x1.conv.weight"][:, :64]
    with pytest.raises(ValueError, match="Mixed_5b.branch1x1"):
        convert_inception(state)


# ---------------------------------------------------------------------------
# eval_metrics wiring: env-var gating + loud fallback
# ---------------------------------------------------------------------------


def test_eval_metrics_use_exact_stacks_when_weights_present(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from neurad_tpu.scripts.convert_perceptual_weights import convert_inception, convert_lpips
    from neurad_tpu.utils import eval_metrics as em

    np.savez(tmp_path / "lpips.npz", **convert_lpips({k: v.numpy() for k, v in _random_lpips_state().items()}))
    np.savez(
        tmp_path / "inc.npz", **convert_inception({k: v.numpy() for k, v in _random_inception_state().items()})
    )
    monkeypatch.setenv("NEURAD_TPU_LPIPS_WEIGHTS", str(tmp_path / "lpips.npz"))
    monkeypatch.setenv("NEURAD_TPU_INCEPTION_WEIGHTS", str(tmp_path / "inc.npz"))

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)

    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")  # exact path must NOT warn
        d_ab = float(em.lpips(None, jnp.asarray(a), jnp.asarray(b)))
        d_aa = float(em.lpips(None, jnp.asarray(a), jnp.asarray(a)))
        reals = [rng.uniform(0, 1, (48, 64, 3)).astype(np.float32) for _ in range(4)]
        fakes = [rng.uniform(0, 1, (48, 64, 3)).astype(np.float32) for _ in range(4)]
        f = em.fid(reals, fakes)
    assert d_ab > 0 and d_aa == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(f)


def test_eval_metrics_warn_on_fallback(monkeypatch):
    import jax
    import jax.numpy as jnp

    from neurad_tpu.model_components.perceptual import load_vgg19_params
    from neurad_tpu.utils import eval_metrics as em

    monkeypatch.delenv("NEURAD_TPU_LPIPS_WEIGHTS", raising=False)
    monkeypatch.delenv("NEURAD_TPU_INCEPTION_WEIGHTS", raising=False)
    vgg = load_vgg19_params(jax.random.PRNGKey(0), sample_hw=16)
    a = jnp.zeros((16, 16, 3))
    with pytest.warns(UserWarning, match="RELATIVE-ONLY"):
        em.lpips(vgg, a, a)
    reals = [np.zeros((16, 16, 3), np.float32)] * 2
    with pytest.warns(UserWarning, match="RELATIVE-ONLY"):
        em.fid(reals, reals, vgg_params=vgg)
