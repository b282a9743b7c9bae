"""Camera optimizer tests (`nerfstudio/cameras/camera_optimizers.py` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.cameras.camera_optimizers import CameraOptimizer, CameraVelocityOptimizer
from neurad_tpu.core.structs import RayBundle


def _bundle(n=4):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (n, 3)),
        pixel_area=jnp.ones((n, 1)),
        camera_indices=jnp.arange(n, dtype=jnp.int32)[:, None],
    )


def test_off_mode_identity():
    opt = CameraOptimizer(num_cameras=4, mode="off")
    params = opt.init(jax.random.PRNGKey(0), jnp.arange(4))
    bundle = _bundle()
    out = opt.apply(params, bundle, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out.origins), np.asarray(bundle.origins))
    assert opt.apply(params, method=CameraOptimizer.regularization_loss) == 0.0


def test_so3xr3_zero_init_is_identity():
    opt = CameraOptimizer(num_cameras=4, mode="SO3xR3")
    params = opt.init(jax.random.PRNGKey(0), jnp.arange(4))
    corr = opt.apply(params, jnp.arange(4))
    np.testing.assert_allclose(np.asarray(corr), np.broadcast_to(np.eye(4)[:3], (4, 3, 4)), atol=1e-6)


def test_translation_delta_moves_origins():
    opt = CameraOptimizer(num_cameras=2, mode="SO3xR3")
    params = opt.init(jax.random.PRNGKey(0), jnp.arange(2))
    params = jax.tree.map(lambda x: x, params)
    adj = params["params"]["pose_adjustment"].at[0, 0].set(1.0)  # 1m x shift for cam 0
    params = {"params": {"pose_adjustment": adj}}
    bundle = _bundle(n=2)
    out = opt.apply(params, bundle, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out.origins[0]), [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.origins[1]), [0.0, 0.0, 0.0], atol=1e-6)
    # reg loss is nonzero now
    assert float(opt.apply(params, method=CameraOptimizer.regularization_loss)) > 0


def test_non_trainable_indices_identity():
    opt = CameraOptimizer(num_cameras=2, mode="SO3xR3", non_trainable_camera_indices=(1,))
    params = {"params": {"pose_adjustment": jnp.ones((2, 6))}}
    corr = opt.apply(params, jnp.arange(2))
    np.testing.assert_allclose(np.asarray(corr[1]), np.eye(4)[:3], atol=1e-6)


def test_velocity_optimizer():
    opt = CameraVelocityOptimizer(num_cameras=3, num_unique_cameras=2, enabled=True)
    base = jnp.ones((3, 3))
    params = opt.init(jax.random.PRNGKey(0), base, jnp.arange(3), method=CameraVelocityOptimizer.get_linear_velocity)
    out = opt.apply(params, base, jnp.arange(3), method=CameraVelocityOptimizer.get_linear_velocity)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)  # zero-init deltas
    reg = opt.apply(params, method=CameraVelocityOptimizer.regularization_loss)
    assert float(reg) == 0.0
