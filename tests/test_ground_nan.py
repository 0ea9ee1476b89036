"""NaN robustness of the ground-plane depth (losses.py::process_ground).

A ray parallel to the fitted plane makes the ground-depth denominator 0;
with w3 + gp_tol == 0 that is 0/0 = NaN, which the range check cannot catch
(NaN compares false) and which leaks into the *gradient* through where()
unless the denominator itself is made safe (double-where). Caught live by
the round-4 TPU bf16 convergence arm: two NaN d_ground val losses
(BENCH.md). The reference's masked in-place assign (Trainer.py:458-459)
has the same latent hole; we diverge only on degenerate fits where the
reference NaNs out.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dynamo_depth_tpu.config import DynamoConfig
from dynamo_depth_tpu.training import losses as L


def test_process_ground_nan_safe_value_and_grad(monkeypatch, rng):
    B, h, w = 1, 8, 12
    cfg = DynamoConfig(dataset="kitti", height=h, width=w, scales=[0],
                       no_train_vis=True)

    # Plane chosen so denom = vy - vx*w1 - vz*w2 = y - 1 == 0 on pixel row 1
    # (identity inv_K -> rays are the raw [x, y, 1] grid), and
    # w3 + gp_tol == 0 -> 0/0 in the unguarded form.
    def fake_fit(pts, rng, **kw):
        plane_param = jnp.asarray([[0.0, 1.0, -cfg.gp_tol]], jnp.float32)
        return jnp.zeros(pts.shape[:-1], jnp.float32), plane_param

    monkeypatch.setattr(L, "ground_plane_fit", fake_fit)

    inv_K = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    inputs = {("inv_K", 0): inv_K}

    def loss_of(disp):
        outputs = {("disp", 0, 0): disp}
        _, disp_diff, _ = L.process_ground(
            cfg, inputs, outputs, 0, jax.random.PRNGKey(0)
        )
        return jnp.mean(jnp.minimum(disp_diff, 0.0))

    disp = jnp.asarray(rng.rand(B, h, w, 1).astype(np.float32)) * 0.3
    val, grad = jax.value_and_grad(loss_of)(disp)
    assert np.isfinite(float(val)), val
    assert np.isfinite(np.asarray(grad)).all()
