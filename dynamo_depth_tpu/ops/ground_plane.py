"""Batched RANSAC ground-plane estimation, fully on-device.

Capability parity with the reference ``GroundPlane`` (``tools.py:76-164``):
sample ``num_points_per_it`` points x ``max_it`` hypotheses from the bottom
``g_prior`` fraction of rows, least-squares plane per hypothesis via normal
equations, pick the best inlier count, return per-pixel vertical distance.

TPU-first differences from the reference:
- hypothesis sampling uses the jax PRNG on device (the reference calls
  ``np.random.choice`` per batch element on host, tools.py:126);
- all hypotheses are solved as one batched 3x3 system, scoring is one
  ``(B*max_it, N) x 3`` contraction — no per-batch python loop;
- outputs are ``stop_gradient``-ed, as the reference detaches them
  (tools.py:101);
- **deliberate fix** (default ``score_mode="per_batch"``): each hypothesis
  is scored against its own batch element's candidate points. The reference
  pairs a batch-major hypothesis list with a batch-*tiled* point list
  (``ws.reshape(-1,3,1)`` vs ``points.repeat(max_it,1,1)``,
  tools.py:130-133), so hypothesis (b, m) is scored against batch element
  (b*max_it + m) % B — mixing images within a batch during inlier counting.
  Pass ``score_mode="reference"`` to reproduce the reference pairing
  bit-faithfully (``--gp_score_mode reference``) if real-data parity
  training ever needs the exact recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# All contractions here pin full-fp32 precision: on TPU the f32 matmul
# default is bf16-ish, and the 5-point normal-equation solve (AtA entries
# O(1e2), regularizer 1e-6) loses the plane outright in bf16 — caught round
# 4 by scripts/grad_compare.py (d_ground differed 81% CPU-vs-TPU on an
# identical step while every other loss term matched to 0.0%, BENCH.md).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _inv3x3(m):
    """Closed-form adjugate inverse of a (..., 3, 3) batch.

    ``jnp.linalg.inv`` lowers to LU custom-calls + triangular solves that
    cost 5.5 ms/step at batch 8 on the v5e for these tiny matrices (profile
    attribution, BENCH.md round 4); the adjugate form is pure elementwise
    math that XLA fuses away. fp32-exact enough for the RANSAC normal
    equations (parity pinned at atol=1e-4 by
    tests/test_reference_parity.py::test_ground_plane_reference_score_mode_full_parity).
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack([
        jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def _plane_AB(points, vertical_axis=1):
    """Split points (..., 3) into design matrix A (..., 3)=[x, z, 1] and target
    b (..., 1)=y for the plane model y = w1*x + w2*z + w3 (tools.py:156-164)."""
    b = points[..., vertical_axis : vertical_axis + 1]
    others = [points[..., i : i + 1] for i in range(3) if i != vertical_axis]
    A = jnp.concatenate(others + [jnp.ones_like(b)], axis=-1)
    return A, b


def ground_plane_fit(
    points,
    rng,
    *,
    num_points_per_it=5,
    max_it=100,
    tol=0.005,
    g_prior=0.4,
    vertical_axis=1,
    score_mode="per_batch",
    sample_idx=None,
):
    """Estimate a ground plane per batch element and point-to-plane distances.

    :param points: ``(B, H, W, 3)`` camera-frame points
    :param rng:    jax PRNG key for hypothesis sampling
    :return: (dist ``(B, H, W, 1)``, plane_param ``(B, 3, 1)``), both
             stop-gradient-ed.
    """
    B, H, W, _ = points.shape
    gh = int(g_prior * H)
    candidates = points[:, H - gh :, :, :].reshape(B, gh * W, 3)  # bottom rows
    N = gh * W
    T = num_points_per_it * max_it

    # (B, T) uniform indices with replacement — same distribution as
    # np.random.choice(N, T, replace=True) at tools.py:126. ``sample_idx``
    # overrides the draw (tests inject the reference's host sampling).
    idx = jax.random.randint(rng, (B, T), 0, N) if sample_idx is None else sample_idx
    samp = jnp.take_along_axis(candidates, idx[..., None], axis=1)  # (B, T, 3)
    samp = samp.reshape(B * max_it, num_points_per_it, 3)

    A, b = _plane_AB(samp, vertical_axis)  # (BM, n, 3), (BM, n, 1)
    At = jnp.swapaxes(A, 1, 2)
    # NOTE: the reference adds the scalar 1e-6 to every entry of AtA (not to
    # the diagonal) — tools.py:152; replicated for parity.
    w = _mm(_mm(_inv3x3(_mm(At, A) + 1e-6), At), b)  # (BM, 3, 1)

    # Score every hypothesis against the candidate set.
    Ac, bc = _plane_AB(candidates, vertical_axis)  # (B, N, 3), (B, N, 1)
    w_b = w.reshape(B, max_it, 3)
    if score_mode == "per_batch":
        # dist[b, m, n] = A[b, n, :] . w[b, m, :] - y[b, n]
        dist = jnp.einsum("bnk,bmk->bmn", Ac, w_b, precision=_HI) - bc[:, None, :, 0]
        inlier_frac = jnp.mean((jnp.abs(dist) < tol).astype(points.dtype), axis=2)  # (B, M)
    elif score_mode == "reference":
        # Reference pairing (tools.py:130-133): flat hypothesis i = b*max_it+m
        # is scored against batch element i % B.
        pair = jnp.arange(B * max_it) % B
        Ap, bp = Ac[pair], bc[pair]  # (BM, N, 3), (BM, N, 1)
        dist = jnp.einsum("ink,ik->in", Ap, w.reshape(B * max_it, 3), precision=_HI) - bp[..., 0]
        inlier_frac = jnp.mean(
            (jnp.abs(dist) < tol).astype(points.dtype), axis=1
        ).reshape(B, max_it)
    else:
        raise ValueError(f"score_mode {score_mode!r} not recognized")
    best = jnp.argmax(inlier_frac, axis=1)  # (B,)
    best_w = jnp.take_along_axis(w_b, best[:, None, None], axis=1)[:, 0, :]  # (B, 3)

    # Distance of every pixel to its best plane.
    Aall, ball = _plane_AB(points.reshape(B, H * W, 3), vertical_axis)
    d = jnp.einsum("bnk,bk->bn", Aall, best_w, precision=_HI) - ball[..., 0]
    d = d.reshape(B, H, W, 1)

    return jax.lax.stop_gradient(d), jax.lax.stop_gradient(best_w[..., None])
