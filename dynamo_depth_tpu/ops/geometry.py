"""Projective geometry + SE(3) ops.

Capability parity with the reference's ``tools.py`` (``BackprojectDepth``
``tools.py:167-197``, ``Project3D`` ``tools.py:200-224``, ``disp_to_depth`` /
``depth_to_disp`` ``tools.py:291-308``) and ``networks/layers.py``
(``transformation_from_parameters`` ``layers.py:7-82``), re-designed for TPU:

- points are carried **points-last** as ``(B, N, 3)`` so the tiny 3x3/4x4
  camera matmuls contract on the minor dimension and XLA fuses them with the
  surrounding elementwise work — there is no (B, 4, H*W) channel-major layout
  or precomputed per-batch buffer state as in the torch modules;
- everything is a pure function of its inputs (no nn.Module buffers), so the
  whole backproject→project chain inlines into the jitted train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (3x3/4x4) but feed sub-pixel sample coordinates;
# always run them at full precision regardless of the global matmul default.
_HI = jax.lax.Precision.HIGHEST


def disp_to_depth(disp, min_depth, max_depth):
    """Sigmoid disparity in [0, 1] -> (scaled_disp, depth).

    depth spans [min_depth, max_depth] hyperbolically (tools.py:291-298).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth, min_depth, max_depth):
    """Inverse of :func:`disp_to_depth` (tools.py:301-308)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = 1.0 / depth
    return (scaled_disp - min_disp) / (max_disp - min_disp)


def rot_from_axisangle(vec):
    """Axis-angle ``(B, 3)`` -> rotation matrices ``(B, 4, 4)`` (Rodrigues).

    Matches layers.py:43-82 including the 1e-7 guard on the angle norm.
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs,    zxC + ys,    zeros,
            xyC + zs,    y * yC + ca, yzC - xs,    zeros,
            zxC - ys,    yzC + xs,    z * zC + ca, zeros,
            zeros,       zeros,       zeros,       ones,
        ],
        axis=-1,
    )
    return rot.reshape(vec.shape[0], 4, 4)


def translation_matrix(t):
    """Translation ``(B, 3)`` -> homogeneous ``(B, 4, 4)`` (layers.py:27-40)."""
    B = t.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (B, 4, 4))
    return T.at[:, :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axis-angle ``(B,3)``, translation ``(B,3)``) -> SE(3) ``(B,4,4)``.

    ``invert=False``: M = T(t) @ R.  ``invert=True``: M = R^T @ T(-t), i.e. the
    exact inverse of the former (layers.py:7-24).
    """
    R = rot_from_axisangle(axisangle)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -translation
        return jnp.matmul(R, translation_matrix(t), precision=_HI)
    return jnp.matmul(translation_matrix(translation), R, precision=_HI)


@functools.lru_cache(maxsize=32)
def _pixel_grid_np(height: int, width: int):
    import numpy as np

    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1), np.ones(height * width)], axis=-1)
    return pix.astype("float32")  # (H*W, 3): [x, y, 1]


def pixel_grid(height: int, width: int) -> jnp.ndarray:
    """Homogeneous pixel coordinates ``(H*W, 3)`` = [x, y, 1] per pixel.

    Row-major over (y, x), matching the meshgrid buffers of tools.py:177-189.
    Cached on host; becomes a jit constant.
    """
    return jnp.asarray(_pixel_grid_np(height, width))


def backproject(depth, inv_K):
    """Depth map -> camera-frame point cloud.

    :param depth:  ``(B, H, W)`` or ``(B, H, W, 1)``
    :param inv_K:  ``(B, 4, 4)`` (only the top-left 3x3 is used)
    :return:       points ``(B, H*W, 3)``

    Equivalent to tools.py:191-197 modulo layout (theirs: ``(B, 4, H*W)``
    homogeneous; ours drops the constant ones row — :func:`project` handles
    homogeneity via the affine split of T).
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    pix = pixel_grid(H, W).astype(depth.dtype)  # (H*W, 3)
    rays = jnp.einsum("bij,nj->bni", inv_K[:, :3, :3], pix, precision=_HI)  # (B, H*W, 3)
    return rays * depth.reshape(B, H * W, 1)


def project(points, K, T=None, *, height=None, width=None, eps=1e-7):
    """Project camera-frame points to normalized sample coords + ego-flow.

    :param points: ``(B, N, 3)`` with N = height*width
    :param K:      ``(B, 4, 4)``
    :param T:      optional ``(B, 4, 4)`` camera motion applied before K
    :return: (pix_coords ``(B, H, W, 2)`` in [-1, 1] for :func:`grid_sample`,
              flow ``(B, N, 3)`` = T·p − p, zeros when T is None)

    Matches tools.py:211-224: pinhole division with +eps, normalization by
    (dim − 1) then mapping to [-1, 1].
    """
    B, N, _ = points.shape
    assert height is not None and width is not None and height * width == N

    if T is not None:
        moved = jnp.einsum("bij,bnj->bni", T[:, :3, :3], points, precision=_HI) + T[:, None, :3, 3]
    else:
        moved = points
    uvw = jnp.einsum("bij,bnj->bni", K[:, :3, :3], moved, precision=_HI) + K[:, None, :3, 3]

    pix = uvw[..., :2] / (uvw[..., 2:3] + eps)
    pix = pix / jnp.asarray([width - 1, height - 1], dtype=pix.dtype)
    pix = (pix - 0.5) * 2.0
    pix_coords = pix.reshape(B, height, width, 2)

    flow = moved - points
    return pix_coords, flow
