"""Point↔voxel transfer ops for the PVCNN encoder (pure XLA).

Replaces the reference's CUDA PVCNN backend:
  * avg_voxelize          — pv_module/functional/src/voxelization/vox.cu:
    18-127 (atomicAdd scatter-mean of point features into an R^3 grid).
    Here: one flat scatter-add + count divide; the backward is the exact
    count-normalized gather, produced automatically by autodiff.
  * trilinear_devoxelize  — the path the model actually uses is the pure
    grid_sample wrapper (pv_module/functional/devoxelization.py:44-50):
    ``F.grid_sample(align_corners=False, padding_mode='border')`` at grid
    coordinates (2c+1)/r - 1, which algebraically reduces to *trilinear
    interpolation at voxel-center coordinate c with border clamping* — that
    reduction is implemented directly.

Layout convention: features are channels-last — points (B, N, C), voxels
(B, R, R, R, C) with axis order (x, y, z) — matching how the reference's
(B, C, X, Y, Z) + flipped grid_sample coordinates compose, and the layout
TPU convolutions want.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("resolution",))
def avg_voxelize(
    features_bxnxc: jnp.ndarray,
    coords_bxnx3: jnp.ndarray,
    resolution: int,
) -> jnp.ndarray:
    """Scatter-mean point features into an (R, R, R) grid.

    Args:
      features_bxnxc: (B, N, C) point features.
      coords_bxnx3: (B, N, 3) integer voxel coords in [0, R-1].

    Returns (B, R, R, R, C); empty voxels are zero.
    """
    b, n, c = features_bxnxc.shape
    r = resolution
    coords = jnp.clip(coords_bxnx3.astype(jnp.int32), 0, r - 1)
    flat = (
        coords[..., 0] * (r * r) + coords[..., 1] * r + coords[..., 2]
    )  # (B, N)
    batch_offset = jnp.arange(b, dtype=jnp.int32)[:, None] * (r * r * r)
    idx = (flat + batch_offset).reshape(-1)  # (B*N,)

    feat_flat = features_bxnxc.reshape(b * n, c)
    sums = jnp.zeros((b * r * r * r, c), features_bxnxc.dtype).at[idx].add(
        feat_flat
    )
    counts = jnp.zeros((b * r * r * r,), jnp.float32).at[idx].add(1.0)
    out = sums / jnp.maximum(counts, 1.0)[:, None].astype(features_bxnxc.dtype)
    return out.reshape(b, r, r, r, c)


def trilinear_devoxelize(
    voxels_bxrc: jnp.ndarray,
    coords_bxnx3: jnp.ndarray,
) -> jnp.ndarray:
    """Trilinear interpolation of voxel features at continuous coords.

    Args:
      voxels_bxrc: (B, R, R, R, C).
      coords_bxnx3: (B, N, 3) float coords in voxel-center units; values are
        clamped to [0, R-1] (border padding).  Differentiable w.r.t. both.

    Returns (B, N, C).
    """
    b, r = voxels_bxrc.shape[0], voxels_bxrc.shape[1]
    c_dim = voxels_bxrc.shape[-1]
    coords = jnp.clip(coords_bxnx3, 0.0, r - 1.0)
    i0 = jnp.floor(coords)
    frac = coords - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, r - 1)

    vox_flat = voxels_bxrc.reshape(b, r * r * r, c_dim)

    def corner(sel):
        ix = jnp.where(sel[0], i1[..., 0], i0[..., 0])
        iy = jnp.where(sel[1], i1[..., 1], i0[..., 1])
        iz = jnp.where(sel[2], i1[..., 2], i0[..., 2])
        flat = ix * (r * r) + iy * r + iz  # (B, N)
        vals = jnp.take_along_axis(
            vox_flat, flat[..., None].astype(jnp.int32), axis=1
        )  # (B, N, C)
        wx = jnp.where(sel[0], frac[..., 0], 1.0 - frac[..., 0])
        wy = jnp.where(sel[1], frac[..., 1], 1.0 - frac[..., 1])
        wz = jnp.where(sel[2], frac[..., 2], 1.0 - frac[..., 2])
        return vals * (wx * wy * wz)[..., None]

    out = 0.0
    for sx in (False, True):
        for sy in (False, True):
            for sz in (False, True):
                out = out + corner((sx, sy, sz))
    return out
