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


OCC_GRID_EXTENT = 0.55  # must match data.pipeline.OCC_GRID_EXTENT


def _trilinear_scalar_soa(grid_bxgxgxg, cx, cy, cz):
    """Trilinear sample of a scalar grid at SoA coords (each (B, P));
    border clamping.  Avoids any (B, P, 3) coordinate tensor (whose
    size-3 lane dim pads 42x on TPU)."""
    b, g = grid_bxgxgxg.shape[0], grid_bxgxgxg.shape[1]
    flat = grid_bxgxgxg.reshape(b, g * g * g)
    out = 0.0
    comps = []
    for c in (cx, cy, cz):
        c = jnp.clip(c, 0.0, g - 1.0)
        i0 = jnp.floor(c)
        comps.append((i0.astype(jnp.int32), c - i0))
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                ix = jnp.minimum(comps[0][0] + sx, g - 1)
                iy = jnp.minimum(comps[1][0] + sy, g - 1)
                iz = jnp.minimum(comps[2][0] + sz, g - 1)
                w = (
                    (comps[0][1] if sx else 1.0 - comps[0][1])
                    * (comps[1][1] if sy else 1.0 - comps[1][1])
                    * (comps[2][1] if sz else 1.0 - comps[2][1])
                )
                vals = jnp.take_along_axis(
                    flat, ix * (g * g) + iy * g + iz, axis=1
                )
                out = out + vals * w
    return out


def occupancy_from_grid(
    occ_grid_bxgxgxg: jnp.ndarray,
    points_bxpx3: jnp.ndarray,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Inside/outside labels from a precomputed occupancy texture.

    The TPU-first occupancy oracle: a trilinear read of the offline
    [-E, E]^3 cell-centered grid (data.pipeline.occupancy_grid) replacing
    the reference's per-step O(points x GT-faces) check_sign
    (deftet.py:33-49).  No gradient (labels).
    """
    pts = jax.lax.stop_gradient(points_bxpx3)
    return occupancy_from_grid_soa(
        occ_grid_bxgxgxg,
        pts[..., 0], pts[..., 1], pts[..., 2],
        threshold=threshold,
    )


def occupancy_from_grid_soa(
    occ_grid_bxgxgxg: jnp.ndarray,
    x_bxp: jnp.ndarray,
    y_bxp: jnp.ndarray,
    z_bxp: jnp.ndarray,
    threshold: float = 0.5,
    interp: str = "nearest",
) -> jnp.ndarray:
    """SoA-coordinate variant of occupancy_from_grid.

    Default aligned with TrainConfig.occ_grid_interp ("nearest"):
    reference-parity replays that want the trilinear-equivalent GT
    labels pass --occ_grid_interp trilinear.

    interp="nearest" reads the single nearest voxel instead of the
    8-corner trilinear stencil.  The output is thresholded to {0, 1}
    either way, so the two differ only within half a voxel of the
    surface — but nearest is ONE gather instead of eight (the trilinear
    corner gathers measured ~124 ms/step at res-50/bs-4, ~11% of the
    whole train step)."""
    g = occ_grid_bxgxgxg.shape[1]

    def to_vox(c):
        c = jax.lax.stop_gradient(c)
        return (c + OCC_GRID_EXTENT) / (2 * OCC_GRID_EXTENT) * g - 0.5

    cx, cy, cz = to_vox(x_bxp), to_vox(y_bxp), to_vox(z_bxp)
    if interp == "nearest":
        # int8 table + payload: the read is a random-access HBM gather
        # whose cost tracks payload bytes (measured: bf16 halved the f32
        # gather time).  Thresholding commutes with a nearest gather
        # (elementwise on the table == elementwise on the result), so the
        # table is pre-thresholded to {0,1} int8 — exact for binary AND
        # probability textures, at a quarter of the f32 payload.
        bits = (occ_grid_bxgxgxg > threshold).astype(jnp.int8)
        b = bits.shape[0]
        flat = bits.reshape(b, g * g * g)
        ix, iy, iz = (
            jnp.clip(jnp.round(c), 0, g - 1).astype(jnp.int32)
            for c in (cx, cy, cz)
        )
        vals = jnp.take_along_axis(flat, ix * (g * g) + iy * g + iz, axis=1)
        return vals.astype(jnp.float32)
    grid = occ_grid_bxgxgxg.astype(jnp.float32)
    vals = _trilinear_scalar_soa(grid, cx, cy, cz)
    return (vals > threshold).astype(jnp.float32)
