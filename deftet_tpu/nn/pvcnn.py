"""PVCNN point-voxel convolution encoder (flax).

Re-architecture of layers/pv_module/{pvconv,voxelization,shared_mlp,se}.py:
point features are voxelized (scatter-mean), pushed through a dense 3D conv
stack (the MXU hot loop), trilinearly de-voxelized back to the points and
fused with a per-point MLP.  Channels-last layout throughout ((B, N, C)
points, (B, X, Y, Z, C) voxels) — the native layout for TPU convolutions.

Reference block config (layers/pc_model.py:50): ((64, 1, 32), (128, 2, 16),
(512, 1, 8)) with kernel 3, no SE, scale_pvcnn coordinate normalization
(Voxelization.forward: norm = (coords + 1) / 2 * r, clamped to [0, r-1],
voxel indices by rounding; pvconv.py:33-39 for the fuse).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import jax

from ..ops.voxelize import avg_voxelize, trilinear_devoxelize

# Reference encoder architecture: (out_channels, num_blocks, resolution).
DEFAULT_BLOCKS: Tuple[Tuple[int, int, int], ...] = (
    (64, 1, 32),
    (128, 2, 16),
    (512, 1, 8),
)


def voxelize_coords(
    coords_bxnx3: jnp.ndarray, resolution: int, scale_pvcnn: bool = True
):
    """Map coords to voxel space (Voxelization.forward semantics).

    With scale_pvcnn (the paper config), input coords live in [-1, 1] and
    norm = (coords + 1) / 2; otherwise coords are mean-centered first.
    Returns (norm_coords float in [0, r-1], voxel_coords int32).
    """
    coords = jax.lax.stop_gradient(coords_bxnx3)
    if scale_pvcnn:
        norm = (coords + 1.0) / 2.0
    else:
        norm = coords - jnp.mean(coords, axis=1, keepdims=True)
        norm = (norm + 1.0) / 2.0
    norm = jnp.clip(norm * resolution, 0.0, resolution - 1.0)
    vox = jnp.round(norm).astype(jnp.int32)
    return norm, vox


class SharedMLP(nn.Module):
    """Per-point 1x1 conv + BatchNorm + ReLU stack (shared_mlp.py:6-35)."""

    features: Sequence[int]
    dtype: object = None

    @nn.compact
    def __call__(self, x_bxnxc, train: bool = True):
        for f in self.features:
            x_bxnxc = nn.Dense(f, dtype=self.dtype)(x_bxnxc)
            x_bxnxc = nn.BatchNorm(
                dtype=self.dtype,
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x_bxnxc)
            x_bxnxc = nn.relu(x_bxnxc)
        return x_bxnxc


class SE3d(nn.Module):
    """Squeeze-excitation over voxel grids (se.py:6-17); off by default."""

    channels: int
    reduction: int = 8
    dtype: object = None

    @nn.compact
    def __call__(self, x_bxrc):
        pooled = jnp.mean(x_bxrc, axis=(1, 2, 3))
        s = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype)(pooled)
        s = nn.relu(s)
        s = nn.Dense(self.channels, use_bias=False, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x_bxrc * s[:, None, None, None, :]


class PVConv(nn.Module):
    """One point-voxel conv block (pvconv.py:11-39).

    voxel path: Conv3d(k)->BN(eps 1e-4)->LeakyReLU(0.1), twice;
    point path: SharedMLP; fused = devoxelize(voxel) + point.
    Returns (fused (B, N, C_out), voxel_features (B, R, R, R, C_out)).
    """

    out_channels: int
    resolution: int
    kernel_size: int = 3
    with_se: bool = False
    scale_pvcnn: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, features_bxnxc, coords_bxnx3, train: bool = True):
        norm_coords, vox_coords = voxelize_coords(
            coords_bxnx3, self.resolution, self.scale_pvcnn
        )
        v = avg_voxelize(features_bxnxc, vox_coords, self.resolution)
        k = (self.kernel_size,) * 3
        for _ in range(2):
            v = nn.Conv(self.out_channels, k, padding="SAME",
                        dtype=self.dtype)(v)
            v = nn.BatchNorm(
                dtype=self.dtype,
                use_running_average=not train, momentum=0.9, epsilon=1e-4
            )(v)
            v = nn.leaky_relu(v, negative_slope=0.1)
        if self.with_se:
            v = SE3d(self.out_channels, dtype=self.dtype)(v)
        v = v.astype(jnp.float32)
        devox = trilinear_devoxelize(v, norm_coords)
        point = SharedMLP([self.out_channels], dtype=self.dtype)(
            features_bxnxc, train=train
        ).astype(jnp.float32)
        return devox + point, v


class PVCNNEncoder(nn.Module):
    """Stack of PVConv blocks; collects the per-stage voxel feature pyramid
    (pc_model.py:149-163 base_encode_inputs keeps every voxel_feature)."""

    blocks: Tuple[Tuple[int, int, int], ...] = DEFAULT_BLOCKS
    scale_pvcnn: bool = True
    with_se: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, points_bxnx3, train: bool = True):
        """points in [-0.5, 0.5]; features = coords * 2 (parallel of
        pc_model.py:151 ``features = inputs * 2``)."""
        features = points_bxnx3 * 2.0
        coords = features  # in [-1, 1]
        voxel_pyramid = []
        for out_channels, num_blocks, resolution in self.blocks:
            for _ in range(num_blocks):
                features, vox = PVConv(
                    out_channels=out_channels,
                    resolution=resolution,
                    scale_pvcnn=self.scale_pvcnn,
                    with_se=self.with_se,
                    dtype=self.dtype,
                )(features, coords, train=train)
                voxel_pyramid.append(vox)
        return voxel_pyramid
