"""PointNet set-abstraction / feature-propagation modules (flax).

Equivalents of layers/pv_module/pointnet.py (PointNetAModule :11-46,
PointNetSAModule :49-96, PointNetFPModule :99-117) and the BallQuery
grouper module (layers/pv_module/ball_query.py:10-34).  None of the
shipped DefTet configs instantiate these (SURVEY.md P5/C3 note: only the
PVConv path is used) — provided for framework completeness, so PVCNN-
family point-cloud models can be built on the same TPU primitives.

Layout is channels-last: features (B, N, C), coords (B, N, 3).  All
shapes are static; grouping neighborhoods are fixed-size index gathers
(ops/sampling.py), so everything jits to one fused XLA program.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops.sampling import (
    ball_query,
    furthest_point_sample,
    gather_points,
    grouping,
    three_nn_interpolate,
)
from .pvcnn import SharedMLP

__all__ = [
    "BallQueryGrouper",
    "PointNetAModule",
    "PointNetSAModule",
    "PointNetFPModule",
]


def _as_branch_channels(out_channels) -> Tuple[Tuple[int, ...], ...]:
    """Normalize to a tuple of per-branch MLP channel tuples
    (pointnet.py:14-18 list-of-lists expansion)."""
    if not isinstance(out_channels, (list, tuple)):
        return ((int(out_channels),),)
    if not isinstance(out_channels[0], (list, tuple)):
        return (tuple(int(c) for c in out_channels),)
    return tuple(tuple(int(c) for c in branch) for branch in out_channels)


class BallQueryGrouper(nn.Module):
    """Group neighbor features around centers (ball_query.py:10-34):
    fixed-radius neighborhoods, coords re-centered on each center and
    optionally concatenated to the grouped features."""

    radius: float
    num_neighbors: int
    include_coordinates: bool = True

    def __call__(self, points_coords, centers_coords, points_features=None):
        idx = ball_query(
            centers_coords, points_coords, self.radius, self.num_neighbors
        )  # (B, M, U)
        neighbor_coords = grouping(points_coords, idx)
        neighbor_coords = neighbor_coords - centers_coords[:, :, None, :]
        if points_features is None:
            assert self.include_coordinates, "no features to group"
            return neighbor_coords
        feats = grouping(points_features, idx)
        if self.include_coordinates:
            feats = jnp.concatenate([neighbor_coords, feats], axis=-1)
        return feats  # (B, M, U, C[+3])


class PointNetAModule(nn.Module):
    """Global aggregation: MLP over all points, max-pool to one vector
    (pointnet.py:11-46).  Returns (features (B, 1, C), coords (B, 1, 3)
    zeros)."""

    out_channels: Union[int, Sequence]
    include_coordinates: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, features_bxnxc, coords_bxnx3, train: bool = True):
        x = features_bxnxc
        if self.include_coordinates:
            x = jnp.concatenate([x, coords_bxnx3], axis=-1)
        outs = []
        for branch in _as_branch_channels(self.out_channels):
            y = SharedMLP(branch, dtype=self.dtype)(x, train=train)
            outs.append(jnp.max(y, axis=1, keepdims=True))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        zeros = jnp.zeros((coords_bxnx3.shape[0], 1, 3), coords_bxnx3.dtype)
        return out, zeros


class PointNetSAModule(nn.Module):
    """Set abstraction (pointnet.py:49-96): FPS centers, per-radius
    ball-query grouping, SharedMLP over (B, M, U, C), max over the
    neighbor axis; multi-radius branches concatenated."""

    num_centers: int
    radius: Union[float, Sequence[float]]
    num_neighbors: Union[int, Sequence[int]]
    out_channels: Union[int, Sequence]
    include_coordinates: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, features_bxnxc, coords_bxnx3, train: bool = True):
        radii = (
            self.radius
            if isinstance(self.radius, (list, tuple))
            else [self.radius]
        )
        num_neighbors = (
            self.num_neighbors
            if isinstance(self.num_neighbors, (list, tuple))
            else [self.num_neighbors] * len(radii)
        )
        branches = _as_branch_channels(self.out_channels)
        if len(branches) == 1 and len(radii) > 1:
            branches = branches * len(radii)
        assert len(radii) == len(num_neighbors) == len(branches)

        idx = furthest_point_sample(coords_bxnx3, self.num_centers)
        centers = gather_points(coords_bxnx3, idx)  # (B, M, 3)
        outs = []
        for r, u, branch in zip(radii, num_neighbors, branches):
            grouped = BallQueryGrouper(
                radius=float(r),
                num_neighbors=int(u),
                include_coordinates=self.include_coordinates,
            )(coords_bxnx3, centers, features_bxnxc)
            y = SharedMLP(branch, dtype=self.dtype)(grouped, train=train)
            outs.append(jnp.max(y, axis=2))  # (B, M, C)
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        return out, centers


class PointNetFPModule(nn.Module):
    """Feature propagation (pointnet.py:99-117): 3-NN inverse-distance
    interpolate center features back to points, concat skip features,
    SharedMLP."""

    out_channels: Sequence[int]
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        points_coords,
        centers_coords,
        centers_features,
        points_features=None,
        train: bool = True,
    ):
        interp = three_nn_interpolate(
            points_coords, centers_coords, centers_features
        )
        if points_features is not None:
            interp = jnp.concatenate([interp, points_features], axis=-1)
        out = SharedMLP(tuple(self.out_channels), dtype=self.dtype)(
            interp, train=train
        )
        return out, points_coords
