"""Flax network modules: PVCNN encoder, GCN decoder, occupancy MLP, DISN."""

from .pvcnn import PVConv, SharedMLP, SE3d, PVCNNEncoder, voxelize_coords
from .gcn import (
    GraphConv,
    GraphConvBlock,
    GCNMLPDecoder,
    LatticeAdjacency,
    VertexAdjacency,
)
from .mlp import MLPDecoder
from .model import DeformableTetNetwork, sample_grid_features
from .pointnet import (
    BallQueryGrouper,
    PointNetAModule,
    PointNetSAModule,
    PointNetFPModule,
)

__all__ = [
    "BallQueryGrouper",
    "PointNetAModule",
    "PointNetSAModule",
    "PointNetFPModule",
    "PVConv",
    "SharedMLP",
    "SE3d",
    "PVCNNEncoder",
    "voxelize_coords",
    "GraphConv",
    "GraphConvBlock",
    "GCNMLPDecoder",
    "VertexAdjacency",
    "LatticeAdjacency",
    "MLPDecoder",
    "DeformableTetNetwork",
    "sample_grid_features",
]
