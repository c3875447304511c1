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

__all__ = [
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
