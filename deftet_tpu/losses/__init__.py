"""Geometric losses over the deformable tet grid."""

from .geometry import (
    tet_volumes,
    volume_variance,
    amips_energy,
    edge_length,
    laplacian_loss,
    delta_loss,
)
from .surface import (
    boundary_faces_from_occupancy,
    boundary_info_from_occupancy,
    sample_surface_points,
    select_boundary_subset,
    select_boundary_subset_static,
    surface_align_losses,
    normal_smoothness_loss,
    normal_smoothness_loss_compacted,
    normal_smoothness_loss_pairs,
    occupancy_bce,
)
from .frustum import kl_loss, huber_loss, get_box_corners_3d, FrustumPointNetLoss

__all__ = [
    "kl_loss",
    "huber_loss",
    "get_box_corners_3d",
    "FrustumPointNetLoss",
    "tet_volumes",
    "volume_variance",
    "amips_energy",
    "edge_length",
    "laplacian_loss",
    "delta_loss",
    "boundary_faces_from_occupancy",
    "boundary_info_from_occupancy",
    "sample_surface_points",
    "select_boundary_subset",
    "select_boundary_subset_static",
    "surface_align_losses",
    "normal_smoothness_loss",
    "normal_smoothness_loss_compacted",
    "normal_smoothness_loss_pairs",
    "occupancy_bce",
]
