"""TPU compute kernels (XLA + Pallas) for the tet-grid geometry engine."""

from .geometry import (
    det3x3,
    safe_inverse3x3,
    gather_tet_vertices,
    tet_rest_inverse,
    face_normals,
)
from .voxelize import avg_voxelize, trilinear_devoxelize, occupancy_from_grid
from .nearest import nearest_neighbor, sided_squared_distance
from .check_sign import check_sign
from .point_tet import points_in_tets
from .tri_distance import point_to_mesh_squared_distance
from .sampling import (
    gather_points,
    furthest_point_sample,
    ball_query,
    grouping,
    three_nn_interpolate,
    logits_mask,
)

__all__ = [
    "gather_points",
    "furthest_point_sample",
    "ball_query",
    "grouping",
    "three_nn_interpolate",
    "logits_mask",
    "det3x3",
    "safe_inverse3x3",
    "gather_tet_vertices",
    "tet_rest_inverse",
    "face_normals",
    "avg_voxelize",
    "trilinear_devoxelize",
    "occupancy_from_grid",
    "nearest_neighbor",
    "sided_squared_distance",
    "check_sign",
    "points_in_tets",
    "point_to_mesh_squared_distance",
]
