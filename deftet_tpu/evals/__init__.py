"""Evaluation metrics + harness (reference: eval.py, utils/point_cloud_utils.py)."""

from .metrics import (
    iou,
    f_score,
    chamfer_distance,
    chamfer_distance_l1,
    hausdorff_distance,
)
from .harness import (
    make_inference_step,
    sample_mesh_points,
    decode_occ_full_grid,
)

__all__ = [
    "iou",
    "f_score",
    "chamfer_distance",
    "chamfer_distance_l1",
    "hausdorff_distance",
    "make_inference_step",
    "sample_mesh_points",
    "decode_occ_full_grid",
]
