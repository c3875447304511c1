"""Evaluation metrics + harness (reference: eval.py, utils/point_cloud_utils.py)."""

from .metrics import (
    iou,
    f_score,
    chamfer_distance,
    chamfer_distance_l1,
    hausdorff_distance,
)

__all__ = [
    "iou",
    "f_score",
    "chamfer_distance",
    "chamfer_distance_l1",
    "hausdorff_distance",
]
