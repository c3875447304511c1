"""Evaluation metrics: IoU, F-score, Chamfer, Chamfer-L1, Hausdorff.

Behavioural ports of utils/point_cloud_utils.py (the reference delegates the
nearest-point searches to kaolin's ``sided_distance``; here they run on the
tiled XLA kernels in ``ops.nearest`` / ``ops.tri_distance``):

  * iou                 — point_cloud_utils.py:13-44 (threshold both inputs,
    intersection over union of the binarized sets).
  * f_score             — :67-109 (hit radius 0.01, optional "extend"
    precision/recall variant).
  * chamfer_distance    — :111-116 (mean of both sided sqrt distances / 2).
  * chamfer_distance_l1 — :119-130 (L1 to the nearest neighbour, summed over
    xyz, both directions added).
  * hausdorff_distance  — :48-62 (point-to-mesh based, returns (mean, max)
    averaged over the two directions).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.nearest import sided_squared_distance
from ..ops.tri_distance import point_to_mesh_squared_distance

EPS = 1e-15


def iou(pred: jnp.ndarray, target: jnp.ndarray, thresh: float = 0.5):
    """IoU of the two point sets binarized at `thresh` (scalar per call)."""
    p = (pred > thresh).astype(jnp.float32).reshape(-1)
    t = (target > thresh).astype(jnp.float32).reshape(-1)
    inter = jnp.sum(p * t)
    union = jnp.sum(jnp.clip(p + t, 0.0, 1.0))
    return inter / jnp.maximum(union, 1.0)


def f_score(
    gt_points_bxnx3: jnp.ndarray,
    pred_points_bxmx3: jnp.ndarray,
    radius: float = 0.01,
    extend: bool = False,
    chunk: int = 2048,
):
    """F-score with hits within `radius` (point_cloud_utils.py:67-109).

    Note the reference's asymmetric naming: `pred_distances` are measured
    from the GT points to the predicted set and vice versa.
    """
    d_gt2pred, _ = sided_squared_distance(
        gt_points_bxnx3, pred_points_bxmx3, chunk=chunk
    )
    d_pred2gt, _ = sided_squared_distance(
        pred_points_bxmx3, gt_points_bxnx3, chunk=chunk
    )
    pred_distances = jnp.sqrt(d_gt2pred + EPS)
    gt_distances = jnp.sqrt(d_pred2gt + EPS)

    if extend:
        fp = jnp.sum((gt_distances > radius).astype(jnp.float32), axis=-1)
        tp = jnp.sum((gt_distances <= radius).astype(jnp.float32), axis=-1)
        precision = tp / jnp.maximum(tp + fp, 1.0)
        tp2 = jnp.sum((pred_distances <= radius).astype(jnp.float32), axis=-1)
        fn = jnp.sum((pred_distances > radius).astype(jnp.float32), axis=-1)
        recall = tp2 / jnp.maximum(tp2 + fn, 1.0)
    else:
        fn = jnp.sum((pred_distances > radius).astype(jnp.float32), axis=-1)
        fp = jnp.sum((gt_distances > radius).astype(jnp.float32), axis=-1)
        tp = jnp.sum((gt_distances <= radius).astype(jnp.float32), axis=-1)
        precision = tp / jnp.maximum(tp + fp, 1.0)
        recall = tp / jnp.maximum(tp + fn, 1.0)
    return 2.0 * precision * recall / (precision + recall + 1e-8)


def chamfer_distance(
    s1_bxnx3: jnp.ndarray, s2_bxmx3: jnp.ndarray, chunk: int = 2048
):
    """(mean sqrt d(s1→s2) + mean sqrt d(s2→s1)) / 2, per batch element."""
    d12, _ = sided_squared_distance(s1_bxnx3, s2_bxmx3, chunk=chunk)
    d21, _ = sided_squared_distance(s2_bxmx3, s1_bxnx3, chunk=chunk)
    return (
        jnp.mean(jnp.sqrt(d12 + EPS), axis=-1)
        + jnp.mean(jnp.sqrt(d21 + EPS), axis=-1)
    ) / 2.0


def chamfer_distance_l1(
    s1_bxnx3: jnp.ndarray, s2_bxmx3: jnp.ndarray, chunk: int = 2048
):
    """Sum over xyz of |p - nearest|, both directions added
    (point_cloud_utils.py:119-130)."""
    _, idx12 = sided_squared_distance(s1_bxnx3, s2_bxmx3, chunk=chunk)
    closest2 = jnp.take_along_axis(s2_bxmx3, idx12[..., None], axis=1)
    d12 = jnp.sum(jnp.abs(s1_bxnx3 - closest2), axis=-1)
    _, idx21 = sided_squared_distance(s2_bxmx3, s1_bxnx3, chunk=chunk)
    closest1 = jnp.take_along_axis(s1_bxnx3, idx21[..., None], axis=1)
    d21 = jnp.sum(jnp.abs(s2_bxmx3 - closest1), axis=-1)
    return jnp.mean(d12, axis=-1) + jnp.mean(d21, axis=-1)


def hausdorff_distance(
    verts_a_bxnx3: jnp.ndarray,
    faces_a_bxfx3: jnp.ndarray,
    mask_a_bxf: jnp.ndarray,
    verts_b_bxmx3: jnp.ndarray,
    faces_b_bxgx3: jnp.ndarray,
    mask_b_bxg: jnp.ndarray,
    pts_a_bxpx3: jnp.ndarray,
    pts_b_bxqx3: jnp.ndarray,
    chunk: int = 512,
):
    """Two-sided point-to-mesh Hausdorff (point_cloud_utils.py:48-62).

    Returns (avg, max) per batch element; padded faces are excluded by the
    per-face masks.
    """
    b = verts_a_bxnx3.shape[0]
    bidx = jnp.arange(b)[:, None, None]
    tri_a = verts_a_bxnx3[bidx, faces_a_bxfx3]  # (B, F, 3, 3)
    tri_b = verts_b_bxmx3[bidx, faces_b_bxgx3]
    d2_a, _ = point_to_mesh_squared_distance(
        pts_b_bxqx3, tri_a, mask_a_bxf, chunk=chunk
    )
    d2_b, _ = point_to_mesh_squared_distance(
        pts_a_bxpx3, tri_b, mask_b_bxg, chunk=chunk
    )
    da = jnp.sqrt(d2_a + EPS)
    db = jnp.sqrt(d2_b + EPS)
    avg = (da.mean(axis=-1) + db.mean(axis=-1)) / 2.0
    mx = (jnp.max(da, axis=-1) + jnp.max(db, axis=-1)) / 2.0
    return avg, mx
