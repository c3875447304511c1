"""Frustum-PointNet box losses + KL/huber extras (TPU-native).

Equivalents of layers/pv_module/frustum.py (FrustumPointNetLoss :11-90,
get_box_corners_3d :93-125), functional/loss.py (kl_loss :7-10,
huber_loss :13-17) and loss.py (KLLoss :8-10).  Dead code in the
reference — inherited from PVCNN's KITTI pipeline, never invoked by any
DefTet entry point (SURVEY.md P21) — ported for inventory completeness.

Pure jnp functions; the loss is a dataclass of weights applied to dict
pytrees, so it composes with jax.grad/jit directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "kl_loss",
    "huber_loss",
    "get_box_corners_3d",
    "FrustumPointNetLoss",
]


def kl_loss(x_bxc: jnp.ndarray, y_bxc: jnp.ndarray) -> jnp.ndarray:
    """KL(softmax(stop_grad(x)) ‖ softmax(y)), mean over batch
    (functional/loss.py:7-10; class axis = last here, channels-last)."""
    xs = jax.lax.stop_gradient(x_bxc)
    x = jax.nn.softmax(xs, axis=-1)
    logx = jax.nn.log_softmax(xs, axis=-1)  # finite where x underflows to 0
    logy = jax.nn.log_softmax(y_bxc, axis=-1)
    # x * (logx - logy) with x == 0 contributes 0, never 0 * inf = NaN
    return jnp.mean(jnp.sum(jnp.where(x > 0, x * (logx - logy), 0.0),
                            axis=-1))


def huber_loss(error: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Mean huber loss (functional/loss.py:13-17)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    return jnp.mean(0.5 * quadratic**2 + delta * (abs_error - quadratic))


def get_box_corners_3d(centers_nx3, headings_n, sizes_nx3, with_flip=False):
    """8 corners of y-up boxes rotated by heading about +y
    (frustum.py:93-125; corner order preserved).  Returns (N, 3, 8)
    (and the heading+π flip when requested)."""
    l, w, h = sizes_nx3[:, 0], sizes_nx3[:, 1], sizes_nx3[:, 2]
    half = jnp.stack(
        [
            jnp.stack([l, l, -l, -l, l, l, -l, -l], axis=1),
            jnp.stack([h, h, h, h, -h, -h, -h, -h], axis=1),
            jnp.stack([w, -w, -w, w, w, -w, -w, w], axis=1),
        ],
        axis=1,
    ) / 2.0  # (N, 3, 8)
    c, s = jnp.cos(headings_n), jnp.sin(headings_n)
    z = jnp.zeros_like(headings_n)
    o = jnp.ones_like(headings_n)
    R = jnp.stack([c, z, s, z, o, z, -s, z, c], axis=1).reshape(-1, 3, 3)
    out = jnp.einsum("nij,njk->nik", R, half) + centers_nx3[:, :, None]
    if not with_flip:
        return out
    Rf = jnp.stack([-c, z, -s, z, o, z, s, z, -c], axis=1).reshape(-1, 3, 3)
    flip = jnp.einsum("nij,njk->nik", Rf, half) + centers_nx3[:, :, None]
    return out, flip


def _cross_entropy(logits, labels):
    return jnp.mean(
        -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1
        )
    )


@dataclass
class FrustumPointNetLoss:
    """frustum.py:11-90 — segmentation CE + box center/heading/size
    classification-and-residual regression + corner consistency loss.

    inputs/targets are dict pytrees with the reference's keys;
    ``mask_logits`` is channels-last (B, N, 2) here.
    """

    num_heading_angle_bins: int
    num_size_templates: int
    size_templates: np.ndarray  # (NS, 3)
    box_loss_weight: float = 1.0
    corners_loss_weight: float = 10.0
    heading_residual_loss_weight: float = 20.0
    size_residual_loss_weight: float = 20.0
    heading_angle_bin_centers: np.ndarray = field(init=False)

    def __post_init__(self):
        self.size_templates = jnp.asarray(self.size_templates).reshape(
            self.num_size_templates, 3
        )
        self.heading_angle_bin_centers = jnp.arange(
            0.0, 2 * np.pi, 2 * np.pi / self.num_heading_angle_bins
        )

    def __call__(self, inputs: dict, targets: dict) -> jnp.ndarray:
        b = inputs["center"].shape[0]
        bid = jnp.arange(b)
        hbin = targets["heading_bin_id"]
        sbin = targets["size_template_id"]

        mask_loss = _cross_entropy(
            inputs["mask_logits"].reshape(-1, 2),
            targets["mask_logits"].reshape(-1),
        )
        heading_loss = _cross_entropy(inputs["heading_scores"], hbin)
        size_loss = _cross_entropy(inputs["size_scores"], sbin)
        center_loss = huber_loss(
            jnp.linalg.norm(targets["center"] - inputs["center"], axis=-1),
            delta=2.0,
        )
        center_reg_loss = huber_loss(
            jnp.linalg.norm(targets["center"] - inputs["center_reg"], axis=-1),
            delta=1.0,
        )

        hres_norm = inputs["heading_residuals_normalized"][bid, hbin]
        hres_norm_target = targets["heading_residual"] / (
            np.pi / self.num_heading_angle_bins
        )
        heading_residual_loss = huber_loss(
            hres_norm - hres_norm_target, delta=1.0
        )
        sres_norm = inputs["size_residuals_normalized"][bid, sbin]  # (B, 3)
        sres_norm_target = (
            targets["size_residual"] / self.size_templates[sbin]
        )
        size_residual_loss = huber_loss(
            jnp.linalg.norm(sres_norm_target - sres_norm, axis=-1), delta=1.0
        )

        heading = (
            inputs["heading_residuals"][bid, hbin]
            + self.heading_angle_bin_centers[hbin]
        )
        size = inputs["size_residuals"][bid, sbin] + self.size_templates[sbin]
        corners = get_box_corners_3d(inputs["center"], heading, size)
        heading_target = (
            self.heading_angle_bin_centers[hbin] + targets["heading_residual"]
        )
        size_target = self.size_templates[sbin] + targets["size_residual"]
        corners_target, corners_target_flip = get_box_corners_3d(
            targets["center"], heading_target, size_target, with_flip=True
        )
        corners_loss = huber_loss(
            jnp.minimum(
                jnp.linalg.norm(corners - corners_target, axis=1),
                jnp.linalg.norm(corners - corners_target_flip, axis=1),
            ),
            delta=1.0,
        )

        return mask_loss + self.box_loss_weight * (
            center_loss
            + center_reg_loss
            + heading_loss
            + size_loss
            + self.heading_residual_loss_weight * heading_residual_loss
            + self.size_residual_loss_weight * size_residual_loss
            + self.corners_loss_weight * corners_loss
        )
