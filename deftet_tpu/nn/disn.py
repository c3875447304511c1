"""DISN image branch: VGG16 feature-pyramid encoder + global/local SDF MLPs.

Re-architecture of layers/disn.py (off by default in the reference,
config.py use_disn — kept for full API parity):

  * VGG16Features   — VGG-D conv stack (channels-last NHWC); collects the
                      pre-maxpool feature maps (disn.py:73-84) and a
                      classifier head producing the global image encoding.
  * DISNEncoder     — imagenet normalization, encode, resize local maps to
                      a common resolution (disn.py:175-243).
  * sample_image_features — project 3D query points by a 4x4 row-vector
                      camera matrix and bilinearly sample each feature map
                      (zeros padding), disn.py:252-298.
  * SDFGlobalDecoder / SDFLocalDecoder / DISNDecoder — point MLP [3, 64,
    256, 512] concat features -> [*, 512, 256] -> out (disn.py:109-172);
    predictions summed (:333-341).

No pretrained torchvision weights are loaded (zero-egress environment);
the architecture matches so weights can be ported offline if needed.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# VGG-16 configuration "D": conv widths with 'M' maxpools.
_VGG_D = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M")

# Plain tuples, NOT jnp arrays: module-level jax ops initialize the
# default backend at import time (hangs all imports when the TPU
# terminal is unreachable); converted to traced constants in-call.
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG16Features(nn.Module):
    """VGG-D conv stack; returns (global_encoding, [pre-pool features]).

    `width` scales every conv/dense width (1.0 = the exact VGG-16-D
    table) — sub-1 widths make the image branch testable at toy sizes.
    """

    num_classes: int = 1000
    width: float = 1.0

    @nn.compact
    def __call__(self, images_bxhxwx3: jnp.ndarray):
        x = images_bxhxwx3
        intermediates = []
        for v in _VGG_D:
            if v == "M":
                intermediates.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(max(int(int(v) * self.width), 8), (3, 3),
                            padding=1)(x)
                x = nn.relu(x)
        # classifier head (adaptive 7x7 avgpool -> MLP, torchvision VGG)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 7, 7, c), method="linear")
        x = x.reshape(b, -1)
        hidden = max(int(4096 * self.width), 16)
        x = nn.relu(nn.Dense(hidden)(x))
        x = nn.relu(nn.Dense(hidden)(x))
        x = nn.Dense(self.num_classes)(x)
        return x, intermediates


class DISNEncoder(nn.Module):
    """Image -> [global (B, D)] + resized local feature maps."""

    image_encoding_dim: int = 1000
    local_feature_size: int = 137
    normalize: bool = True
    image_size: int | None = None
    width: float = 1.0

    @nn.compact
    def __call__(self, images_bxhxwx3: jnp.ndarray):
        x = images_bxhxwx3
        if self.image_size is not None and (
            x.shape[1] != self.image_size or x.shape[2] != self.image_size
        ):
            x = jax.image.resize(
                x,
                (x.shape[0], self.image_size, self.image_size, x.shape[3]),
                method="linear",
            )
        if self.normalize:
            x = (x - jnp.asarray(_IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                _IMAGENET_STD, x.dtype
            )
        global_feat, maps = VGG16Features(
            num_classes=self.image_encoding_dim, width=self.width
        )(x)
        s = self.local_feature_size
        resized = [
            jax.image.resize(
                m, (m.shape[0], s, s, m.shape[3]), method="linear"
            )
            for m in maps
        ]
        return global_feat, resized


def project_points(points_bxnx3, camera_matrix_bx4x4):
    """Row-vector projection to [-1, 1] screen space (disn.py:252-270)."""
    ones = jnp.ones(points_bxnx3.shape[:-1] + (1,), points_bxnx3.dtype)
    homo = jnp.concatenate([points_bxnx3, ones], axis=-1)
    # geometry-critical: bf16 matmul jitter would misplace the sampling
    # footprint on the feature maps (same failure class as render/camera).
    proj = jnp.matmul(
        homo, camera_matrix_bx4x4, precision=jax.lax.Precision.HIGHEST
    )
    proj = proj / proj[..., 2:3]
    return proj[..., :2]


def bilinear_sample(map_bxhxwxc, xy_bxnx2):
    """Bilinear sample with zeros padding; xy in [-1, 1], (-1,-1) = top
    left (F.grid_sample align_corners=False semantics, disn.py:290-295)."""
    b, h, w, c = map_bxhxwxc.shape
    x = (xy_bxnx2[..., 0] + 1.0) * w / 2.0 - 0.5
    y = (xy_bxnx2[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = map_bxhxwxc.reshape(b, h * w, c)
        vals = jnp.take_along_axis(
            flat, (yi_c * w + xi_c)[..., None], axis=1
        )
        return vals * inside[..., None]

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx_ = wx[..., None]
    wy_ = wy[..., None]
    return (
        v00 * (1 - wx_) * (1 - wy_)
        + v01 * wx_ * (1 - wy_)
        + v10 * (1 - wx_) * wy_
        + v11 * wx_ * wy_
    )


def sample_image_features(maps, points_bxnx3, camera_matrix_bx4x4):
    """Concat bilinear samples of every local map at projected points."""
    xy = project_points(points_bxnx3, camera_matrix_bx4x4)
    return jnp.concatenate([bilinear_sample(m, xy) for m in maps], axis=-1)


class _PointMLP(nn.Module):
    dims: Sequence[int]
    final: bool = False

    @nn.compact
    def __call__(self, x_bxnxc):
        for i, d in enumerate(self.dims):
            x_bxnxc = nn.Dense(d)(x_bxnxc)
            if not (self.final and i == len(self.dims) - 1):
                x_bxnxc = nn.relu(x_bxnxc)
        return x_bxnxc


class SDFGlobalDecoder(nn.Module):
    out_features: int = 1

    @nn.compact
    def __call__(self, query_bxnx3, global_bxd):
        x = _PointMLP((64, 256, 512))(query_bxnx3)
        g = jnp.broadcast_to(
            global_bxd[:, None, :],
            (x.shape[0], x.shape[1], global_bxd.shape[-1]),
        )
        x = jnp.concatenate([x, g], axis=-1)
        x = _PointMLP((512, 256))(x)
        return _PointMLP((self.out_features,), final=True)(x)


class SDFLocalDecoder(nn.Module):
    out_features: int = 1

    @nn.compact
    def __call__(self, query_bxnx3, local_bxnxd):
        x = _PointMLP((64, 256, 512))(query_bxnx3)
        x = jnp.concatenate([x, local_bxnxd], axis=-1)
        x = _PointMLP((512, 256))(x)
        return _PointMLP((self.out_features,), final=True)(x)


class DISNDecoder(nn.Module):
    """global + local SDF predictions summed (disn.py:333-341)."""

    out_features: int = 1

    @nn.compact
    def __call__(self, query_bxnx3, global_bxd, local_bxnxd):
        g = SDFGlobalDecoder(self.out_features)(query_bxnx3, global_bxd)
        l = SDFLocalDecoder(self.out_features)(query_bxnx3, local_bxnxd)
        return g + l
