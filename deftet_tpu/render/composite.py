"""Alpha compositing of peeled layers + the full render path.

Behavioural port of 5_rendereq/deftetrneder.py:
  * peel2mask (:31-64)        — clip alpha, visibility = alpha *
    cumprod(shifted (1 - alpha)), composite color / optional depth, white
    background (+ -6.0 background depth).
  * rendermeshcolor (:67-113) — sigmoid features -> [alpha, rgb], gather
    vertex data to faces (4_render/vertex2face.py:12-29), rasterize, peel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import jax.nn

from .raster import deftet_sparse_render

EPS = 1e-10


def peel2mask(
    ims_bxpxkxd: jnp.ndarray,
    imdepth_bxpxkx1: Optional[jnp.ndarray] = None,
):
    """Composite k peeled [alpha, rgb...] layers front-to-back.

    Returns (color (B, P, D-1), visibility (B, P, 1), depth (B, P, 1) or
    None) with a white background.
    """
    alpha = jnp.clip(ims_bxpxkxd[..., :1], EPS, 1.0 - EPS)  # (B,P,k,1)
    color = ims_bxpxkxd[..., 1:]
    # shift (1 - alpha) one layer back, front layer sees 1
    shifted = jnp.pad(
        1.0 - alpha[:, :, :-1, :],
        ((0, 0), (0, 0), (1, 0), (0, 0)),
        constant_values=1.0,
    )
    transmit = jnp.cumprod(shifted, axis=2)
    vis = alpha * transmit                      # (B, P, k, 1)
    out_color = jnp.sum(color * vis, axis=2)    # (B, P, D-1)
    out_depth = (
        jnp.sum(imdepth_bxpxkx1 * vis, axis=2)
        if imdepth_bxpxkx1 is not None
        else None
    )
    out_vis = jnp.sum(vis, axis=2)              # (B, P, 1)
    out_color = out_color + (1.0 - out_vis)     # white background
    if out_depth is not None:
        out_depth = out_depth + -6.0 * (1.0 - out_vis)
    return out_color, out_vis, out_depth


def vertex2face(vert_bxpxd: jnp.ndarray, faces_fx3: jnp.ndarray):
    """(B, N, D) vertex data -> (B, F, 3, D) per-face corner data."""
    return vert_bxpxd[:, faces_fx3]


def render_mesh_color(
    pixel_xy_1xpx2: jnp.ndarray,
    pixel_range_1xpx2: jnp.ndarray,
    points3d_bxpx3: jnp.ndarray,
    points2d_bxpx2: jnp.ndarray,
    feat_bxpxd: jnp.ndarray,
    faces_fx3: jnp.ndarray,
    k: int = 30,
    depth: bool = False,
    chunk: int = 1024,
    pixel_chunk: int = 8192,
    bin_cand: int = 0,
    bin_sort: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Full render: per-vertex RGBA logits -> composited image.

    Returns (color (B, P, D-2), mask (B, P, 1), depth or None).
    Mirrors rendermeshcolor: features pass through sigmoid; when `depth`
    the first feature channel is camera z (not squashed).
    """
    if depth:
        d_chan = points3d_bxpx3[..., 2:3]
        feat = jnp.concatenate(
            [d_chan, jax.nn.sigmoid(feat_bxpxd)], axis=-1
        )
    else:
        feat = jax.nn.sigmoid(feat_bxpxd)

    face_z = vertex2face(points3d_bxpx3[..., 2:3], faces_fx3)[..., 0]
    face_img = vertex2face(points2d_bxpx2, faces_fx3)
    face_feat = vertex2face(feat, faces_fx3)

    layers, _ = deftet_sparse_render(
        pixel_xy_1xpx2, pixel_range_1xpx2, face_z, face_img, face_feat,
        k=k, chunk=chunk, pixel_chunk=pixel_chunk, bin_cand=bin_cand,
        bin_sort=bin_sort,
    )
    if depth:
        im_depth = layers[..., :1]
        layers = layers[..., 1:]
    else:
        im_depth = None
    return peel2mask(layers, im_depth)
