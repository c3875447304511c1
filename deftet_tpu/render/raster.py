"""Depth-peeled differentiable rasterizer (TPU-native).

Equivalent of kaolin's ``deftet_sparse_render`` CUDA kernel, designed from
its call contract at diff_render/.../5_rendereq/deftetrneder.py:97-111:

  inputs : pixel_coords (1, P, 2), per-pixel depth ranges (1, P, 2),
           face vertex z (B, F, 3), face vertex image xy (B, F, 3, 2),
           face vertex features (B, F, 3, C), k (peel depth)
  output : (B, P, k, C) features of the k closest faces covering each
           pixel (closest first), plus (B, P, k) face indices (-1 = none).

TPU design (no per-pixel linked lists / atomics as in the CUDA original):

  * forward hit+sort pass — a scan over face chunks; each chunk computes
    the (P_tile, chunk) coverage mask + interpolated z on the VPU, then
    merges its per-pixel top-k (by descending camera z = nearest first,
    pixel2mesh convention: camera looks down +z after projection flip)
    into a running (P_tile, k) buffer via concat + top_k.  Entirely
    argsort-free.  This pass runs under stop_gradient.
  * differentiable replay — gather the selected faces' vertex data and
    recompute barycentric weights + feature interpolation in plain JAX, so
    gradients flow to the 2D vertex positions AND features exactly like the
    reference's analytic backward, without hand-derived kernels.

Pixels are tiled by `pixel_chunk` (the same query-tiling pattern as
ops/nearest.py) so the live (P_tile, chunk) tile stays VMEM-sized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.tiling import chunked_scan_reduce, pad_axis, query_tiled

_NEG = -1.0e10


def _edge(ax, ay, bx, by, px, py):
    """2D cross product (b - a) x (p - a)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def barycentric_2d(pix_xy, tri_xy, eps: float = 1e-12):
    """Barycentric weights of pixels in 2D triangles.

    pix_xy: (..., 2); tri_xy: (..., 3, 2) broadcastable against pix.
    Returns (w0, w1, w2) each (...,).
    """
    ax, ay = tri_xy[..., 0, 0], tri_xy[..., 0, 1]
    bx, by = tri_xy[..., 1, 0], tri_xy[..., 1, 1]
    cx, cy = tri_xy[..., 2, 0], tri_xy[..., 2, 1]
    px, py = pix_xy[..., 0], pix_xy[..., 1]
    denom = _edge(ax, ay, bx, by, cx, cy)
    denom_safe = jnp.where(jnp.abs(denom) < eps, 1.0, denom)
    w2 = _edge(ax, ay, bx, by, px, py) / denom_safe
    w0 = _edge(bx, by, cx, cy, px, py) / denom_safe
    w1 = 1.0 - w0 - w2
    return w0, w1, w2


@functools.partial(jax.jit, static_argnames=("chunk", "k"))
def _hit_topk_single(
    pix_px2, range_px2, face_z_fx3, face_img_fx3x2, chunk: int, k: int
):
    """Per pixel: indices + z of the k nearest covering faces (one sample).

    Runs fully under stop_gradient semantics (int indices out).
    """
    f = face_z_fx3.shape[0]
    z_pad, n_valid = pad_axis(face_z_fx3, 0, chunk, 0.0)
    img_pad, _ = pad_axis(face_img_fx3x2, 0, chunk, 0.0)
    p = pix_px2.shape[0]

    init = (
        jnp.full((p, k), _NEG, dtype=jnp.float32),   # best z (desc)
        jnp.full((p, k), -1, dtype=jnp.int32),       # face idx
    )

    def body(carry, chunk_items, start):
        best_z, best_i = carry
        zc, imgc = chunk_items  # (chunk, 3), (chunk, 3, 2)
        w0, w1, w2 = barycentric_2d(
            pix_px2[:, None, :], imgc[None, :, :, :]
        )  # (P, chunk)
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        z = (
            w0 * zc[None, :, 0] + w1 * zc[None, :, 1] + w2 * zc[None, :, 2]
        )
        ids = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + start
        in_range = (z >= range_px2[:, :1]) & (z <= range_px2[:, 1:2])
        ok = inside & in_range & (ids < n_valid)
        z = jnp.where(ok, z, _NEG)
        ids = jnp.where(ok, ids, -1)
        # merge with running top-k (concat then top_k on z)
        all_z = jnp.concatenate([best_z, z], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        top_z, pos = jax.lax.top_k(all_z, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_z, top_i

    best_z, best_i = chunked_scan_reduce(
        (z_pad, img_pad), init, body, chunk
    )
    return best_z, best_i


def deftet_sparse_render(
    pixel_coords_1xpx2: jnp.ndarray,
    render_ranges_1xpx2: jnp.ndarray,
    face_vertices_z_bxfx3: jnp.ndarray,
    face_vertices_image_bxfx3x2: jnp.ndarray,
    face_features_bxfx3xc: jnp.ndarray,
    k: int = 30,
    chunk: int = 1024,
    pixel_chunk: int = 8192,
):
    """Render k depth-peeled feature layers per pixel.

    Returns (features (B, P, k, C), face_idx (B, P, k) int32, -1 where no
    face).  Larger camera z = closer (faces are peeled front to back).
    Differentiable w.r.t. face z, image positions, and features via
    recompute on the selected faces.
    """
    pix = pixel_coords_1xpx2[0].astype(jnp.float32)
    ranges = render_ranges_1xpx2[0].astype(jnp.float32)
    b = face_vertices_z_bxfx3.shape[0]
    # Never tile wider than the (padded) pixel count: the hit scan does
    # (P_tile, face_chunk) work per face chunk regardless of how many
    # pixels are real, so an 8192 tile around a 400-pixel training batch
    # is 95% padding waste (measured the whole round-1 render step).
    pixel_chunk = min(pixel_chunk, -(-pix.shape[0] // 512) * 512)

    def select(z_fx3, img_fx3x2):
        return query_tiled(
            lambda pc_rc: _hit_topk_single(
                pc_rc[..., :2], pc_rc[..., 2:], z_fx3, img_fx3x2, chunk, k
            ),
            jnp.concatenate([pix, ranges], axis=-1),
            pixel_chunk,
        )

    # NOTE query_tiled expects (P, 3)-ish; pack pix+range as (P, 4).
    _, idx = jax.vmap(select)(
        jax.lax.stop_gradient(face_vertices_z_bxfx3),
        jax.lax.stop_gradient(face_vertices_image_bxfx3x2),
    )  # (B, P, k)

    # ---- differentiable replay on the selected faces --------------------
    safe_idx = jnp.maximum(idx, 0)
    tri_img = jnp.take_along_axis(
        face_vertices_image_bxfx3x2,
        safe_idx.reshape(b, -1)[:, :, None, None],
        axis=1,
    ).reshape(idx.shape + (3, 2))  # (B, P, k, 3, 2)
    tri_feat = jnp.take_along_axis(
        face_features_bxfx3xc,
        safe_idx.reshape(b, -1)[:, :, None, None],
        axis=1,
    ).reshape(idx.shape + face_features_bxfx3xc.shape[2:])  # (B,P,k,3,C)

    w0, w1, w2 = barycentric_2d(pix[None, :, None, :], tri_img)
    feat = (
        w0[..., None] * tri_feat[..., 0, :]
        + w1[..., None] * tri_feat[..., 1, :]
        + w2[..., None] * tri_feat[..., 2, :]
    )  # (B, P, k, C)
    feat = jnp.where((idx >= 0)[..., None], feat, 0.0)
    return feat, idx
