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
  * screen-space candidate binning (``bin_cand`` > 0) — the CUDA original
    is one-thread-per-pixel over ALL faces; the XLA scan shares that
    O(P·F) cost.  Binning first sorts pixels into raster order (so each
    pixel tile covers a thin screen strip), then per tile compacts the
    face ids whose screen bbox overlaps the tile's bbox into a fixed
    ``bin_cand``-slot candidate list (one O(F) cumsum-scatter — no sort),
    and runs the hit pass over candidates only.  Typical strips overlap
    a few % of the faces, so the per-pixel work drops ~F/bin_cand-fold.
    Binning is exact whenever the per-tile overlap count fits
    ``bin_cand`` (overflow drops the highest-indexed faces; see
    ``bin_overflow`` for a diagnostic).
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


def _topk_desc(vals, k: int):
    """Exact descending top-k (values, positions).

    ``lax.approx_max_k`` at ``recall_target=1.0`` is exact and lowers to
    the TPU-native PartialReduce top-k instead of a full per-row sort —
    the hit pass calls this once per (pixel tile, face chunk), so at
    full-frame scale (~5k calls of a (2048, k+chunk) merge per frame)
    the sort-vs-partial-reduce difference dominates the render cost.
    Tie order between equal values is unspecified (ties only occur at
    the _NEG empty-slot sentinel, whose order is irrelevant).
    """
    return jax.lax.approx_max_k(vals, k, recall_target=1.0)


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


def _hit_topk_ids(
    pix_px2, range_px2, face_z_fx3, face_img_fx3x2, face_id_f,
    chunk: int, k: int
):
    """Per pixel: indices + z of the k nearest covering faces (one sample).

    ``face_id_f`` carries each row's GLOBAL face index (-1 = dead row:
    padding, or an unfilled candidate slot).  Runs fully under
    stop_gradient semantics (int indices out).
    """
    z_pad, _ = pad_axis(face_z_fx3, 0, chunk, 0.0)
    img_pad, _ = pad_axis(face_img_fx3x2, 0, chunk, 0.0)
    id_pad, _ = pad_axis(face_id_f, 0, chunk, -1)
    p = pix_px2.shape[0]

    init = (
        jnp.full((p, k), _NEG, dtype=jnp.float32),   # best z (desc)
        jnp.full((p, k), -1, dtype=jnp.int32),       # face idx
    )

    def body(carry, chunk_items, start):
        del start
        best_z, best_i = carry
        zc, imgc, idc = chunk_items  # (chunk, 3), (chunk, 3, 2), (chunk,)
        w0, w1, w2 = barycentric_2d(
            pix_px2[:, None, :], imgc[None, :, :, :]
        )  # (P, chunk)
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        z = (
            w0 * zc[None, :, 0] + w1 * zc[None, :, 1] + w2 * zc[None, :, 2]
        )
        ids = jnp.broadcast_to(idc[None, :], z.shape)
        in_range = (z >= range_px2[:, :1]) & (z <= range_px2[:, 1:2])
        ok = inside & in_range & (ids >= 0)
        z = jnp.where(ok, z, _NEG)
        ids = jnp.where(ok, ids, -1)
        # merge with running top-k (concat then exact partial-reduce)
        all_z = jnp.concatenate([best_z, z], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        top_z, pos = _topk_desc(all_z, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_z, top_i

    best_z, best_i = chunked_scan_reduce(
        (z_pad, img_pad, id_pad), init, body, chunk
    )
    return best_z, best_i


def _hit_topk_ids_counted(
    pix_px2, range_px2, face_z_fx3, face_img_fx3x2, face_id_f,
    chunk: int, k: int
):
    """`_hit_topk_ids` that ALSO returns the exact per-pixel hit count.

    The count rides the same chunked scan (one integer sum per chunk —
    fused, no extra memory pass), and is exact regardless of ``k``:
    callers can render optimistically at a small hinted k and check
    afterwards whether any pixel's true coverage exceeded it (the
    adaptive-peel audit without a separate counting dispatch).
    Returns (best_z (P, k), best_i (P, k), counts (P,) int32)."""
    z_pad, _ = pad_axis(face_z_fx3, 0, chunk, 0.0)
    img_pad, _ = pad_axis(face_img_fx3x2, 0, chunk, 0.0)
    id_pad, _ = pad_axis(face_id_f, 0, chunk, -1)
    p = pix_px2.shape[0]

    init = (
        jnp.full((p, k), _NEG, dtype=jnp.float32),
        jnp.full((p, k), -1, dtype=jnp.int32),
        jnp.zeros((p,), jnp.int32),
    )

    def body(carry, chunk_items, start):
        del start
        best_z, best_i, cnt = carry
        zc, imgc, idc = chunk_items
        w0, w1, w2 = barycentric_2d(
            pix_px2[:, None, :], imgc[None, :, :, :]
        )
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        z = (
            w0 * zc[None, :, 0] + w1 * zc[None, :, 1] + w2 * zc[None, :, 2]
        )
        ids = jnp.broadcast_to(idc[None, :], z.shape)
        in_range = (z >= range_px2[:, :1]) & (z <= range_px2[:, 1:2])
        ok = inside & in_range & (ids >= 0)
        z = jnp.where(ok, z, _NEG)
        ids = jnp.where(ok, ids, -1)
        all_z = jnp.concatenate([best_z, z], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        top_z, pos = _topk_desc(all_z, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_z, top_i, cnt + jnp.sum(ok.astype(jnp.int32), axis=1)

    return chunked_scan_reduce(
        (z_pad, img_pad, id_pad), init, body, chunk
    )


def _hit_counts(
    pix_px2, range_px2, face_z_fx3, face_img_fx3x2, face_id_f, chunk: int
):
    """Per-pixel COUNT of covering faces (no top-k, no ordering).

    The k-deep peel merge is the rasterizer's dominant cost on TPU —
    top-k at k=120 measures ~150x the pure traffic floor of the same
    scan (approx_max_k/top_k/sort are all slow at that shape), while
    this counting scan runs at the floor.  Counting first lets callers
    pick the smallest k that is EXACT for the actual scene (k >= max
    per-pixel hits ⇒ identical peel output; the static k=120 budget is
    90%+ sentinel slots on carved scenes).
    """
    z_pad, _ = pad_axis(face_z_fx3, 0, chunk, 0.0)
    img_pad, _ = pad_axis(face_img_fx3x2, 0, chunk, 0.0)
    id_pad, _ = pad_axis(face_id_f, 0, chunk, -1)
    p = pix_px2.shape[0]
    init = jnp.zeros((p,), jnp.int32)

    def body(carry, chunk_items, start):
        del start
        zc, imgc, idc = chunk_items
        w0, w1, w2 = barycentric_2d(
            pix_px2[:, None, :], imgc[None, :, :, :]
        )
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        z = (
            w0 * zc[None, :, 0] + w1 * zc[None, :, 1] + w2 * zc[None, :, 2]
        )
        ids = jnp.broadcast_to(idc[None, :], z.shape)
        ok = (
            inside
            & (z >= range_px2[:, :1]) & (z <= range_px2[:, 1:2])
            & (ids >= 0)
        )
        return carry + jnp.sum(ok.astype(jnp.int32), axis=1)

    return chunked_scan_reduce((z_pad, img_pad, id_pad), init, body, chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def hit_count_max(
    pixrange_px4, face_z_fx3, face_img_fx3x2, chunk: int = 2048
):
    """Max per-pixel covering-face count over these pixels (full face
    list).  The k-calibration oracle: any peel depth >= this value makes
    the k-truncated render exact for these pixels.  One cheap full scan
    (pure coverage counting, no top-k)."""
    face_id = jnp.arange(face_z_fx3.shape[0], dtype=jnp.int32)
    counts = _hit_counts(
        pixrange_px4[..., :2], pixrange_px4[..., 2:], face_z_fx3,
        face_img_fx3x2, face_id, chunk,
    )
    return jnp.max(counts)


@functools.partial(jax.jit, static_argnames=("chunk", "k"))
def _hit_topk_single(
    pix_px2, range_px2, face_z_fx3, face_img_fx3x2, chunk: int, k: int
):
    """Unbinned hit pass over the full face list."""
    face_id = jnp.arange(face_z_fx3.shape[0], dtype=jnp.int32)
    return _hit_topk_ids(
        pix_px2, range_px2, face_z_fx3, face_img_fx3x2, face_id, chunk, k
    )


def _tile_candidates(
    tile_lo_2, tile_hi_2, fmin_fx2, fmax_fx2, n_cand: int
):
    """Face ids whose screen bbox overlaps [tile_lo, tile_hi].

    Static-shape compaction: one cumsum assigns each overlapping face a
    slot; ids beyond ``n_cand`` fall into a dump slot that is sliced off.
    Returns (cand (n_cand,) int32 ascending, -1 padded; overflow scalar).
    """
    ok = (
        (fmin_fx2[:, 0] <= tile_hi_2[0])
        & (fmax_fx2[:, 0] >= tile_lo_2[0])
        & (fmin_fx2[:, 1] <= tile_hi_2[1])
        & (fmax_fx2[:, 1] >= tile_lo_2[1])
    )
    pos = jnp.cumsum(ok.astype(jnp.int32)) - 1
    dest = jnp.where(ok & (pos < n_cand), pos, n_cand)
    cand = (
        jnp.full((n_cand + 1,), -1, dtype=jnp.int32)
        .at[dest]
        .set(jnp.arange(ok.shape[0], dtype=jnp.int32), mode="drop")
    )[:n_cand]
    overflow = jnp.maximum(pos[-1] + 1 - n_cand, 0)
    return cand, overflow


@functools.partial(
    jax.jit, static_argnames=("chunk", "k", "n_cand")
)
def _hit_topk_binned(
    pixrange_px4, face_z_fx3, face_img_fx3x2, fmin_fx2, fmax_fx2,
    chunk: int, k: int, n_cand: int
):
    """Binned hit pass for ONE pixel tile: cull faces by the tile's
    screen bbox, then scan candidates only.  Face bboxes are computed
    once by the caller (they are tile-invariant; recomputing per tile
    reads the full (F, 3, 2) array per tile — ~2.8 GB/frame at 1.5M
    faces)."""
    pix = pixrange_px4[..., :2]
    ranges = pixrange_px4[..., 2:]
    cand, _ = _tile_candidates(
        jnp.min(pix, axis=0), jnp.max(pix, axis=0), fmin_fx2, fmax_fx2,
        n_cand,
    )
    safe = jnp.maximum(cand, 0)
    z_c = face_z_fx3[safe]
    img_c = face_img_fx3x2[safe]
    return _hit_topk_ids(pix, ranges, z_c, img_c, cand, chunk, k)


def _edge_pad_rows(x, multiple: int):
    """Pad axis 0 to a multiple by repeating the last row — keeps the
    final tile's bbox tight (zero padding would stretch it to the
    origin and inflate its candidate count ~10x)."""
    n = x.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    return jnp.concatenate(
        [x, jnp.tile(x[-1:], (target - n,) + (1,) * (x.ndim - 1))], axis=0
    )


def bin_overlap_max_np(
    face_img_fx3x2, pix_px2, pixel_chunk: int, sort: bool = True
) -> int:
    """Host-side (numpy) max per-tile bbox-overlap count.

    The calibration oracle for ``bin_cand``: any budget >= this value
    makes the binned render exact for these pixels/faces.  Pure numpy —
    per-view TPU dispatch (and its compile) would cost more than the
    stage it calibrates.  ``sort`` must mirror the render's
    ``bin_sort`` (False = the caller's pixel order defines the tiles).
    """
    import numpy as np

    pix = np.asarray(pix_px2, dtype=np.float32)
    if sort:
        order = np.lexsort((pix[:, 0], pix[:, 1]))
        pix = pix[order]
    n = pix.shape[0]
    target = -(-n // pixel_chunk) * pixel_chunk
    if target != n:
        pix = np.concatenate(
            [pix, np.tile(pix[-1:], (target - n, 1))], axis=0
        )
    tiles = pix.reshape(-1, pixel_chunk, 2)
    lo, hi = tiles.min(axis=1), tiles.max(axis=1)     # (T, 2)
    face_img = np.asarray(face_img_fx3x2)
    fmin, fmax = face_img.min(axis=1), face_img.max(axis=1)  # (F, 2)
    worst = 0
    for t in range(lo.shape[0]):
        ok = (
            (fmin[:, 0] <= hi[t, 0]) & (fmax[:, 0] >= lo[t, 0])
            & (fmin[:, 1] <= hi[t, 1]) & (fmax[:, 1] >= lo[t, 1])
        )
        worst = max(worst, int(ok.sum()))
    return worst


def bin_overflow(
    face_img_fx3x2, pix_px2, pixel_chunk: int, n_cand: int
) -> int:
    """Diagnostic: max per-tile candidate overflow for a given binning
    config (0 = binned render is exact).  Mirrors the tiling the binned
    path would use on these pixels."""
    order = jnp.lexsort((pix_px2[:, 0], pix_px2[:, 1]))
    pix = _edge_pad_rows(pix_px2[order], pixel_chunk)
    tiles = pix.reshape(-1, pixel_chunk, 2)
    fmin = jnp.min(face_img_fx3x2, axis=1)
    fmax = jnp.max(face_img_fx3x2, axis=1)

    def one(tile):
        _, over = _tile_candidates(
            jnp.min(tile, axis=0), jnp.max(tile, axis=0), fmin, fmax,
            n_cand,
        )
        return over

    return int(jnp.max(jax.lax.map(one, tiles)))


def deftet_sparse_render(
    pixel_coords_1xpx2: jnp.ndarray,
    render_ranges_1xpx2: jnp.ndarray,
    face_vertices_z_bxfx3: jnp.ndarray,
    face_vertices_image_bxfx3x2: jnp.ndarray,
    face_features_bxfx3xc: jnp.ndarray,
    k: int = 30,
    chunk: int = 1024,
    pixel_chunk: int = 8192,
    bin_cand: int = 0,
    bin_sort: bool = True,
):
    """Render k depth-peeled feature layers per pixel.

    Returns (features (B, P, k, C), face_idx (B, P, k) int32, -1 where no
    face).  Larger camera z = closer (faces are peeled front to back).
    Differentiable w.r.t. face z, image positions, and features via
    recompute on the selected faces.

    ``bin_cand`` > 0 enables screen-space candidate binning: pixels are
    sorted into raster order, each ``pixel_chunk`` tile culls the face
    list to the ≤ ``bin_cand`` faces whose bbox overlaps the tile, and
    the O(P·F) hit scan runs over candidates only.  Exact as long as no
    tile overlaps more than ``bin_cand`` faces (check with
    ``bin_overflow``); prefer ``bin_cand`` ≥ a few × the expected strip
    overlap.

    ``bin_sort=False`` keeps the caller's pixel order: each consecutive
    ``pixel_chunk`` run of pixels becomes one bin tile as-is.  Callers
    that sample pixels in compact screen tiles (e.g. whole 16x16 blocks,
    see optimize's tile sampling) get far tighter tile bboxes than the
    raster-order sort can make from scattered pixels — at 1.5M faces a
    16x16 block overlaps ~25k faces worst-case where a strip of the
    same pixel count overlaps ~10x more.
    """
    pix = pixel_coords_1xpx2[0].astype(jnp.float32)
    ranges = render_ranges_1xpx2[0].astype(jnp.float32)
    b = face_vertices_z_bxfx3.shape[0]
    p = pix.shape[0]
    n_faces = face_vertices_z_bxfx3.shape[1]
    if bin_cand >= n_faces:
        bin_cand = 0  # culling can't help; use the plain path
    # Never tile wider than the (padded) pixel count: the hit scan does
    # (P_tile, face_chunk) work per face chunk regardless of how many
    # pixels are real, so an 8192 tile around a 400-pixel training batch
    # is 95% padding waste (measured the whole round-1 render step).
    pixel_chunk = min(pixel_chunk, -(-p // 512) * 512)

    if bin_cand:
        # raster-order sort -> each tile covers a thin screen strip, so
        # the bbox cull bites even for randomly sampled training pixels.
        if bin_sort:
            order = jnp.lexsort((pix[:, 0], pix[:, 1]))
            inv = jnp.argsort(order)
            pix_t, ranges_t = pix[order], ranges[order]
        else:
            inv = jnp.arange(p, dtype=jnp.int32)
            pix_t, ranges_t = pix, ranges
        packed = _edge_pad_rows(
            jnp.concatenate([pix_t, ranges_t], axis=-1),
            pixel_chunk,
        )

        def select(z_fx3, img_fx3x2):
            fmin = jnp.min(img_fx3x2, axis=1)  # (F, 2) — tile-invariant
            fmax = jnp.max(img_fx3x2, axis=1)
            out = query_tiled(
                lambda pc_rc: _hit_topk_binned(
                    pc_rc, z_fx3, img_fx3x2, fmin, fmax, chunk, k,
                    bin_cand,
                ),
                packed,
                pixel_chunk,
            )
            return jax.tree_util.tree_map(lambda x: x[:p][inv], out)

    else:

        def select(z_fx3, img_fx3x2):
            return query_tiled(
                lambda pc_rc: _hit_topk_single(
                    pc_rc[..., :2], pc_rc[..., 2:], z_fx3, img_fx3x2,
                    chunk, k,
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
