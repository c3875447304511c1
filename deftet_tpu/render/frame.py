"""Full-frame rendering via host-binned screen tiles (the eval fast path).

The in-jit strip binning in ``raster.deftet_sparse_render`` pays ONE
static candidate budget — the worst tile's — for every tile: at
post-subdivision scenes (1.5M faces) the worst 2048-pixel strip overlaps
~70k faces while the MEAN 16x16 tile overlaps ~3k, so a uniform budget
wastes >20x the necessary hit-scan work (measured on the q8 sub2 state;
see RESULTS.md round-4 notes).

This module splits the work the TPU-idiomatic way:

  host (numpy)  — the irregular part: project faces, build exact
                  per-tile candidate lists (corner-difference integral
                  image + one CSR sort, O(F + pairs)), group tiles into
                  pow-2 budget buckets;
  device (jit)  — the dense part: for each bucket, ONE fixed-shape
                  vmapped hit kernel over (tiles, 256 px, cand) + the
                  shared differentiable replay/composite, reusing the
                  exact same `_hit_topk_ids` / barycentric math as the
                  in-jit path (bit-identical hit decisions).

Only the per-tile *budget* adapts (to the tile's true candidate count,
rounded up to a bucket) — every candidate list is exact by
construction, so the render equals the unbinned one everywhere.

Equivalent of the kaolin deftet_sparse_render full-frame use at
diff_render/.../6_optim/optim_with_mask_subdiv_from_gridmov.py:330-384
(test-time full-image rendering), which the CUDA original serves with
per-pixel linked lists; a TPU has no atomics, but it has a host.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .composite import peel2mask
from .raster import _hit_topk_ids, barycentric_2d

# host/device projections of the same face can differ by float rounding;
# bboxes are expanded by this NDC margin so the host cull stays a
# superset of what the device hit test can accept (1e-5 NDC = 1/500 px
# at 400^2 — far beyond f32 vs f64 projection drift).
_BBOX_EPS = 1e-5


def tile_pixel_layout(h: int, w: int, tile: int):
    """Static per-tile pixel index layout for an (h, w) frame.

    Returns (pix_idx (T, tile*tile) int32 linear pixel indices — edge
    tiles padded by repeating their last in-tile pixel, harmless because
    assembly scatters by pixel index (duplicates rewrite the same
    value) — plus the tile grid shape (ny, nx)).
    """
    ny, nx = -(-h // tile), -(-w // tile)
    out = np.empty((ny * nx, tile * tile), np.int32)
    for ty in range(ny):
        ys = np.arange(ty * tile, min((ty + 1) * tile, h))
        for tx in range(nx):
            xs = np.arange(tx * tile, min((tx + 1) * tile, w))
            lin = (ys[:, None] * w + xs[None, :]).reshape(-1)
            if lin.size < tile * tile:
                lin = np.concatenate(
                    [lin, np.full(tile * tile - lin.size, lin[-1], np.int32)]
                )
            out[ty * nx + tx] = lin
    return out, (ny, nx)


def build_frame_bins(
    face_img_fx3x2: np.ndarray,
    h: int,
    w: int,
    tile: int = 16,
    min_budget: int = 4096,
) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """Exact per-tile candidate lists, grouped into pow-2 budget buckets.

    Returns {budget: (tile_ids (T_b,), cand (T_b, budget) int32 asc,
    -1-padded)}.  Every face whose screen bbox overlaps a tile's pixel
    area appears in that tile's list (candidate superset => exact
    render).  Faces whose bbox misses the whole pixel grid are dropped —
    they cannot cover any pixel center.
    """
    fmin = face_img_fx3x2.min(axis=1) - _BBOX_EPS  # (F, 2) NDC
    fmax = face_img_fx3x2.max(axis=1) + _BBOX_EPS
    ny, nx = -(-h // tile), -(-w // tile)
    # pixel centers: x = (i+.5)/w*2-1, y = -((j+.5)/h*2-1).  A tile's
    # pixel-center bbox is [lo_center, hi_center]; overlap in centers is
    # what the hit test can accept.
    # face bbox -> covered tile index range (on the pixel-center grid)
    #   x: center_i >= fmin  =>  i >= ((fmin+1)/2*w - .5)
    ix0 = np.ceil((fmin[:, 0] + 1.0) * 0.5 * w - 0.5)
    ix1 = np.floor((fmax[:, 0] + 1.0) * 0.5 * w - 0.5)
    # y NDC decreases with row index j: y_j = -((j+.5)/h*2-1)
    iy0 = np.ceil((1.0 - fmax[:, 1]) * 0.5 * h - 0.5)
    iy1 = np.floor((1.0 - fmin[:, 1]) * 0.5 * h - 0.5)
    on = (ix1 >= 0) & (ix0 <= w - 1) & (iy1 >= 0) & (iy0 <= h - 1)
    on &= ix0 <= ix1  # degenerate sub-pixel bbox between two centers
    on &= iy0 <= iy1
    tx0 = (np.clip(ix0, 0, w - 1)[on] // tile).astype(np.int64)
    tx1 = (np.clip(ix1, 0, w - 1)[on] // tile).astype(np.int64)
    ty0 = (np.clip(iy0, 0, h - 1)[on] // tile).astype(np.int64)
    ty1 = (np.clip(iy1, 0, h - 1)[on] // tile).astype(np.int64)
    fid = np.nonzero(on)[0].astype(np.int64)

    # expand (face, covered-tile-rect) to flat (tile, face) pairs
    nx_span = tx1 - tx0 + 1
    ny_span = ty1 - ty0 + 1
    span = (nx_span * ny_span).astype(np.int64)
    total = int(span.sum())
    rep = np.repeat(np.arange(fid.shape[0]), span)
    # per-pair offset within its face's rect
    off = np.arange(total) - np.repeat(np.cumsum(span) - span, span)
    dx = off % nx_span[rep]
    dy = off // nx_span[rep]
    tidx = (ty0[rep] + dy) * nx + (tx0[rep] + dx)
    pairs_face = fid[rep]

    order = np.argsort(tidx, kind="stable")  # stable: faces stay ascending
    tidx = tidx[order]
    pairs_face = pairs_face[order]
    counts = np.bincount(tidx, minlength=ny * nx)
    starts = np.concatenate([[0], np.cumsum(counts)])

    # Group non-empty tiles into power-of-FOUR budget buckets (floored
    # at min_budget): coarser than pow-2 wastes <=4x scan work on the
    # boundary tiles, but each distinct budget is one more compiled
    # executable per topology — and at TPU compile costs (tens of
    # seconds each over the remote service) 3 kernels beat 7 long
    # before the extra scan work matters.
    buckets: Dict[int, Tuple[List[int], List[np.ndarray]]] = {}
    nonempty = np.nonzero(counts)[0]
    for t in nonempty:
        c = int(counts[t])
        budget = min_budget
        while budget < c:
            budget *= 4
        ids, lists = buckets.setdefault(budget, ([], []))
        ids.append(int(t))
        lists.append(pairs_face[starts[t]: starts[t] + c])
    out = {}
    for budget, (ids, lists) in buckets.items():
        cand = np.full((len(ids), budget), -1, np.int32)
        for i, lst in enumerate(lists):
            cand[i, : lst.shape[0]] = lst
        out[budget] = (np.asarray(ids, np.int32), cand)
    return out


@functools.partial(jax.jit, static_argnames=("chunk", "k"))
def _bucket_hit(
    pix_txpx2, range_txpx2, cand_txc, face_z_fx3, face_img_fx3x2,
    chunk: int, k: int,
):
    """Hit pass for one budget bucket: vmap over tiles, each gathering
    its own candidates and scanning them with the shared kernel."""

    def one(pix, rng, cand):
        safe = jnp.maximum(cand, 0)
        return _hit_topk_ids(
            pix, rng, face_z_fx3[safe], face_img_fx3x2[safe], cand,
            chunk, k,
        )

    return jax.vmap(one)(pix_txpx2, range_txpx2, cand_txc)


@functools.partial(jax.jit, static_argnames=())
def _replay_composite(pix_px2, idx_pxk, face_img_fx3x2, face_feat_fx3xc):
    """Differentiable replay + alpha compositing for selected faces.

    Same math as raster.deftet_sparse_render's replay; returns
    (color (P, C-1), vis (P, 1))."""
    safe = jnp.maximum(idx_pxk, 0)
    tri_img = face_img_fx3x2[safe]      # (P, k, 3, 2)
    tri_feat = face_feat_fx3xc[safe]    # (P, k, 3, C)
    w0, w1, w2 = barycentric_2d(pix_px2[:, None, :], tri_img)
    feat = (
        w0[..., None] * tri_feat[..., 0, :]
        + w1[..., None] * tri_feat[..., 1, :]
        + w2[..., None] * tri_feat[..., 2, :]
    )
    feat = jnp.where((idx_pxk >= 0)[..., None], feat, 0.0)
    color, vis, _ = peel2mask(feat[None])
    return color[0], vis[0]


def render_frame_binned(
    face_z_fx3: jnp.ndarray,
    face_img_fx3x2: jnp.ndarray,
    face_feat_fx3xc: jnp.ndarray,
    face_img_np: np.ndarray,
    h: int,
    w: int,
    k: int = 120,
    chunk: int = 1024,
    tile: int = 16,
    z_range: Tuple[float, float] = (-1000.0, 0.0),
    replay_chunk: int = 16384,
):
    """Render a full (h, w) frame with per-tile-exact host binning.

    ``face_*`` are device arrays (features already activated, i.e.
    post-sigmoid [alpha, rgb...]); ``face_img_np`` is the host-side
    projection of the same faces (used only for culling — bboxes are
    eps-expanded so host/device rounding can't drop a device-visible
    face).  Returns (color (h, w, C-1), vis (h, w, 1)) numpy.
    """
    c_dim = int(face_feat_fx3xc.shape[-1]) - 1
    pix_idx, _ = tile_pixel_layout(h, w, tile)
    # NDC pixel centers, y up (same formula as optimize.pixel_grid)
    xs = (np.arange(w) + 0.5) / w * 2.0 - 1.0
    ys = -((np.arange(h) + 0.5) / h * 2.0 - 1.0)
    grid = np.stack(
        [np.tile(xs, h), np.repeat(ys, w)], axis=1
    ).astype(np.float32)

    bins = build_frame_bins(face_img_np, h, w, tile)

    color = np.ones((h * w, c_dim), np.float32)  # white background
    vis = np.zeros((h * w, 1), np.float32)
    lo, hi = z_range
    px = tile * tile

    def pow2ceil(n):
        return 1 << (max(n, 1) - 1).bit_length()

    for budget in sorted(bins):
        tile_ids, cand = bins[budget]
        # bound the live (T, px, cand) hit tile to ~32M candidate slots;
        # pad each slab's tile count to a power of two so compiled
        # shapes are (pow2, px, pow2-budget) — a bounded set across
        # views/frames instead of one executable per tile count.
        max_slab = max(1, (1 << 25) // max(budget, 1))
        t_total = tile_ids.shape[0]
        s = 0
        while s < t_total:
            t_s = min(max_slab, t_total - s, pow2ceil(t_total - s))
            t_pad = min(pow2ceil(t_s), max_slab)
            sl_ids = tile_ids[s: s + t_s]
            pix = grid[pix_idx[sl_ids]]                    # (t_s, px, 2)
            sl_cand = cand[s: s + t_s]
            if t_pad != t_s:  # dummy tiles: no candidates, origin pixels
                pix = np.concatenate(
                    [pix, np.zeros((t_pad - t_s, px, 2), np.float32)]
                )
                sl_cand = np.concatenate(
                    [sl_cand,
                     np.full((t_pad - t_s, budget), -1, np.int32)]
                )
            rng = np.broadcast_to(
                np.asarray([lo, hi], np.float32), pix.shape
            ).copy()
            _, idx = _bucket_hit(
                jnp.asarray(pix), jnp.asarray(rng), jnp.asarray(sl_cand),
                face_z_fx3, face_img_fx3x2, chunk, k,
            )  # (t_pad, px, k)
            flat_pix = pix[:t_s].reshape(-1, 2)
            flat_idx = np.asarray(idx)[:t_s].reshape(t_s * px, k)
            n_flat = flat_pix.shape[0]
            n_pad = -(-n_flat // replay_chunk) * replay_chunk
            if n_pad != n_flat:  # fixed replay shape: one executable
                flat_pix = np.concatenate(
                    [flat_pix,
                     np.zeros((n_pad - n_flat, 2), np.float32)]
                )
                flat_idx = np.concatenate(
                    [flat_idx,
                     np.full((n_pad - n_flat, k), -1, np.int32)]
                )
            cs, vs = [], []
            for r in range(0, n_pad, replay_chunk):
                cc, vv = _replay_composite(
                    jnp.asarray(flat_pix[r: r + replay_chunk]),
                    jnp.asarray(flat_idx[r: r + replay_chunk]),
                    face_img_fx3x2, face_feat_fx3xc,
                )
                cs.append(np.asarray(cc))
                vs.append(np.asarray(vv))
            lin = pix_idx[sl_ids].reshape(-1)
            color[lin] = np.concatenate(cs)[:n_flat]
            vis[lin] = np.concatenate(vs)[:n_flat]
            s += t_s
    return color.reshape(h, w, c_dim), vis.reshape(h, w, 1)
