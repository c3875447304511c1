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
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .raster import _edge, _hit_counts, _hit_topk_ids_counted

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

    # Sort pairs by (tile, face) via ONE packed-key np.sort — cheaper
    # than a stable argsort + permutation gathers at the ~10-50M pairs a
    # 1.5M-face scene produces, and faces stay ascending per tile by
    # construction of the key.
    n_faces = face_img_fx3x2.shape[0]
    key = tidx * np.int64(n_faces) + pairs_face
    key.sort()
    tidx = (key // n_faces).astype(np.int64)
    pairs_face = key % n_faces
    counts = np.bincount(tidx, minlength=ny * nx)
    starts = np.concatenate([[0], np.cumsum(counts)])
    # per-pair offset within its tile (tidx ascending)
    off = np.arange(key.shape[0], dtype=np.int64) - starts[tidx]

    # Group non-empty tiles into power-of-FOUR budget buckets (floored
    # at min_budget): coarser than pow-2 wastes <=4x scan work on the
    # boundary tiles, but each distinct budget is one more compiled
    # executable per topology — and at TPU compile costs (tens of
    # seconds each over the remote service) 3 kernels beat 7 long
    # before the extra scan work matters.  Bucket fill is a flat
    # scatter per bucket (no per-tile python loop).
    n_tiles = ny * nx
    budget_of = np.full(n_tiles, -1, np.int64)
    nonempty = counts > 0
    b = np.maximum(counts[nonempty], 1)
    exp = np.ceil(np.log2(np.maximum(b / min_budget, 1)) / 2.0)
    budget_of[nonempty] = min_budget * 4 ** exp.astype(np.int64)

    out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    pair_budget = budget_of[tidx]
    for budget in np.unique(budget_of[nonempty]):
        ids = np.nonzero(budget_of == budget)[0]
        rank = np.full(n_tiles, -1, np.int64)
        rank[ids] = np.arange(ids.shape[0])
        cand = np.full((ids.shape[0], int(budget)), -1, np.int32)
        m = pair_budget == budget
        cand.reshape(-1)[rank[tidx[m]] * int(budget) + off[m]] = (
            pairs_face[m]
        )
        out[int(budget)] = (ids.astype(np.int32), cand)
    return out


# NDC pixel-center grids, memoized ON DEVICE per (h, w): per-slab pixel
# coordinates are then shipped as (T, px) int32 linear indices (half the
# bytes of f32 (T, px, 2) coords) and gathered in-jit from this cached
# copy — bit-identical values, since the gather source IS the host grid.
_GRID_DEV_CACHE: Dict[Tuple[int, int], jnp.ndarray] = {}


def _grid_dev(h: int, w: int) -> jnp.ndarray:
    key = (h, w)
    if key not in _GRID_DEV_CACHE:
        xs = (np.arange(w) + 0.5) / w * 2.0 - 1.0
        ys = -((np.arange(h) + 0.5) / h * 2.0 - 1.0)
        grid = np.stack(
            [np.tile(xs, h), np.repeat(ys, w)], axis=1
        ).astype(np.float32)
        _GRID_DEV_CACHE[key] = jnp.asarray(grid)
    return _GRID_DEV_CACHE[key]


def _unpack_cand(cand_txc):
    """Widen a uint16-packed candidate slab back to int32 with -1 pads.

    Candidate ids are pure index data, and the axon tunnel moves h2d
    bytes at single-digit MB/s — at sub-64k-face scenes (every carved
    eval scene so far) packing the (T, budget) slab as uint16 with a
    0xFFFF pad sentinel halves the dominant per-frame transfer.  The
    widen runs in-jit (trace-time dtype dispatch), so device math is
    identical to the int32 path."""
    if cand_txc.dtype == jnp.uint16:
        dead = cand_txc == jnp.uint16(0xFFFF)
        return jnp.where(dead, jnp.int32(-1), cand_txc.astype(jnp.int32))
    return cand_txc


@functools.partial(jax.jit, static_argnames=("chunk", "lo", "hi"))
def _bucket_count(
    lin_txpx, grid_hwx2, cand_txc, face_z_fx3, face_img_fx3x2,
    chunk: int, lo: float, hi: float,
):
    """Max per-pixel hit count per tile — the k-calibration pass.

    Top-k peeling at k=120 costs ~150x the scan's traffic floor on this
    TPU (approx_max_k / top_k are the whole render cost), so every frame
    first counts its true per-pixel coverage with this (floor-speed)
    pass and then peels at the smallest exact k.  Returns (T,) int32."""
    cand_txc = _unpack_cand(cand_txc)
    rng_2 = jnp.asarray([lo, hi], jnp.float32)

    def one(lin, cand):
        pix = grid_hwx2[lin]
        safe = jnp.maximum(cand, 0)
        counts = _hit_counts(
            pix, jnp.broadcast_to(rng_2, pix.shape),
            face_z_fx3[safe], face_img_fx3x2[safe], cand, chunk,
        )
        return jnp.max(counts)

    return jax.vmap(one)(lin_txpx, cand_txc)


@functools.partial(jax.jit, static_argnames=("chunk", "k", "lo", "hi"))
def _bucket_render(
    lin_txpx, grid_hwx2, cand_txc, face_z_fx3, face_img_fx3x2,
    face_feat_fx3xc, chunk: int, k: int, lo: float, hi: float,
):
    """Fused hit + replay + composite for one budget bucket.

    ONE device dispatch per bucket slab (the round-4 split hit /
    chunked-replay design cost ~11 round trips per 400^2 frame; over
    the remote-tunnel TPU each trip is hundreds of ms, which dominated
    small-scene frames — BENCH_r04 frame_scene_mpix_s 0.03).  vmap over
    tiles; each tile gathers its own candidates, scans them with the
    shared hit kernel, then replays + alpha-composites its own pixels.
    Returns (color (T, px, C-1), vis (T, px, 1), max_hits (T,))."""
    cand_txc = _unpack_cand(cand_txc)
    rng_2 = jnp.asarray([lo, hi], jnp.float32)
    c_total = face_feat_fx3xc.shape[-1]
    eps = 1e-10

    def one(lin, cand):
        pix = grid_hwx2[lin]
        safe = jnp.maximum(cand, 0)
        _, idx, n_hits = _hit_topk_ids_counted(
            pix, jnp.broadcast_to(rng_2, pix.shape),
            face_z_fx3[safe], face_img_fx3x2[safe], cand, chunk, k,
        )
        # Differentiable-replay math (same as raster's replay; the hit
        # ids are global face indices).  Structure-of-arrays on purpose:
        # an AoS gather to (px, k, 3, C) puts the tiny (3, C) dims in
        # the (8, 128) register tile — 42x HBM padding, a 32 GB compile-
        # time allocation at a 512-tile slab.  Per-component (px, k)
        # gathers keep k in the lane dim.
        safe_i = jnp.maximum(idx, 0)  # (px, k)
        corner = [
            [face_img_fx3x2[:, j, c][safe_i] for c in range(2)]
            for j in range(3)
        ]
        ax, ay = corner[0]
        bx, by = corner[1]
        cx, cy = corner[2]
        px_, py_ = pix[:, None, 0], pix[:, None, 1]
        denom = _edge(ax, ay, bx, by, cx, cy)
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        w2 = _edge(ax, ay, bx, by, px_, py_) / denom
        w0 = _edge(bx, by, cx, cy, px_, py_) / denom
        w1 = 1.0 - w0 - w2
        dead = idx < 0
        chans = []
        for c in range(c_total):
            f0 = face_feat_fx3xc[:, 0, c][safe_i]
            f1 = face_feat_fx3xc[:, 1, c][safe_i]
            f2 = face_feat_fx3xc[:, 2, c][safe_i]
            chans.append(
                jnp.where(dead, 0.0, w0 * f0 + w1 * f1 + w2 * f2)
            )
        # front-to-back alpha compositing (composite.peel2mask, SoA)
        alpha = jnp.clip(chans[0], eps, 1.0 - eps)      # (px, k)
        shifted = jnp.concatenate(
            [jnp.ones_like(alpha[:, :1]), 1.0 - alpha[:, :-1]], axis=1
        )
        vis = alpha * jnp.cumprod(shifted, axis=1)       # (px, k)
        out_vis = jnp.sum(vis, axis=1, keepdims=True)    # (px, 1)
        color = jnp.stack(
            [
                jnp.sum(chans[c] * vis, axis=1) + (1.0 - out_vis[:, 0])
                for c in range(1, c_total)
            ],
            axis=-1,
        )                                                # (px, C-1)
        # exact per-tile max coverage — free audit riding the hit scan
        # (counts all candidates independent of k; see
        # _hit_topk_ids_counted), lets callers render at a HINTED small
        # k and verify afterwards instead of paying a separate counting
        # dispatch + sync per frame.
        return color, out_vis, jnp.max(n_hits)

    return jax.vmap(one)(lin_txpx, cand_txc)


def _pow2ceil(n: int) -> int:
    return 1 << (max(n, 1) - 1).bit_length()


class PendingFrame:
    """A dispatched-but-not-fetched frame render.

    Holds the device result buffers of every bucket slab plus the host
    scatter layout; ``resolve()`` fetches and assembles.  Keeping frames
    pending lets multi-view callers (PSNR eval, turntable export)
    overlap view i+1's host binning with view i's device work — jax's
    async dispatch does the rest.

    ``k_used`` is the peel depth the frame was rendered at.  When the
    dispatch was optimistic (``k_hint``), ``resolve()`` first audits the
    fused per-slab coverage maxima and transparently re-renders at the
    exact depth if any pixel's true coverage exceeded the hint — output
    is always identical to the unhinted path."""

    def __init__(self, h, w, c_dim, parts, k_used, k_cap, redo=None):
        self._h, self._w, self._c = h, w, c_dim
        self._parts = parts  # [(lin_idx, t_real, color, vis, maxhits)]
        self.k_used = k_used
        self._k_cap = k_cap
        self._redo = redo  # (k_new) -> parts; None = k already exact

    def resolve(self) -> Tuple[np.ndarray, np.ndarray]:
        parts = self._parts
        if self._redo is not None:
            mh = max(
                (int(np.asarray(m).max()) for *_, m in parts), default=0
            )
            k_need = min(max(8, _pow2ceil(mh)), self._k_cap)
            if k_need > self.k_used:
                parts = self._parts = self._redo(k_need)
                self.k_used = k_need
            self._redo = None
        h, w, c_dim = self._h, self._w, self._c
        color = np.ones((h * w, c_dim), np.float32)  # white background
        vis = np.zeros((h * w, 1), np.float32)
        for lin, t_real, cc, vv, _ in parts:
            color[lin] = np.asarray(cc)[:t_real].reshape(-1, c_dim)
            vis[lin] = np.asarray(vv)[:t_real].reshape(-1, 1)
        return color.reshape(h, w, c_dim), vis.reshape(h, w, 1)


def dispatch_frame_binned(
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
    k_hint: int | None = None,
) -> PendingFrame:
    """Bin on host + dispatch every bucket slab; returns a PendingFrame
    (fetch with ``.resolve()``).  See render_frame_binned.

    ``k_hint`` (e.g. the previous view's ``PendingFrame.k_used``) skips
    the separate counting dispatch + host sync and renders optimistically
    at that depth; the fused coverage audit in ``resolve()`` re-renders
    at the exact depth if the hint was too shallow, so the result is
    always identical to the unhinted path.  Neighbouring views of one
    scene share depth complexity, so steady-state multi-view evals pay
    ONE fused dispatch per frame instead of count + sync + render."""
    c_dim = int(face_feat_fx3xc.shape[-1]) - 1
    pix_idx, _ = tile_pixel_layout(h, w, tile)
    # NDC pixel centers, y up (same formula as optimize.pixel_grid),
    # resident on device once per (h, w) — slabs ship int32 indices.
    grid_dev = _grid_dev(h, w)

    bins = build_frame_bins(face_img_np, h, w, tile)

    lo, hi = float(z_range[0]), float(z_range[1])
    px = tile * tile

    def pow2ceil(n):
        return 1 << (max(n, 1) - 1).bit_length()

    def padceil(n):
        # Slab tile-count quantization.  pow-2 everywhere would minimize
        # executable count, but the boundary waste is up to 2x of the
        # frame's ENTIRE scan+merge+transfer (a 264-tile 400^2 frame pads
        # to 512); 64-multiples cap the waste at <64 tiles and the extra
        # executables (a handful per scene family) are amortized by the
        # persistent compilation cache.
        return pow2ceil(n) if n <= 64 else -(-n // 64) * 64

    # uint16 candidate packing: see _unpack_cand.  0xFFFF is reserved
    # for the -1 pad sentinel, so require strictly fewer face ids.
    n_faces_total = int(face_img_np.shape[0])
    pack16 = n_faces_total < 0xFFFF

    # Slab cap: bound BOTH the live hit tile (T * cand candidate slots)
    # and the replay gather (T * px * k * 3 * (C+2) floats) to a few GB.
    replay_bytes_per_tile = px * k * 3 * (c_dim + 1 + 2) * 4

    # Phase 1 — transfer each slab once and (when no k_hint) COUNT its
    # true per-pixel coverage (floor-speed scan).  Phase 2 peels at the
    # smallest exact k: k_eff = pow2ceil(max hits) capped at `k` —
    # identical output (a larger k only adds sentinel slots; at the cap
    # it truncates exactly like the fixed-k path), at a fraction of the
    # top-k merge cost.
    slabs = []  # (lin, t_real, lin_dev, cand_dev, counts_dev|None)
    for budget in sorted(bins):
        tile_ids, cand = bins[budget]
        max_slab = max(
            1,
            min((1 << 25) // max(budget, 1),
                (2 << 30) // replay_bytes_per_tile),
        )
        t_total = tile_ids.shape[0]
        s = 0
        while s < t_total:
            t_s = min(max_slab, t_total - s)
            t_pad = min(padceil(t_s), max_slab)
            sl_ids = tile_ids[s: s + t_s]
            lin_rows = pix_idx[sl_ids]                     # (t_s, px)
            sl_cand = cand[s: s + t_s]
            if t_pad != t_s:  # dummy tiles: no candidates, pixel 0
                lin_rows = np.concatenate(
                    [lin_rows, np.zeros((t_pad - t_s, px), np.int32)]
                )
                sl_cand = np.concatenate(
                    [sl_cand,
                     np.full((t_pad - t_s, budget), -1, np.int32)]
                )
            if pack16:
                sl_cand = np.where(
                    sl_cand < 0, 0xFFFF, sl_cand
                ).astype(np.uint16)
            lin_dev = jnp.asarray(lin_rows)
            cand_dev = jnp.asarray(sl_cand)
            counts = None
            if k_hint is None:
                counts = _bucket_count(
                    lin_dev, grid_dev, cand_dev, face_z_fx3,
                    face_img_fx3x2, chunk, lo, hi,
                )
            lin = pix_idx[sl_ids].reshape(-1)
            slabs.append((lin, t_s, lin_dev, cand_dev, counts))
            s += t_s

    def render_parts(k_eff):
        parts = []
        for lin, t_s, lin_dev, cand_dev, _ in slabs:
            cc, vv, mh = _bucket_render(
                lin_dev, grid_dev, cand_dev,
                face_z_fx3, face_img_fx3x2, face_feat_fx3xc,
                chunk, k_eff, lo, hi,
            )  # (t_pad, px, C-1), (t_pad, px, 1), (t_pad,) — async
            if cc.shape[0] > t_s:
                # drop pad rows ON DEVICE so resolve's d2h fetch (the
                # other tunnel-bound leg) moves only real tiles
                cc, vv, mh = cc[:t_s], vv[:t_s], mh[:t_s]
            parts.append((lin, t_s, cc, vv, mh))
        return parts

    if k_hint is None:
        # np.asarray fetch (NOT an eager jnp.max — every eager op is a
        # dispatch round-trip on the remote backend)
        max_hits = max(
            (int(np.asarray(c).max()) for *_, c in slabs), default=0
        )
        k_eff = min(max(8, pow2ceil(max(max_hits, 1))), k)
        return PendingFrame(
            h, w, c_dim, render_parts(k_eff), k_eff, k, redo=None
        )
    k_eff = min(max(8, pow2ceil(k_hint)), k)
    return PendingFrame(
        h, w, c_dim, render_parts(k_eff), k_eff, k, redo=render_parts
    )


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
):
    """Render a full (h, w) frame with per-tile-exact host binning.

    ``face_*`` are device arrays (features already activated, i.e.
    post-sigmoid [alpha, rgb...]); ``face_img_np`` is the host-side
    projection of the same faces (used only for culling — bboxes are
    eps-expanded so host/device rounding can't drop a device-visible
    face).  Returns (color (h, w, C-1), vis (h, w, 1)) numpy.
    """
    return dispatch_frame_binned(
        face_z_fx3, face_img_fx3x2, face_feat_fx3xc, face_img_np,
        h, w, k=k, chunk=chunk, tile=tile, z_range=z_range,
    ).resolve()
