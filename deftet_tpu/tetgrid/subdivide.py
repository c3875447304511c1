"""Dynamic topology edits: 1→8 tet subdivision and occupancy carving.

These are host-side (numpy) operations performed *between* jit-compiled
optimization stages — the same structure as the reference, which rebuilds
topology between its multi-minute 2D-supervision stages (diff_render
optim_with_mask_subdiv_from_gridmov.py:486-521).

Behaviour mirrors diff_render/diftet_6_subdiv/3_model/prepare_for_wz.py:
  * delete_tets         — :171-180 (keep tets whose max vertex weight exceeds
                          a threshold).
  * subdivide_tets      — :255-301 (insert one midpoint per unique edge,
                          split flagged tets into 8 children with the same
                          child ordering; unflagged tets kept as-is).

The edge matching here is vectorized (np.unique + searchsorted) instead of
the reference's per-edge python scan.
"""

from __future__ import annotations

import numpy as np

from .topology import TET_EDGES


def delete_tets(
    tets: np.ndarray, vert_weights: np.ndarray, threshold: float = 0.01
) -> np.ndarray:
    """Keep tets whose maximum per-vertex weight exceeds `threshold`."""
    w = vert_weights[tets]  # (T, 4)
    keep = w.max(axis=1) > threshold
    return tets[keep]


def _unique_edges(tets: np.ndarray, n_point: int):
    e = tets[:, TET_EDGES].reshape(-1, 2).astype(np.int64)
    lo = e.min(axis=1)
    hi = e.max(axis=1)
    key = lo * n_point + hi
    uniq_key = np.unique(key)
    edges = np.stack([uniq_key // n_point, uniq_key % n_point], axis=1)
    return edges, uniq_key


def subdivide_tets(
    tets: np.ndarray,
    points: np.ndarray,
    feats: np.ndarray | None = None,
    subdivide_flag: np.ndarray | None = None,
):
    """1→8 subdivision with midpoint vertices on every unique edge.

    Args:
      tets: (T, 4) int.
      points: (P, 3).
      feats: optional (P, K) per-vertex features, midpoint-averaged.
      subdivide_flag: optional (T,) bool; only flagged tets are split
        (unflagged kept unchanged — the interface is non-conforming, exactly
        as the reference accepts).

    Returns (new_points, new_feats, new_tets).
    """
    tets = np.asarray(tets, dtype=np.int64)
    points = np.asarray(points)
    n_point = points.shape[0]
    edges, uniq_key = _unique_edges(tets, n_point)

    mid_points = (points[edges[:, 0]] + points[edges[:, 1]]) / 2.0
    new_points = np.concatenate([points, mid_points], axis=0)
    if feats is not None:
        mid_feats = (feats[edges[:, 0]] + feats[edges[:, 1]]) / 2.0
        new_feats = np.concatenate([feats, mid_feats], axis=0)
    else:
        new_feats = None

    # Per-tet edge-midpoint indices, in TET_EDGES order (ab, ac, ad, bc, bd, cd).
    e = tets[:, TET_EDGES]  # (T, 6, 2)
    key = e.min(axis=2) * n_point + e.max(axis=2)
    edge_idx = np.searchsorted(uniq_key, key) + n_point  # (T, 6)

    a, b, c, d = tets.T
    ab, ac, ad, bc, bd, cd = edge_idx.transpose(1, 0)
    children = np.stack(
        [
            np.stack([a, ab, ac, ad], axis=1),
            np.stack([b, bc, ab, bd], axis=1),
            np.stack([c, ac, bc, cd], axis=1),
            np.stack([d, ad, cd, bd], axis=1),
            np.stack([ab, ac, ad, bd], axis=1),
            np.stack([ab, ac, bd, bc], axis=1),
            np.stack([cd, ac, bd, ad], axis=1),
            np.stack([cd, ac, bc, bd], axis=1),
        ],
        axis=1,
    )  # (T, 8, 4)

    if subdivide_flag is None:
        new_tets = children.reshape(-1, 4)
    else:
        subdivide_flag = np.asarray(subdivide_flag, dtype=bool)
        new_tets = np.concatenate(
            [tets[~subdivide_flag], children[subdivide_flag].reshape(-1, 4)],
            axis=0,
        )
    return new_points, new_feats, new_tets.astype(np.int32)
