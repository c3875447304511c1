"""Host-side (numpy) topology builders producing dense, padded index arrays.

These replace the reference's sparse/dict-based builders with vectorized
numpy that emits exactly the array forms the TPU compute path wants:

  * interior faces + owning tet pair     — utils/tet_utils.py:208-256
    (``tet_to_face``: canonical face key, faces owned by exactly two tets,
    kept with the first-occurrence orientation; boundary faces separate)
  * row-normalized vertex adjacency      — utils/lib/tet_point_adj (C++) and
    utils/tet_utils.py:47-92, consumed by the GCN decoder and Laplacian loss;
    here a padded neighbor-index matrix + mask so `adj @ x` becomes a gather
    + masked mean (no sparse matmul).
  * tet neighbor per local face slot     — utils/lib/tet_adj_share
    (4 sparse tet×tet matrices in the reference; a single (T, 4) gather
    index here, the dense form of diff_render utils_tetsv.py:42-59).
  * edge → incident-interior-face lists  — replaces the O(F^2)
    coordinate-matching CUDA kernels tet_face_adj_m_idx (C4/C5): faces in a
    conforming grid share edges *by index*, so adjacency is a host-side
    unique/group over edge keys.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Local face ordering within a tet — must match the reference's enumeration
# (utils/tet_utils.py:166-169) so the boundary-orientation flip logic is
# bit-for-intent identical.
FACE_IDX = np.array(
    [[0, 1, 2], [1, 0, 3], [2, 3, 0], [3, 2, 1]], dtype=np.int64
)

TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
)


def _group_starts(counts: np.ndarray) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(counts)[:-1]])


def build_faces(tets: np.ndarray, n_point: int):
    """Enumerate unique triangular faces of a tet list.

    Returns:
      face_fx3:      (F, 3) int32 — interior faces (shared by exactly 2 tets),
                     with the vertex order of the first owning tet's local face
                     (the same orientation tet_to_face keeps).
      face_tet_fx2:  (F, 2) int32 — owning tets, first-occurrence order.
      face_slot_fx2: (F, 2) int32 — local face slot (0..3) within each owner.
      boundary_fx3:  (Fb, 3) int32 — faces owned by exactly one tet (the
                     grid's outer hull).
    """
    tets = np.asarray(tets, dtype=np.int64)
    tris = tets[:, FACE_IDX]  # (T, 4, 3)
    flat = tris.reshape(-1, 3)  # row 4*t + slot
    key = np.sort(flat, axis=1)
    _, inverse, counts = np.unique(
        key, axis=0, return_inverse=True, return_counts=True
    )
    if (counts > 2).any():
        raise ValueError("face shared by more than two tets — invalid mesh")
    order = np.argsort(inverse, kind="stable")
    starts = _group_starts(counts)

    two = counts == 2
    first = order[starts[two]]
    second = order[starts[two] + 1]
    face_fx3 = flat[first].astype(np.int32)
    face_tet_fx2 = np.stack([first // 4, second // 4], axis=1).astype(np.int32)
    face_slot_fx2 = np.stack([first % 4, second % 4], axis=1).astype(np.int32)

    one = counts == 1
    boundary_fx3 = flat[order[starts[one]]].astype(np.int32)
    return face_fx3, face_tet_fx2, face_slot_fx2, boundary_fx3


def hull_face_owners(
    tets: np.ndarray, hull_fx3: np.ndarray, n_point: int
) -> np.ndarray:
    """Owning tet index of each single-owner (hull) face.

    Needed to include occupied hull faces in surface exports — the
    reference's get_face_use_occ reaches the same faces by treating the
    missing neighbor (tet index -1) as occupancy 0
    (3_model/deftet.py:526-532)."""
    tets = np.asarray(tets, dtype=np.int64)
    tris = tets[:, FACE_IDX].reshape(-1, 3)
    n = np.int64(n_point)

    def encode(f):
        k = np.sort(np.asarray(f, dtype=np.int64), axis=1)
        return (k[:, 0] * n + k[:, 1]) * n + k[:, 2]

    keys = encode(tris)
    order = np.argsort(keys, kind="stable")
    pos = np.searchsorted(keys[order], encode(hull_fx3))
    return (order[pos] // 4).astype(np.int32)


def build_vertex_adjacency(tets: np.ndarray, n_point: int):
    """Vertex adjacency as padded neighbor lists.

    Matches the *row-normalized* adjacency of utils/lib/tet_point_adj
    (interface.py:40-58): entry (i, j) = 1/deg(i) for each undirected tet
    edge.  Returned as (idx (N, M) int32, mask (N, M) float32, deg (N,)
    int32); ``adj @ x`` == (x[idx] * mask[..., None]).sum(-2) / deg.
    """
    tets = np.asarray(tets, dtype=np.int64)
    e = tets[:, TET_EDGES].reshape(-1, 2)
    e = np.concatenate([e, e[:, ::-1]], axis=0)
    key = e[:, 0] * n_point + e[:, 1]
    uniq = np.unique(key)
    src = (uniq // n_point).astype(np.int64)
    dst = (uniq % n_point).astype(np.int64)
    deg = np.bincount(src, minlength=n_point)
    max_deg = int(deg.max()) if deg.size else 0
    idx = np.zeros((n_point, max_deg), dtype=np.int32)
    mask = np.zeros((n_point, max_deg), dtype=np.float32)
    starts = _group_starts(np.maximum(deg, 0))
    pos = np.arange(src.shape[0]) - starts[src]
    idx[src, pos] = dst
    mask[src, pos] = 1.0
    return idx, mask, deg.astype(np.int32)


def build_tet_neighbors(
    face_tet_fx2: np.ndarray, face_slot_fx2: np.ndarray, n_tets: int
) -> np.ndarray:
    """(T, 4) neighbor tet index per local face slot, -1 where hull."""
    nbr = np.full((n_tets, 4), -1, dtype=np.int32)
    nbr[face_tet_fx2[:, 0], face_slot_fx2[:, 0]] = face_tet_fx2[:, 1]
    nbr[face_tet_fx2[:, 1], face_slot_fx2[:, 1]] = face_tet_fx2[:, 0]
    return nbr


def build_face_edge_incidence(face_fx3: np.ndarray, n_point: int):
    """Group interior faces by shared (undirected) edge.

    Returns (edge_face_idx (E, M) int32 padded with 0,
             edge_face_mask (E, M) float32).
    Consumed by the surface-normal smoothness loss: two *boundary* faces
    sharing an edge contribute (1 - n_a . n_b), which is what the reference's
    coordinate-matching CUDA adjacency (tet_face_adj_m_idx, used at
    utils/mesh_utils.py:28) computes at runtime.
    """
    face_fx3 = np.asarray(face_fx3, dtype=np.int64)
    edges = np.stack(
        [face_fx3[:, [0, 1]], face_fx3[:, [1, 2]], face_fx3[:, [2, 0]]],
        axis=1,
    ).reshape(-1, 2)
    lo = edges.min(axis=1)
    hi = edges.max(axis=1)
    key = lo * n_point + hi
    _, inverse, counts = np.unique(key, return_inverse=True, return_counts=True)
    order = np.argsort(inverse, kind="stable")
    starts = _group_starts(counts)
    n_edges = counts.shape[0]
    max_m = int(counts.max()) if counts.size else 0
    idx = np.zeros((n_edges, max_m), dtype=np.int32)
    mask = np.zeros((n_edges, max_m), dtype=np.float32)
    grp = inverse[order]
    pos = np.arange(order.shape[0]) - starts[grp]
    idx[grp, pos] = (order // 3).astype(np.int32)
    mask[grp, pos] = 1.0
    return idx, mask


def build_edge_entries(face_fx3: np.ndarray, n_point: int):
    """(face, edge) incidence entries sorted by edge id.

    Returns (entry_face (3F,) int32, entry_edge (3F,) int32 ascending,
    n_edges).  Feeds the segment-sum form of the normal-smoothness loss:
    sorted segment ids make the per-edge reductions a fast sorted
    segment_sum on TPU (unsorted scatter-adds with duplicate indices were
    measured ~5s/step at res-50).
    """
    face_fx3 = np.asarray(face_fx3, dtype=np.int64)
    edges = np.stack(
        [face_fx3[:, [0, 1]], face_fx3[:, [1, 2]], face_fx3[:, [2, 0]]],
        axis=1,
    ).reshape(-1, 2)
    lo = edges.min(axis=1)
    hi = edges.max(axis=1)
    key = lo * n_point + hi
    uniq, inverse = np.unique(key, return_inverse=True)
    order = np.argsort(inverse, kind="stable")
    entry_face = (order // 3).astype(np.int32)
    entry_edge = inverse[order].astype(np.int32)
    return entry_face, entry_edge, int(uniq.size)


def build_face_edge_ids(face_fx3: np.ndarray, n_point: int) -> np.ndarray:
    """(F, 3) edge id of each face's three edges (same edge numbering as
    build_edge_entries).  The static transpose of the entry list: the
    backward of a per-edge segment reduction over faces is a gather of
    per-edge cotangents at these ids."""
    face_fx3 = np.asarray(face_fx3, dtype=np.int64)
    edges = np.stack(
        [face_fx3[:, [0, 1]], face_fx3[:, [1, 2]], face_fx3[:, [2, 0]]],
        axis=1,
    ).reshape(-1, 2)
    lo = edges.min(axis=1)
    hi = edges.max(axis=1)
    key = lo * n_point + hi
    _, inverse = np.unique(key, return_inverse=True)
    return inverse.reshape(-1, 3).astype(np.int32)


def build_vertex_face_incidence(face_fx3: np.ndarray, n_point: int):
    """Vertex -> incident face-corner slots, padded.

    Slots are k-major: slot = k * F + f for corner k of face f (so corner
    k's values occupy one contiguous block of a flat (3F,) gather).
    Returns (inc_idx (N, M) int32, inc_mask (N, M) float32).  This is the
    transpose of the face-corner gather: it lets the gather's backward be
    a padded GATHER of output cotangents instead of a scatter-add with
    duplicate indices (which is very slow on TPU).  Fills the role of the
    reference's per-vertex face adjacency kernel (C5, tet_face_v_adj_m_idx).
    """
    face_fx3 = np.asarray(face_fx3, dtype=np.int64)
    f = face_fx3.shape[0]
    verts_flat = face_fx3.T.reshape(-1)  # k-major: corner0 faces, corner1...
    order = np.argsort(verts_flat, kind="stable")
    sorted_v = verts_flat[order]
    counts = np.bincount(sorted_v, minlength=n_point)
    max_m = int(counts.max()) if counts.size and f else 1
    inc_idx = np.zeros((n_point, max_m), np.int32)
    inc_mask = np.zeros((n_point, max_m), np.float32)
    starts = _group_starts(counts)
    pos = np.arange(order.shape[0]) - starts[sorted_v]
    inc_idx[sorted_v, pos] = order.astype(np.int32)
    inc_mask[sorted_v, pos] = 1.0
    return inc_idx, inc_mask


def build_vertex_tet_incidence(tets_tx4: np.ndarray, n_point: int):
    """Vertex -> incident tet-corner slots (k-major: slot = k * T + t).

    The transpose of the tet-corner gather — same scatter-free-backward
    role as build_vertex_face_incidence, for the per-tet geometry losses.
    Returns (inc_idx (N, M) int32, inc_mask (N, M) float32).
    """
    tets_tx4 = np.asarray(tets_tx4, dtype=np.int64)
    verts_flat = tets_tx4.T.reshape(-1)
    order = np.argsort(verts_flat, kind="stable")
    sorted_v = verts_flat[order]
    counts = np.bincount(sorted_v, minlength=n_point)
    max_m = int(counts.max()) if counts.size and tets_tx4.size else 1
    inc_idx = np.zeros((n_point, max_m), np.int32)
    inc_mask = np.zeros((n_point, max_m), np.float32)
    starts = _group_starts(counts)
    pos = np.arange(order.shape[0]) - starts[sorted_v]
    inc_idx[sorted_v, pos] = order.astype(np.int32)
    inc_mask[sorted_v, pos] = 1.0
    return inc_idx, inc_mask


def build_edge_face_pairs(face_fx3: np.ndarray, n_point: int):
    """Unordered pairs of interior faces sharing an (undirected) edge.

    The direct analogue of the reference's tet_face_adj_m_idx CUDA kernel
    output (its wrapper converts the adjacency to an edge-pair index list,
    layers/DefTet/tet_face_adj_m_idx/utils.py:39-61) — but built by index
    hashing on host instead of O(F^2) coordinate matching on device.

    Returns (pair_a (P,), pair_b (P,)) int32.  TPU rationale: the
    smoothness loss over pairs needs only 2D (B, P) gathers, avoiding
    (E, M, 3)-shaped tensors whose tiny minor dims tile catastrophically
    (observed 42x lane-padding expansion).
    """
    idx, mask = build_face_edge_incidence(face_fx3, n_point)
    pairs_a, pairs_b = [], []
    m = idx.shape[1]
    for i in range(m):
        for j in range(i + 1, m):
            both = (mask[:, i] > 0) & (mask[:, j] > 0)
            pairs_a.append(idx[both, i])
            pairs_b.append(idx[both, j])
    if pairs_a:
        pa = np.concatenate(pairs_a).astype(np.int32)
        pb = np.concatenate(pairs_b).astype(np.int32)
    else:
        pa = np.zeros(0, np.int32)
        pb = np.zeros(0, np.int32)
    return pa, pb


@dataclasses.dataclass
class Topology:
    """All static topology of a tet grid, as dense numpy arrays."""

    n_vertices: int
    n_tets: int
    tet_tx4: np.ndarray          # (T, 4) int32
    face_fx3: np.ndarray         # (F, 3) int32 interior faces
    face_tet_fx2: np.ndarray     # (F, 2) int32
    face_slot_fx2: np.ndarray    # (F, 2) int32
    hull_face_hx3: np.ndarray    # (H, 3) int32 grid-boundary faces
    vert_adj_idx: np.ndarray     # (N, M) int32
    vert_adj_mask: np.ndarray    # (N, M) float32
    vert_degree: np.ndarray      # (N,) int32
    tet_neighbor_tx4: np.ndarray  # (T, 4) int32, -1 at hull
    edge_face_idx: np.ndarray    # (E, Me) int32
    edge_face_mask: np.ndarray   # (E, Me) float32
    edge_pair_fa: np.ndarray     # (P,) int32 — faces sharing an edge, side a
    edge_pair_fb: np.ndarray     # (P,) int32 — side b
    edge_entry_face: np.ndarray  # (3F,) int32 — incidence entries...
    edge_entry_edge: np.ndarray  # (3F,) int32 — ...sorted by edge id
    face_edge_ids: np.ndarray    # (F, 3) int32 edge id per face edge
    vert_face_inc_idx: np.ndarray   # (N, M) int32 face-corner slots (k-major)
    vert_face_inc_mask: np.ndarray  # (N, M) float32
    vert_tet_inc_idx: np.ndarray    # (N, Mt) int32 tet-corner slots (k-major)
    vert_tet_inc_mask: np.ndarray   # (N, Mt) float32

    def save(self, path: str) -> None:
        np.savez_compressed(path, **dataclasses.asdict(self))

    @classmethod
    def load(cls, path: str) -> "Topology":
        d = np.load(path)
        return cls(
            n_vertices=int(d["n_vertices"]),
            n_tets=int(d["n_tets"]),
            **{
                f.name: d[f.name]
                for f in dataclasses.fields(cls)
                if f.name not in ("n_vertices", "n_tets")
            },
        )


def build_topology(tets: np.ndarray, n_point: int) -> Topology:
    tets = np.asarray(tets)
    face_fx3, face_tet_fx2, face_slot_fx2, hull = build_faces(tets, n_point)
    vai, vam, deg = build_vertex_adjacency(tets, n_point)
    nbr = build_tet_neighbors(face_tet_fx2, face_slot_fx2, tets.shape[0])
    efi, efm = build_face_edge_incidence(face_fx3, n_point)
    pa, pb = build_edge_face_pairs(face_fx3, n_point)
    eef, eee, _ = build_edge_entries(face_fx3, n_point)
    fei = build_face_edge_ids(face_fx3, n_point)
    vfi, vfm = build_vertex_face_incidence(face_fx3, n_point)
    vti, vtm = build_vertex_tet_incidence(tets, n_point)
    return Topology(
        n_vertices=int(n_point),
        n_tets=int(tets.shape[0]),
        tet_tx4=tets.astype(np.int32),
        face_fx3=face_fx3,
        face_tet_fx2=face_tet_fx2,
        face_slot_fx2=face_slot_fx2,
        hull_face_hx3=hull,
        vert_adj_idx=vai,
        vert_adj_mask=vam,
        vert_degree=deg,
        tet_neighbor_tx4=nbr,
        edge_face_idx=efi,
        edge_face_mask=efm,
        edge_pair_fa=pa,
        edge_pair_fb=pb,
        edge_entry_face=eef,
        edge_entry_edge=eee,
        face_edge_ids=fei,
        vert_face_inc_idx=vfi,
        vert_face_inc_mask=vfm,
        vert_tet_inc_idx=vti,
        vert_tet_inc_mask=vtm,
    )
