"""Lattice-class-ordered interior faces of the regular Kuhn tet grid.

The generic face builder (`topology.build_faces`) emits interior faces in
sorted-key order, so every occupancy read (``occ[face_tet]``), boundary
test and per-edge reduction over faces is a random-access gather.  On the
regular grid those gathers are unnecessary: tets are type-major
(``tet = type * r^3 + cell``, grid.py:127-135), and every interior face is
one of exactly **12 translation classes** — 6 inside a cell (both owners in
the same cube) and 6 across a cell wall.  Ordering faces **class-major**
(``face = class * r^3 + cell``) turns the whole boundary-face machinery
into shifted slices of ``(B, 6, r, r, r)``/``(B, 12, r, r, r)`` arrays:
contiguous HBM traffic instead of gathers (measured ~5 GiB/s for
random-access gathers vs memcpy-speed slices on v5e — the round-2 profile
attributed ~110 ms/step at res-50 to this machinery).

Layout contract (consumed by ops.lattice and train.statics):

  * the face axis has ``12 * r^3`` padded slots; slot ``c * r^3 + cell``
    is the class-``c`` face anchored at ``cell = i*r^2 + j*r + k`` (the
    same C-order linearization as the type-major tet axis);
  * a slot is *valid* iff the partner cell ``cell + delta_c`` is on the
    grid.  Invalid slots hold a real grid-hull face (the anchor tet's
    local face), with ``face_tet = (owner, owner)`` — so the generic
    gather paths stay bit-correct on the padded layout: occupancies of a
    self-paired face sum to 0 or 2, never 1, hence never boundary (the
    same trick the reference gets from treating a missing neighbor as
    occupancy 0, diff_render/.../3_model/deftet.py:526-532);
  * ``face_fx3`` keeps the FIRST owner's local-face vertex order
    (orientation parity with topology.build_faces / tet_to_face,
    utils/tet_utils.py:208-256); the first owner is always the
    smaller tet index, which for a fixed class is a fixed side.

Class tables are *derived at import time* from a small probe grid rather
than hardcoded, so any change to the cube split (grid._CUBE_TETS) or the
local-face enumeration (topology.FACE_IDX) keeps them consistent; the
derivation asserts translation invariance.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .grid import build_tet_grid
from .topology import FACE_IDX, build_faces

#: The 7 edge direction classes of the Kuhn lattice (axis edges, the three
#: split-consistent face diagonals, and the cube main diagonal), as
#: (di, dj, dk) from the edge's min-corner anchor vertex.
EDGE_DIRS = (
    (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1),
    (1, 1, 1),
)

_PROBE_RES = 4


@dataclasses.dataclass(frozen=True)
class FaceClass:
    """One translation class of interior faces.

    ``first_*`` is the owner whose tet index is smaller (for every face of
    the class — asserted during derivation); ``delta`` is the second
    owner's cell minus the anchor (= first owner's) cell; ``voff`` are the
    face's three vertex offsets from the anchor cell origin, in the first
    owner's local-face order.
    """

    first_type: int
    first_slot: int
    second_type: int
    second_slot: int
    delta: tuple            # (3,) ints in {-1, 0, 1}
    voff: tuple             # ((3,) ints in {0, 1}) * 3


def _cell_coords(lin: np.ndarray, r: int) -> np.ndarray:
    return np.stack([lin // (r * r), (lin // r) % r, lin % r], axis=-1)


def _vert_coords(v: np.ndarray, n: int) -> np.ndarray:
    return np.stack([v // (n * n), (v // n) % n, v % n], axis=-1)


@functools.lru_cache(maxsize=1)
def face_class_table() -> tuple:
    """The 12 FaceClass entries, ordered by (first_type, first_slot).

    Derived from a probe grid: group interior faces by their
    (first-owner type, slot) signature and assert each group is a single
    translation class.
    """
    r = _PROBE_RES
    g = build_tet_grid(r)
    n = r + 1
    face_fx3, face_tet, face_slot, _ = build_faces(g.tets, g.n_vertices)
    ta = face_tet[:, 0].astype(np.int64)
    tb = face_tet[:, 1].astype(np.int64)
    # build_faces keeps first-occurrence (= smaller tet index) first.
    assert (ta < tb).all()
    ca = _cell_coords(ta % r**3, r)
    cb = _cell_coords(tb % r**3, r)
    sig = np.stack([ta // r**3, face_slot[:, 0]], axis=-1)
    uniq, inv = np.unique(sig, axis=0, return_inverse=True)
    assert uniq.shape[0] == 12, uniq.shape
    classes = []
    for ci in range(12):
        rows = np.where(inv == ci)[0]
        delta = cb[rows] - ca[rows]
        assert (delta == delta[0]).all(), "class not translation-invariant"
        voff = (
            _vert_coords(face_fx3[rows].astype(np.int64), n)
            - ca[rows][:, None, :]
        )
        assert (voff == voff[0]).all()
        assert voff.min() >= 0 and voff.max() <= 1
        second = np.stack([tb // r**3, face_slot[:, 1]], axis=-1)[rows]
        assert (second == second[0]).all()
        classes.append(
            FaceClass(
                first_type=int(uniq[ci, 0]),
                first_slot=int(uniq[ci, 1]),
                second_type=int(second[0, 0]),
                second_slot=int(second[0, 1]),
                delta=tuple(int(x) for x in delta[0]),
                voff=tuple(
                    tuple(int(x) for x in voff[0, k]) for k in range(3)
                ),
            )
        )
    return tuple(classes)


@functools.lru_cache(maxsize=1)
def edge_class_table() -> tuple:
    """Per edge-direction class: incident interior faces as static offsets.

    Entry ``d`` is a tuple of ``(face_class, (di, dj, dk))`` meaning: the
    edge anchored at vertex ``m`` with direction ``EDGE_DIRS[d]`` is an
    edge of the class-``face_class`` face anchored at cell ``m + (di, dj,
    dk)`` — *when that face exists* (both the cell and its partner cell on
    the grid; off-grid reads contribute zero in the shifted-slice
    implementation).  Replaces the per-edge gather lists of
    ``build_face_edge_incidence`` for the regular grid.
    """
    r = _PROBE_RES
    g = build_tet_grid(r)
    n = r + 1
    face_fx3, face_tet, face_slot, _ = build_faces(g.tets, g.n_vertices)
    ta = face_tet[:, 0].astype(np.int64)
    ca = _cell_coords(ta % r**3, r)
    sig = np.stack([ta // r**3, face_slot[:, 0]], axis=-1)
    uniq, fclass = np.unique(sig, axis=0, return_inverse=True)

    edges = np.stack(
        [face_fx3[:, [0, 1]], face_fx3[:, [1, 2]], face_fx3[:, [2, 0]]],
        axis=1,
    ).reshape(-1, 2).astype(np.int64)
    owner_face = np.repeat(np.arange(face_fx3.shape[0]), 3)
    pl = _vert_coords(np.minimum(edges[:, 0], edges[:, 1]), n)
    ph = _vert_coords(np.maximum(edges[:, 0], edges[:, 1]), n)
    anchor = np.minimum(pl, ph)
    dv = np.abs(ph - pl)
    # every lattice edge is corner-anchored: endpoints are anchor and
    # anchor + dv (no anti-diagonal directions in the Kuhn split)
    ok = ((pl == anchor).all(1) | (pl == anchor + dv).all(1))
    assert ok.all()
    dir_id = {d: i for i, d in enumerate(EDGE_DIRS)}
    tables = [set() for _ in EDGE_DIRS]
    seen_interior = [0] * len(EDGE_DIRS)
    interior = (anchor >= 1).all(1) & (anchor <= r - 2).all(1)
    for i in np.where(interior)[0]:
        d = dir_id[tuple(int(x) for x in dv[i])]
        tables[d].add(
            (
                int(fclass[owner_face[i]]),
                tuple(int(x) for x in (ca[owner_face[i]] - anchor[i])),
            )
        )
        seen_interior[d] += 1
    out = tuple(tuple(sorted(t)) for t in tables)
    # translation invariance: every interior edge of a class must have
    # seen the full table (count divisible by table size)
    for d, t in enumerate(out):
        assert t, f"edge class {EDGE_DIRS[d]} unseen in probe"
    return out


def build_lattice_faces(r: int):
    """Class-major padded interior-face arrays for a res-``r`` Kuhn grid.

    Returns ``(face_fx3 (12r^3, 3) int32, face_tet_fx2 (12r^3, 2) int32,
    face_slot_fx2 (12r^3, 2) int32, valid (12r^3,) bool,
    hull_face_hx3 (H, 3) int32)``.

    Invalid slots carry the anchor tet's real hull face with
    ``face_tet = (anchor, anchor)`` (see module docstring).
    ``hull_face_hx3`` is the complete grid hull: the invalid slots' faces
    plus the second-owner-side faces whose anchor cell is off-grid.
    """
    classes = face_class_table()
    n = r + 1
    r3 = r**3
    ii, jj, kk = np.meshgrid(
        np.arange(r), np.arange(r), np.arange(r), indexing="ij"
    )
    cells = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)  # (r^3, 3)
    cell_lin = (cells[:, 0] * r * r + cells[:, 1] * r + cells[:, 2])

    def vert_lin(pts):
        return (pts[..., 0] * n * n + pts[..., 1] * n + pts[..., 2])

    face_fx3 = np.empty((12 * r3, 3), np.int32)
    face_tet = np.empty((12 * r3, 2), np.int32)
    face_slot = np.empty((12 * r3, 2), np.int32)
    valid = np.empty(12 * r3, bool)
    hull_parts = []
    for c, fc in enumerate(classes):
        sl = slice(c * r3, (c + 1) * r3)
        voff = np.asarray(fc.voff, np.int64)  # (3, 3)
        face_fx3[sl] = vert_lin(cells[:, None, :] + voff[None]).astype(
            np.int32
        )
        ta = fc.first_type * r3 + cell_lin
        partner = cells + np.asarray(fc.delta, np.int64)
        v = ((partner >= 0) & (partner < r)).all(axis=1)
        tb_cell = (
            partner[:, 0] * r * r + partner[:, 1] * r + partner[:, 2]
        )
        tb = np.where(v, fc.second_type * r3 + tb_cell, ta)
        face_tet[sl, 0] = ta
        face_tet[sl, 1] = tb
        face_slot[sl, 0] = fc.first_slot
        face_slot[sl, 1] = np.where(v, fc.second_slot, fc.first_slot)
        valid[sl] = v
        hull_parts.append(face_fx3[sl][~v])

    # second-owner-side hull faces: the class face seen from the partner
    # tet at cells where the *anchor* cell would be off-grid.  Enumerate
    # via the partner tet's corner offsets and its local face slot.
    from .grid import _CUBE_TETS

    corner_off = np.array(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)],
        np.int64,
    )
    tet_corner_off = corner_off[_CUBE_TETS]  # (6, 4, 3)
    for fc in classes:
        if fc.delta == (0, 0, 0):
            continue
        # partner cells cb with cb - delta off-grid
        anchor = cells - np.asarray(fc.delta, np.int64)
        off = ~((anchor >= 0) & (anchor < r)).all(axis=1)
        cb = cells[off]
        tri_off = tet_corner_off[fc.second_type][
            FACE_IDX[fc.second_slot]
        ]  # (3, 3)
        hull_parts.append(
            vert_lin(cb[:, None, :] + tri_off[None]).astype(np.int32)
        )
    hull = (
        np.concatenate(hull_parts, axis=0)
        if hull_parts
        else np.zeros((0, 3), np.int32)
    )
    return face_fx3, face_tet, face_slot, valid, hull


def face_valid_mask(r: int) -> np.ndarray:
    """(12, r, r, r) bool — validity of each class-major face slot."""
    classes = face_class_table()
    out = np.empty((12, r, r, r), bool)
    idx = np.arange(r)
    for c, fc in enumerate(classes):
        m = np.ones((r, r, r), bool)
        for ax, d in enumerate(fc.delta):
            sel = (idx + d >= 0) & (idx + d < r)
            shape = [1, 1, 1]
            shape[ax] = r
            m &= sel.reshape(shape)
        out[c] = m
    return out


def build_lattice_edge_arrays(r: int):
    """Edge->face incidence + face->edge ids, derived from the class
    tables by pure arithmetic (no sorting — the generic builders spend
    ~18 s at res-50 on unique/argsort over the 3F edge keys).

    Edge numbering: ``edge = ec * (r+1)^3 + lin(anchor)`` over the 7
    direction classes (EDGE_DIRS) and the (r+1)^3 anchor-vertex lattice.
    Returns ``(edge_face_idx (7(r+1)^3, Me) int32, edge_face_mask float32,
    face_edge_ids (12 r^3, 3) int32)`` — drop-in compatible with
    ``ops.geometry.edge_face_sum`` (its outputs are only ever consumed as
    sums over edges, so the padded all-invalid edge slots are inert).
    Mask is 1 wherever the incident face *slot* exists (cell on-grid),
    matching the generic builder's semantics on the padded face list
    (hull-padded slots are listed faces there too; losses weight them to
    zero through ``w``).
    """
    einc = edge_class_table()
    r3 = r**3
    n_anchor = (r + 1) ** 3
    ai, aj, ak = np.meshgrid(
        np.arange(r + 1), np.arange(r + 1), np.arange(r + 1), indexing="ij"
    )
    anchors = np.stack([ai, aj, ak], axis=-1).reshape(-1, 3)  # ((r+1)^3, 3)
    me = max(len(t) for t in einc)
    edge_face_idx = np.zeros((7 * n_anchor, me), np.int32)
    edge_face_mask = np.zeros((7 * n_anchor, me), np.float32)
    for ec, incs in enumerate(einc):
        sl = slice(ec * n_anchor, (ec + 1) * n_anchor)
        for j, (fc, d) in enumerate(incs):
            cell = anchors + np.asarray(d, np.int64)
            ok = ((cell >= 0) & (cell < r)).all(axis=1)
            lin = cell[:, 0] * r * r + cell[:, 1] * r + cell[:, 2]
            edge_face_idx[sl, j] = np.where(ok, fc * r3 + lin, 0).astype(
                np.int32
            )
            edge_face_mask[sl, j] = ok

    inv = {fc: [] for fc in range(12)}
    for ec, incs in enumerate(einc):
        for fc, d in incs:
            inv[fc].append((ec, d))
    ci, cj, ck = np.meshgrid(
        np.arange(r), np.arange(r), np.arange(r), indexing="ij"
    )
    cells = np.stack([ci, cj, ck], axis=-1).reshape(-1, 3)
    face_edge_ids = np.empty((12 * r3, 3), np.int32)
    for fc in range(12):
        assert len(inv[fc]) == 3, (fc, inv[fc])
        sl = slice(fc * r3, (fc + 1) * r3)
        for j, (ec, d) in enumerate(inv[fc]):
            m = cells - np.asarray(d, np.int64)  # anchor = cell - delta
            assert m.min() >= 0 and m.max() <= r
            lin = (
                m[:, 0] * (r + 1) * (r + 1) + m[:, 1] * (r + 1) + m[:, 2]
            )
            face_edge_ids[sl, j] = (ec * n_anchor + lin).astype(np.int32)
    return edge_face_idx, edge_face_mask, face_edge_ids


@dataclasses.dataclass(frozen=True)
class FaceLattice:
    """Static (hashable) lattice-class info shipped into jit closures.

    ``res`` is the grid resolution; the tables are nested tuples of ints,
    so instances hash/compare by value and can parameterize traced
    programs the same way ``lattice_tet_offsets`` does.
    """

    res: int
    classes: tuple          # face_class_table()
    edge_incidence: tuple   # edge_class_table()


def face_lattice_info(grid) -> FaceLattice | None:
    """FaceLattice for a regular Kuhn grid, else None.

    Regularity is established the same way the tet-corner fast path does
    (train.statics.lattice_tet_offsets verifies the type-major layout
    against the actual tets array).
    """
    from ..train.statics import lattice_tet_offsets

    if grid.resolution < 2 or lattice_tet_offsets(grid) is None:
        return None
    return FaceLattice(
        res=int(grid.resolution),
        classes=face_class_table(),
        edge_incidence=edge_class_table(),
    )


def build_lattice_topology(grid):
    """Full Topology with the class-major padded face layout, or None.

    Face-derived arrays (edge incidence, vertex->face incidence, edge
    pairs) are built by the generic builders *on the padded face list*,
    so the gather fallback paths remain exactly consistent with the
    class-major indexing; tet-derived arrays (vertex adjacency, tet
    neighbors) are untouched by the reordering.  Invalid (hull-padded)
    slots are excluded from tet neighbors (their self-pair would
    overwrite the -1 hull marker).
    """
    from .topology import (
        Topology,
        build_tet_neighbors,
        build_vertex_face_incidence,
        build_vertex_tet_incidence,
    )

    if face_lattice_info(grid) is None:
        return None
    r = grid.resolution
    n_point = grid.n_vertices
    tets = np.asarray(grid.tets, np.int32)
    face_v, face_tet, face_slot, valid, hull = build_lattice_faces(r)

    try:
        from ..native import native_available
        from ..native.topology import (
            build_edge_face_pairs_native,
            build_vertex_adjacency_native,
        )

        use_native = native_available()
    except Exception:
        use_native = False
    if use_native:
        vai, vam, deg = build_vertex_adjacency_native(tets, n_point)
        pa, pb = build_edge_face_pairs_native(face_v, n_point)
    else:
        from .topology import build_vertex_adjacency, build_edge_face_pairs

        vai, vam, deg = build_vertex_adjacency(tets, n_point)
        pa, pb = build_edge_face_pairs(face_v, n_point)
    nbr = build_tet_neighbors(
        face_tet[valid], face_slot[valid], tets.shape[0]
    )
    efi, efm, fei = build_lattice_edge_arrays(r)
    # (face, edge) entries sorted by edge id — flattening the incidence
    # matrix row-major is already edge-ascending (the generic
    # build_edge_entries re-sorts 3F keys, ~26 s at res-50)
    flat_mask = efm.reshape(-1) > 0
    eee = np.repeat(
        np.arange(efi.shape[0], dtype=np.int32), efi.shape[1]
    )[flat_mask]
    eef = efi.reshape(-1)[flat_mask]
    vfi, vfm = build_vertex_face_incidence(face_v, n_point)
    vti, vtm = build_vertex_tet_incidence(tets, n_point)
    return Topology(
        n_vertices=int(n_point),
        n_tets=int(tets.shape[0]),
        tet_tx4=tets,
        face_fx3=face_v,
        face_tet_fx2=face_tet,
        face_slot_fx2=face_slot,
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
