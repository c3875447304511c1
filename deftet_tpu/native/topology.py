"""ctypes wrappers over native/topology.cpp.

Each function mirrors its numpy twin in ``tetgrid.topology`` exactly
(same outputs, same ordering conventions) — the twins serve as golden
oracles in tests/test_native.py.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .build import load_library

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64 = ctypes.c_int64
_i64p = ctypes.POINTER(ctypes.c_int64)


def _lib():
    lib = load_library("topology")
    if lib is None:
        raise RuntimeError("native topology library unavailable (no g++)")
    if not getattr(lib, "_sigs_set", False):
        lib.build_faces.restype = ctypes.c_int
        lib.build_faces.argtypes = [
            _i32p, _i64, _i64, _i32p, _i32p, _i32p, _i32p, _i64p, _i64p,
        ]
        lib.vertex_adjacency_max_degree.restype = _i64
        lib.vertex_adjacency_max_degree.argtypes = [_i32p, _i64, _i64]
        lib.build_vertex_adjacency.restype = None
        lib.build_vertex_adjacency.argtypes = [
            _i32p, _i64, _i64, _i64, _i32p, _f32p, _i32p,
        ]
        lib.build_tet_neighbors.restype = None
        lib.build_tet_neighbors.argtypes = [_i32p, _i32p, _i64, _i64, _i32p]
        lib.build_edge_face_pairs.restype = _i64
        lib.build_edge_face_pairs.argtypes = [
            _i32p, _i64, _i64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.collapse_vertices.restype = _i64
        lib.collapse_vertices.argtypes = [
            _f64p, _i64, ctypes.c_double, _i32p, _f64p,
        ]
        lib._sigs_set = True
    return lib


def build_faces_native(tets: np.ndarray, n_point: int):
    """Native twin of tetgrid.topology.build_faces."""
    lib = _lib()
    tets = np.ascontiguousarray(tets, dtype=np.int32)
    t = tets.shape[0]
    face_v = np.empty((2 * t + 4, 3), np.int32)
    face_tet = np.empty((2 * t + 4, 2), np.int32)
    face_slot = np.empty((2 * t + 4, 2), np.int32)
    hull_v = np.empty((4 * t + 4, 3), np.int32)
    ni = _i64(0)
    nh = _i64(0)
    rc = lib.build_faces(
        tets, t, n_point, face_v, face_tet, face_slot, hull_v,
        ctypes.byref(ni), ctypes.byref(nh),
    )
    if rc != 0:
        raise ValueError("face shared by more than two tets — invalid mesh")
    ni, nh = ni.value, nh.value
    return (
        face_v[:ni].copy(), face_tet[:ni].copy(), face_slot[:ni].copy(),
        hull_v[:nh].copy(),
    )


def build_vertex_adjacency_native(tets: np.ndarray, n_point: int):
    lib = _lib()
    tets = np.ascontiguousarray(tets, dtype=np.int32)
    t = tets.shape[0]
    max_deg = int(lib.vertex_adjacency_max_degree(tets, t, n_point))
    max_deg = max(max_deg, 1)
    idx = np.zeros((n_point, max_deg), np.int32)
    mask = np.zeros((n_point, max_deg), np.float32)
    deg = np.zeros((n_point,), np.int32)
    lib.build_vertex_adjacency(tets, t, n_point, max_deg, idx, mask, deg)
    return idx, mask, deg


def build_tet_neighbors_native(
    face_tet: np.ndarray, face_slot: np.ndarray, n_tets: int
):
    lib = _lib()
    face_tet = np.ascontiguousarray(face_tet, dtype=np.int32)
    face_slot = np.ascontiguousarray(face_slot, dtype=np.int32)
    nbr = np.empty((n_tets, 4), np.int32)
    lib.build_tet_neighbors(
        face_tet, face_slot, face_tet.shape[0], n_tets, nbr
    )
    return nbr


def build_edge_face_pairs_native(face_v: np.ndarray, n_point: int):
    lib = _lib()
    face_v = np.ascontiguousarray(face_v, dtype=np.int32)
    f = face_v.shape[0]
    count = int(lib.build_edge_face_pairs(face_v, f, n_point, None, None))
    pa = np.empty((count,), np.int32)
    pb = np.empty((count,), np.int32)
    if count:
        lib.build_edge_face_pairs(
            face_v, f, n_point,
            pa.ctypes.data_as(ctypes.c_void_p),
            pb.ctypes.data_as(ctypes.c_void_p),
        )
    return pa, pb


def collapse_vertices_native(verts: np.ndarray, decimals: int = 5):
    """Dedupe vertices by rounded coordinates (colaps_v, C10).

    Returns (unique_verts, remap old->new)."""
    lib = _lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    n = verts.shape[0]
    remap = np.empty((n,), np.int32)
    out = np.empty((n, 3), np.float64)
    n_unique = int(
        lib.collapse_vertices(verts, n, float(10 ** decimals), remap, out)
    )
    return out[:n_unique].copy(), remap


def build_topology_native(
    tets: np.ndarray, n_point: int, with_incidence: bool = True
):
    """Native fast path mirroring tetgrid.topology.build_topology.

    The edge->face incidence matrix is only needed by legacy consumers
    (the pair lists supersede it for the normal loss), so it is skipped
    by default — it is the slowest numpy builder on large grids.
    """
    from ..tetgrid.topology import (
        Topology,
        build_edge_entries,
        build_face_edge_ids,
        build_face_edge_incidence,
        build_vertex_face_incidence,
        build_vertex_tet_incidence,
    )

    face_v, face_tet, face_slot, hull = build_faces_native(tets, n_point)
    idx, mask, deg = build_vertex_adjacency_native(tets, n_point)
    nbr = build_tet_neighbors_native(face_tet, face_slot, tets.shape[0])
    pa, pb = build_edge_face_pairs_native(face_v, n_point)
    eef, eee, _ = build_edge_entries(face_v, n_point)
    fei = build_face_edge_ids(face_v, n_point)
    vfi, vfm = build_vertex_face_incidence(face_v, n_point)
    vti, vtm = build_vertex_tet_incidence(tets, n_point)
    if with_incidence:
        efi, efm = build_face_edge_incidence(face_v, n_point)
    else:
        efi = np.zeros((0, 1), np.int32)
        efm = np.zeros((0, 1), np.float32)
    return Topology(
        n_vertices=int(n_point),
        n_tets=int(tets.shape[0]),
        tet_tx4=np.ascontiguousarray(tets, dtype=np.int32),
        face_fx3=face_v,
        face_tet_fx2=face_tet,
        face_slot_fx2=face_slot,
        hull_face_hx3=hull,
        vert_adj_idx=idx,
        vert_adj_mask=mask,
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
