"""Golden tests for the tet-grid topology builders.

Oracles are direct, dict/set-based re-derivations of the reference's pure
python builders (utils/tet_utils.py:47-92 tet_to_adj_sparse, :208-256
tet_to_face, :318-367 tet_adj_share) — slow but obviously correct.
"""

import numpy as np
import pytest

from deftet_tpu.tetgrid import (
    FACE_IDX,
    TetGrid,
    build_faces,
    build_face_edge_incidence,
    build_tet_grid,
    build_tet_neighbors,
    build_topology,
    build_vertex_adjacency,
    read_tet_file,
    save_tet_file,
    subdivide_tets,
    delete_tets,
)


def _ref_faces(tets, n_point):
    """Dict-based oracle mirroring tet_to_face semantics."""
    absolute = {}
    for t_idx, tet in enumerate(tets):
        for slot, f in enumerate(FACE_IDX):
            tri = [tet[f[0]], tet[f[1]], tet[f[2]]]
            key = tuple(sorted(tri))
            absolute.setdefault(key, []).append((tri, t_idx, slot))
    interior, boundary = [], []
    for key, entries in absolute.items():
        if len(entries) == 2:
            interior.append(entries)
        elif len(entries) == 1:
            boundary.append(entries[0][0])
    return interior, boundary


def _ref_vertex_adjacency(tets, n_point):
    adj = set()
    for tet in tets:
        for i in range(4):
            for j in range(4):
                if i != j:
                    adj.add((int(tet[i]), int(tet[j])))
    return adj


@pytest.fixture(scope="module")
def grid():
    return build_tet_grid(4)


def test_grid_shapes(grid):
    r = 4
    assert grid.n_vertices == (r + 1) ** 3
    assert grid.n_tets == 6 * r**3
    assert grid.vertices.min() == 0.0 and grid.vertices.max() == 1.0


def test_grid_volumes_positive_and_fill_cube(grid):
    p = grid.vertices[grid.tets]
    a = p[:, 0] - p[:, 3]
    b = p[:, 1] - p[:, 3]
    c = p[:, 2] - p[:, 3]
    vol = -np.einsum("ti,ti->t", a, np.cross(b, c)) / 6.0
    assert (vol > 0).all()
    assert np.isclose(vol.sum(), 1.0)


def test_interior_mask(grid):
    on_wall = (grid.vertices == 0.0) | (grid.vertices == 1.0)
    assert np.array_equal(grid.interior_mask == 0.0, on_wall)


def test_faces_match_reference_oracle(grid):
    face_fx3, face_tet_fx2, face_slot_fx2, hull = build_faces(
        grid.tets, grid.n_vertices
    )
    interior_ref, boundary_ref = _ref_faces(grid.tets, grid.n_vertices)
    assert face_fx3.shape[0] == len(interior_ref)
    assert hull.shape[0] == len(boundary_ref)

    ref_map = {
        tuple(sorted(e[0][0])): e for e in interior_ref
    }
    for f, tt, ss in zip(face_fx3, face_tet_fx2, face_slot_fx2):
        entries = ref_map[tuple(sorted(f.tolist()))]
        # first-occurrence orientation and owner order
        assert list(f) == entries[0][0]
        assert (tt[0], ss[0]) == (entries[0][1], entries[0][2])
        assert (tt[1], ss[1]) == (entries[1][1], entries[1][2])
    # owner order follows tet enumeration order
    assert (face_tet_fx2[:, 0] < face_tet_fx2[:, 1]).all()

    hull_ref = {tuple(sorted(x)) for x in boundary_ref}
    hull_got = {tuple(sorted(x.tolist())) for x in hull}
    assert hull_ref == hull_got


def test_vertex_adjacency_matches_oracle(grid):
    idx, mask, deg = build_vertex_adjacency(grid.tets, grid.n_vertices)
    ref = _ref_vertex_adjacency(grid.tets, grid.n_vertices)
    got = set()
    for i in range(grid.n_vertices):
        for m in range(idx.shape[1]):
            if mask[i, m]:
                got.add((i, int(idx[i, m])))
    assert got == ref
    # degrees count out-edges
    ref_deg = np.zeros(grid.n_vertices, dtype=int)
    for a, _ in ref:
        ref_deg[a] += 1
    assert np.array_equal(deg, ref_deg)


def test_row_normalized_matvec(grid):
    """adj @ x with row normalization == padded gather + mean."""
    idx, mask, deg = build_vertex_adjacency(grid.tets, grid.n_vertices)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(grid.n_vertices, 3))
    dense = np.zeros((grid.n_vertices, grid.n_vertices))
    for a, b in _ref_vertex_adjacency(grid.tets, grid.n_vertices):
        dense[a, b] = 1.0
    dense = dense / dense.sum(axis=1, keepdims=True)
    want = dense @ x
    got = (x[idx] * mask[..., None]).sum(axis=1) / deg[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_tet_neighbors(grid):
    face_fx3, face_tet_fx2, face_slot_fx2, _ = build_faces(
        grid.tets, grid.n_vertices
    )
    nbr = build_tet_neighbors(face_tet_fx2, face_slot_fx2, grid.n_tets)
    # symmetric: if nbr[t, s] = u then some slot of u points back at t
    for t in range(0, grid.n_tets, 37):
        for s in range(4):
            u = nbr[t, s]
            if u >= 0:
                assert t in nbr[u]
    # interior face count = number of non-(-1) entries / 2
    assert (nbr >= 0).sum() == 2 * face_fx3.shape[0]


def test_edge_face_incidence(grid):
    topo = build_topology(grid.tets, grid.n_vertices)
    # every interior face appears exactly 3 times (once per edge)
    counts = np.zeros(topo.face_fx3.shape[0])
    np.add.at(
        counts,
        topo.edge_face_idx[topo.edge_face_mask > 0],
        1.0,
    )
    assert (counts == 3).all()


def test_tet_file_roundtrip(tmp_path, grid):
    path = str(tmp_path / "g.tet")
    save_tet_file(grid, path)
    loaded = read_tet_file(path)
    np.testing.assert_allclose(loaded.vertices, grid.vertices, atol=1e-6)
    assert loaded.tets.shape == grid.tets.shape


def test_subdivision_conforming_volume():
    grid = build_tet_grid(2)
    pts, _, tets = subdivide_tets(grid.tets, grid.vertices)
    assert tets.shape[0] == 8 * grid.n_tets
    p = pts[tets]
    a = p[:, 0] - p[:, 3]
    b = p[:, 1] - p[:, 3]
    c = p[:, 2] - p[:, 3]
    vol = np.abs(np.einsum("ti,ti->t", a, np.cross(b, c)) / 6.0)
    assert np.isclose(vol.sum(), 1.0)
    # selective subdivision keeps unflagged tets
    flag = np.zeros(grid.n_tets, dtype=bool)
    flag[:5] = True
    _, _, tets2 = subdivide_tets(grid.tets, grid.vertices, None, flag)
    assert tets2.shape[0] == (grid.n_tets - 5) + 5 * 8


def test_delete_tets():
    grid = build_tet_grid(2)
    w = np.zeros(grid.n_vertices)
    w[grid.tets[0]] = 1.0  # keep only tets touching tet 0's vertices
    kept = delete_tets(grid.tets, w, threshold=0.5)
    assert kept.shape[0] >= 1
    assert (w[kept].max(axis=1) > 0.5).all()


def test_read_reference_quartet_tet_file():
    """Parse the reference's own quartet-generated grid when present
    (diff_render/diftet_6_subdiv/data/cube_40_tet.tet — the topology
    behind the shipped lego artifact): positive volumes after
    orientation, indices in range, normalized [0,1] coordinates."""
    import os

    import pytest

    path = (
        "/root/reference/diff_render/diftet_6_subdiv/data/cube_40_tet.tet"
    )
    if not os.path.exists(path):
        pytest.skip("reference quartet grid not available")
    g = read_tet_file(path)
    assert g.n_vertices == 9472 and g.n_tets == 47472
    assert g.vertices.min() >= 0.0 and g.vertices.max() <= 1.0
    assert g.tets.min() >= 0 and g.tets.max() < g.n_vertices
    c = g.centered_vertices()
    assert abs(c.min() + 0.5) < 1e-6 and abs(c.max() - 0.5) < 1e-6
    # oriented: signed volume of every tet is positive
    p = g.vertices[g.tets]
    v = np.einsum(
        "ij,ij->i",
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
        p[:, 3] - p[:, 0],
    )
    assert (v > 0).all()
