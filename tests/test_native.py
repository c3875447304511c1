"""Native C++ topology builders vs their numpy golden twins."""

import numpy as np
import pytest

from deftet_tpu.native import (
    build_edge_face_pairs_native,
    build_faces_native,
    build_tet_neighbors_native,
    build_topology_native,
    build_vertex_adjacency_native,
    collapse_vertices_native,
    native_available,
)
from deftet_tpu.tetgrid import build_tet_grid
from deftet_tpu.tetgrid.topology import (
    build_edge_face_pairs,
    build_faces,
    build_tet_neighbors,
    build_topology,
    build_vertex_adjacency,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no g++ in environment"
)


@pytest.fixture(scope="module", params=[1, 2, 3])
def grid(request):
    return build_tet_grid(request.param)


def test_faces_match_numpy(grid):
    ref = build_faces(grid.tets, grid.n_vertices)
    got = build_faces_native(grid.tets, grid.n_vertices)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_vertex_adjacency_match(grid):
    ri, rm, rd = build_vertex_adjacency(grid.tets, grid.n_vertices)
    gi, gm, gd = build_vertex_adjacency_native(grid.tets, grid.n_vertices)
    np.testing.assert_array_equal(rd, gd)
    np.testing.assert_array_equal(ri, gi)
    np.testing.assert_array_equal(rm, gm)


def test_tet_neighbors_match(grid):
    _, ft, fs, _ = build_faces(grid.tets, grid.n_vertices)
    ref = build_tet_neighbors(ft, fs, grid.n_tets)
    got = build_tet_neighbors_native(ft, fs, grid.n_tets)
    np.testing.assert_array_equal(ref, got)


def test_edge_pairs_match_as_sets(grid):
    fv, _, _, _ = build_faces(grid.tets, grid.n_vertices)
    ra, rb = build_edge_face_pairs(fv, grid.n_vertices)
    ga, gb = build_edge_face_pairs_native(fv, grid.n_vertices)
    ref = sorted(zip(ra.tolist(), rb.tolist()))
    got = sorted(zip(ga.tolist(), gb.tolist()))
    assert ref == got


def test_full_topology_match(grid):
    ref = build_topology(grid.tets, grid.n_vertices)
    got = build_topology_native(grid.tets, grid.n_vertices)
    np.testing.assert_array_equal(ref.face_fx3, got.face_fx3)
    np.testing.assert_array_equal(ref.face_tet_fx2, got.face_tet_fx2)
    np.testing.assert_array_equal(ref.vert_adj_idx, got.vert_adj_idx)
    np.testing.assert_array_equal(ref.tet_neighbor_tx4, got.tet_neighbor_tx4)
    assert sorted(zip(ref.edge_pair_fa, ref.edge_pair_fb)) == sorted(
        zip(got.edge_pair_fa, got.edge_pair_fb)
    )


def test_collapse_vertices():
    verts = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 0.0, 0.000001],  # collapses onto vertex 0 at 5 decimals
            [1.0, 0.0, 0.0],       # exact duplicate of vertex 1
        ]
    )
    uniq, remap = collapse_vertices_native(verts, decimals=5)
    assert uniq.shape[0] == 2
    assert remap[0] == remap[2]
    assert remap[1] == remap[3]
    assert remap[0] != remap[1]


def test_native_speed_advantage():
    """Native must beat numpy on a mid-size grid (sanity, generous 1x)."""
    import time

    grid = build_tet_grid(16)
    t0 = time.perf_counter()
    build_faces(grid.tets, grid.n_vertices)
    t_np = time.perf_counter() - t0
    build_faces_native(grid.tets, grid.n_vertices)  # warm (lib loaded)
    t0 = time.perf_counter()
    build_faces_native(grid.tets, grid.n_vertices)
    t_native = time.perf_counter() - t0
    assert t_native < t_np * 1.5, (t_native, t_np)
