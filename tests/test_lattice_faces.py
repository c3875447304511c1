"""Golden tests: lattice-class-ordered faces vs the generic builders."""

import numpy as np
import pytest

from deftet_tpu.tetgrid.grid import build_tet_grid
from deftet_tpu.tetgrid.lattice_faces import (
    build_lattice_faces,
    edge_class_table,
    face_class_table,
    face_lattice_info,
    face_valid_mask,
)
from deftet_tpu.tetgrid.topology import build_faces


def _key(tri, n):
    tri = np.sort(np.asarray(tri, np.int64), axis=-1)
    return (tri[..., 0] * n + tri[..., 1]) * n + tri[..., 2]


@pytest.mark.parametrize("r", [2, 3, 5])
def test_lattice_faces_match_build_faces(r):
    g = build_tet_grid(r)
    n = g.n_vertices
    ref_face, ref_tet, ref_slot, ref_hull = build_faces(g.tets, n)
    lat_face, lat_tet, lat_slot, valid, lat_hull = build_lattice_faces(r)

    assert lat_face.shape == (12 * r**3, 3)
    assert valid.sum() == ref_face.shape[0]

    # the valid slots are exactly the interior faces, with identical
    # orientation, owner pair and slot pair (matched through sorted keys)
    ref_keys = _key(ref_face, n)
    lat_keys = _key(lat_face[valid], n)
    order_ref = np.argsort(ref_keys)
    order_lat = np.argsort(lat_keys)
    assert (ref_keys[order_ref] == lat_keys[order_lat]).all()
    np.testing.assert_array_equal(
        ref_face[order_ref], lat_face[valid][order_lat]
    )
    np.testing.assert_array_equal(
        ref_tet[order_ref], lat_tet[valid][order_lat]
    )
    np.testing.assert_array_equal(
        ref_slot[order_ref], lat_slot[valid][order_lat]
    )

    # invalid slots: self-paired owners (the gather-path correctness trick)
    inv_tet = lat_tet[~valid]
    np.testing.assert_array_equal(inv_tet[:, 0], inv_tet[:, 1])

    # complete hull reconstruction (invalid slots + partner-side faces)
    assert lat_hull.shape[0] == ref_hull.shape[0]
    assert set(_key(lat_hull, n).tolist()) == set(_key(ref_hull, n).tolist())
    # invalid slots' faces are hull faces
    hull_keys = set(_key(ref_hull, n).tolist())
    assert set(_key(lat_face[~valid], n).tolist()) <= hull_keys

    # validity mask reshape agrees
    np.testing.assert_array_equal(
        face_valid_mask(r).reshape(-1), valid
    )


def test_face_classes_shape():
    classes = face_class_table()
    assert len(classes) == 12
    internal = [c for c in classes if c.delta == (0, 0, 0)]
    assert len(internal) == 6
    for c in classes:
        assert sum(abs(d) for d in c.delta) <= 1


def test_edge_class_table_counts():
    table = edge_class_table()
    assert len(table) == 7
    # total (face, edge) incidences per cell = 3 faces-edges * 12 classes
    assert sum(len(t) for t in table) == 36
    for t in table:
        assert len(t) in (4, 6)


def test_face_lattice_info_gates():
    g = build_tet_grid(3)
    info = face_lattice_info(g)
    assert info is not None and info.res == 3
    assert hash(info) == hash(face_lattice_info(build_tet_grid(3)))
    # irregular topology (subset of tets) -> None
    import dataclasses as dc

    broken = dc.replace(g, tets=g.tets[: g.n_tets - 5])
    assert face_lattice_info(broken) is None
