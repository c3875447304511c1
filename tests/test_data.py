"""Tests for procedural shapes and the preprocessing pipeline."""

import numpy as np

from deftet_tpu.data import (
    ShapeDataset,
    batch_iterator,
    build_dataset,
    make_blob,
    make_box,
    make_ellipsoid,
    make_example,
    make_torus,
    mesh_sdf_points,
    random_shape,
    sample_surface,
)


def _is_closed(verts, faces):
    """Every edge must appear exactly twice with opposite orientation."""
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    fwd = set(map(tuple, e))
    if len(fwd) != e.shape[0]:
        return False  # duplicated directed edge
    return all((b, a) in fwd for a, b in fwd)


def test_all_families_watertight_and_normalized():
    rng = np.random.default_rng(0)
    for maker in (make_blob, make_ellipsoid, make_box, make_torus):
        verts, faces = maker(rng)
        assert _is_closed(verts, faces), maker.__name__
        ext = verts.max(0) - verts.min(0)
        assert np.isclose(ext.max(), 0.9, atol=1e-6), maker.__name__
        assert np.abs(verts.max(0) + verts.min(0)).max() < 1e-6


def test_random_shape_deterministic():
    v1, f1 = random_shape(7)
    v2, f2 = random_shape(7)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


def test_sample_surface_on_mesh():
    rng = np.random.default_rng(1)
    verts, faces = make_ellipsoid(rng, level=3)
    pts = sample_surface(verts, faces, 2000, rng)
    # points should be close to the ellipsoid surface: use the implicit form
    scale = verts.max(0)  # semi-axes
    r = np.linalg.norm(pts / scale, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=0.05)


def test_sdf_sign_and_magnitude_sphere():
    rng = np.random.default_rng(2)
    verts, faces = make_blob(rng, level=3, n_bumps=0)  # plain sphere r=0.45
    pts, sdf = mesh_sdf_points(verts, faces, 3000, rng)
    r = np.linalg.norm(pts, axis=1)
    inside = r < 0.44
    outside = r > 0.46
    assert (sdf[inside] > 0).all()
    assert (sdf[outside] < 0).all()
    np.testing.assert_allclose(
        np.abs(sdf[outside]), (r - 0.45)[outside], atol=0.02
    )


def test_dataset_and_batching(tmp_path):
    paths = build_dataset(
        str(tmp_path), n_shapes=3, n_surface=256, n_sdf=128, level=1
    )
    ds = ShapeDataset(paths)
    item = ds[0]
    assert item["verts"].shape == (ds.max_verts, 3)
    assert item["surface_points"].shape == (256, 3)
    batches = list(batch_iterator(ds, 2, np.random.default_rng(0)))
    assert len(batches) == 1  # drop_last
    b = batches[0]
    assert b["surface_points"].shape == (2, 256, 3)
    assert b["faces"].shape[0] == 2
    assert b["n_faces"].dtype == np.int32
    # rebuild hits the cache (files already exist)
    paths2 = build_dataset(
        str(tmp_path), n_shapes=3, n_surface=256, n_sdf=128, level=1
    )
    assert paths2 == paths


def test_make_example_schema():
    rng = np.random.default_rng(3)
    verts, faces = make_box(rng)
    ex = make_example(verts, faces, 64, 32, rng)
    assert set(ex) == {
        "surface_points", "sdf_points", "sdf", "occ_grid", "verts", "faces",
    }
    assert ex["sdf"].shape == (32,)


def test_categories_in_records(tmp_path):
    from deftet_tpu.data import ShapeDataset, batch_iterator, build_dataset

    paths = build_dataset(
        str(tmp_path / "cat"), n_shapes=4, n_surface=64, n_sdf=32,
        seed=0, level=1,
    )
    ds = ShapeDataset(paths)
    item = ds[0]
    assert item["category"] in {"blob", "ellipsoid", "box", "torus"}
    batch = next(batch_iterator(ds, 2))
    assert isinstance(batch["category"], list)
    assert len(batch["category"]) == 2
    assert isinstance(batch["surface_points"], np.ndarray)


def test_occupancy_grid_column_algorithm_matches_pointwise():
    from deftet_tpu.data.pipeline import (
        OCC_GRID_EXTENT,
        _check_sign_np,
        occupancy_grid,
    )
    from deftet_tpu.data.shapes import random_shape

    verts, faces = random_shape(7, level=1)
    g = 16
    grid = occupancy_grid(verts, faces, g)
    c = -OCC_GRID_EXTENT + (np.arange(g) + 0.5) / g * (2 * OCC_GRID_EXTENT)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    ref = _check_sign_np(verts, faces, pts).reshape(g, g, g)
    np.testing.assert_array_equal(grid, ref)


def test_check_sign_rast_matches_pointwise():
    from deftet_tpu.data.pipeline import _check_sign_np, _check_sign_rast
    from deftet_tpu.data.shapes import random_shape

    rng = np.random.default_rng(3)
    for seed in (1, 4, 9):
        verts, faces = random_shape(seed, level=2)
        pts = 1.05 * (rng.uniform(size=(3000, 3)) - 0.5)
        np.testing.assert_array_equal(
            _check_sign_rast(verts, faces, pts),
            _check_sign_np(verts, faces, pts),
        )


def test_min_sq_distance_kd_path_exact():
    # force the KD-tree branch (> 2048 faces) via a watertight remesh and
    # compare against the brute-force chunked loop
    from deftet_tpu.data.pipeline import (
        _min_sq_distance,
        _point_triangle_sq_np,
    )
    from deftet_tpu.data.shapes import random_shape
    from deftet_tpu.data.watertight import watertight_from_mesh

    v0, f0 = random_shape(2, level=2)
    verts, faces = watertight_from_mesh(v0, f0, res=24)
    assert faces.shape[0] > 2048, "need the KD branch"
    rng = np.random.default_rng(0)
    pts = 1.05 * (rng.uniform(size=(500, 3)) - 0.5)
    fast = _min_sq_distance(pts, verts, faces)
    tri = verts[faces].astype(np.float64)
    brute = np.full(len(pts), np.inf)
    for s in range(0, len(tri), 512):
        t = tri[s : s + 512]
        brute = np.minimum(
            brute,
            _point_triangle_sq_np(
                pts[:, None], t[None, :, 0], t[None, :, 1], t[None, :, 2]
            ).min(1),
        )
    np.testing.assert_allclose(fast, brute, rtol=0, atol=1e-12)
