"""Watertight remeshing tests: closedness, volume preservation, smoothing."""

import numpy as np

from deftet_tpu.data.shapes import icosphere, make_box
from deftet_tpu.data.watertight import (
    laplacian_smooth,
    voxel_surface,
    voxelize_occupancy,
    watertight_from_mesh,
)


def _is_closed(faces: np.ndarray) -> bool:
    """Closed boundary: for every undirected edge, the two directions are
    used equally often.  (Voxel surfaces may contain orientation-consistent
    non-manifold edges where diagonally-adjacent cells touch; those still
    pass ray-parity watertightness.)"""
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    ).astype(np.int64)
    n = int(faces.max()) + 1
    directed = e[:, 0] * n + e[:, 1]
    swapped = e[:, 1] * n + e[:, 0]
    return np.array_equal(np.sort(directed), np.sort(swapped))


def test_voxel_surface_of_full_cube():
    occ = np.ones((4, 4, 4), np.float32)
    verts, faces = voxel_surface(occ, 4)
    assert _is_closed(faces)
    # surface of the full cube: 6 sides * 16 quads * 2 tris
    assert faces.shape[0] == 6 * 16 * 2


def test_voxelize_occupancy_sphere_volume():
    verts, faces = icosphere(3)
    verts = verts * 0.45  # radius .45 inside the unit box
    occ = voxelize_occupancy(verts, faces, 32)
    vol = occ.mean()  # fraction of box occupied
    expect = 4.0 / 3.0 * np.pi * 0.45**3
    assert abs(vol - expect) < 0.05 * expect


def test_watertight_from_mesh_end_to_end():
    rng = np.random.default_rng(1)
    verts, faces = make_box(rng)
    wv, wf = watertight_from_mesh(verts, faces, res=24)
    assert _is_closed(wf)
    assert np.abs(wv).max() <= 0.46  # inside the 0.9 box
    # ray-parity watertightness: clearly-inside / clearly-outside points
    # classify correctly against the remeshed surface
    from deftet_tpu.data.pipeline import _check_sign_np

    inside = _check_sign_np(wv, wf, np.zeros((1, 3)))
    outside = _check_sign_np(wv, wf, np.asarray([[0.49, 0.49, 0.49]]))
    assert inside[0] == 1.0 and outside[0] == 0.0
    # surface area should be in a sane range (smoothed voxel box)
    tri = wv[wf]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum()
    assert 1.0 < area < 8.0


def test_laplacian_smooth_shrinks_noise():
    verts, faces = icosphere(2)
    noisy = verts + np.random.default_rng(0).normal(
        scale=0.02, size=verts.shape
    )
    smoothed = laplacian_smooth(noisy, faces, iterations=3, alpha=0.5)
    # smoothing removes high-frequency noise: relative radius spread drops
    # (uniform laplacian also shrinks, so compare std/mean, not |r - 1|)
    r_n = np.linalg.norm(noisy, axis=1)
    r_s = np.linalg.norm(smoothed, axis=1)
    assert r_s.std() / r_s.mean() < r_n.std() / r_n.mean()
