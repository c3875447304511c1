"""Metric parity tests vs hand-computed / numpy oracles.

The reference has no test suite (SURVEY.md §4); these encode the formulas
of utils/point_cloud_utils.py:13-131 against brute-force numpy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deftet_tpu.evals import (
    chamfer_distance,
    chamfer_distance_l1,
    f_score,
    hausdorff_distance,
    iou,
)


def brute_sided(a, b):
    d = np.sum((a[:, None] - b[None]) ** 2, -1)
    return d.min(1), d.argmin(1)


def test_iou_basic():
    pred = jnp.asarray([0.9, 0.9, 0.1, 0.1])
    gt = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    # binarized pred {1,1,0,0}, gt {1,0,1,0}: inter 1, union 3
    assert np.isclose(float(iou(pred, gt, thresh=0.5)), 1.0 / 3.0)


def test_iou_empty_union_is_zero():
    z = jnp.zeros(8)
    assert float(iou(z, z)) == 0.0


def test_chamfer_vs_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(1, 64, 3)).astype(np.float32)
    b = rng.normal(size=(1, 96, 3)).astype(np.float32)
    d_ab, _ = brute_sided(a[0], b[0])
    d_ba, _ = brute_sided(b[0], a[0])
    expect = (np.sqrt(d_ab + 1e-15).mean() + np.sqrt(d_ba + 1e-15).mean()) / 2
    got = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b))[0])
    assert np.isclose(got, expect, rtol=1e-5)


def test_chamfer_l1_vs_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 50, 3)).astype(np.float32)
    b = rng.normal(size=(1, 70, 3)).astype(np.float32)
    _, i_ab = brute_sided(a[0], b[0])
    _, i_ba = brute_sided(b[0], a[0])
    expect = np.abs(a[0] - b[0][i_ab]).sum(-1).mean() + np.abs(
        b[0] - a[0][i_ba]
    ).sum(-1).mean()
    got = float(chamfer_distance_l1(jnp.asarray(a), jnp.asarray(b))[0])
    assert np.isclose(got, expect, rtol=1e-5)


def test_f_score_perfect_match():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(1, 32, 3)).astype(np.float32)
    s = float(f_score(jnp.asarray(a), jnp.asarray(a), radius=0.01)[0])
    assert s > 0.999


def test_f_score_no_match():
    a = jnp.zeros((1, 16, 3))
    b = jnp.ones((1, 16, 3))
    assert float(f_score(a, b, radius=0.01)[0]) < 1e-6


@pytest.mark.parametrize("extend", [False, True])
def test_f_score_extend_runs(extend):
    rng = np.random.default_rng(3)
    a = rng.normal(size=(1, 40, 3)).astype(np.float32)
    b = a + rng.normal(scale=0.005, size=a.shape).astype(np.float32)
    s = float(f_score(jnp.asarray(a), jnp.asarray(b), extend=extend)[0])
    assert 0.0 <= s <= 1.0


def test_hausdorff_same_mesh_is_zero():
    # unit right triangle, sampled points on it -> distance ~0
    verts = jnp.asarray(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]
    )
    faces = jnp.asarray([[[0, 1, 2]]], dtype=jnp.int32)
    mask = jnp.ones((1, 1))
    pts = jnp.asarray([[[0.2, 0.2, 0.0], [0.1, 0.5, 0.0]]])
    avg, mx = hausdorff_distance(
        verts, faces, mask, verts, faces, mask, pts, pts
    )
    assert float(avg[0]) < 1e-5
    assert float(mx[0]) < 1e-5


def test_hausdorff_offset_plane():
    verts_a = jnp.asarray(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]
    )
    verts_b = verts_a.at[..., 2].add(0.5)  # lifted by 0.5 in z
    faces = jnp.asarray([[[0, 1, 2]]], dtype=jnp.int32)
    mask = jnp.ones((1, 1))
    pts_a = jnp.asarray([[[0.2, 0.2, 0.0]]])
    pts_b = jnp.asarray([[[0.2, 0.2, 0.5]]])
    avg, mx = hausdorff_distance(
        verts_a, faces, mask, verts_b, faces, mask, pts_a, pts_b
    )
    assert np.isclose(float(avg[0]), 0.5, atol=1e-5)
    assert np.isclose(float(mx[0]), 0.5, atol=1e-5)
