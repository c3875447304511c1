"""Tests for the point-query kernels against numpy/torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deftet_tpu.ops import (
    avg_voxelize,
    check_sign,
    det3x3,
    nearest_neighbor,
    point_to_mesh_squared_distance,
    points_in_tets,
    safe_inverse3x3,
    sided_squared_distance,
    trilinear_devoxelize,
)
from deftet_tpu.ops.tri_distance import point_triangle_squared_distance
from deftet_tpu.ops.point_tet import paste_occupancy
from deftet_tpu.tetgrid import build_tet_grid


def _cube_mesh(center=(0.0, 0.0, 0.0), half=0.25):
    c = np.asarray(center)
    corners = np.array(
        [
            [x, y, z]
            for x in (-half, half)
            for y in (-half, half)
            for z in (-half, half)
        ]
    ) + c
    # 12 triangles, outward-oriented (orientation irrelevant for parity).
    faces = np.array(
        [
            [0, 1, 3], [0, 3, 2],  # x = -h
            [4, 6, 7], [4, 7, 5],  # x = +h
            [0, 4, 5], [0, 5, 1],  # y = -h
            [2, 3, 7], [2, 7, 6],  # y = +h
            [0, 2, 6], [0, 6, 4],  # z = -h
            [1, 5, 7], [1, 7, 3],  # z = +h
        ]
    )
    return corners, faces


def test_det_and_inverse():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(64, 3, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(det3x3(jnp.asarray(m))), np.linalg.det(m), rtol=1e-4
    )
    inv, valid = safe_inverse3x3(jnp.asarray(m))
    assert np.asarray(valid).all()
    np.testing.assert_allclose(
        np.asarray(inv), np.linalg.inv(m), rtol=1e-3, atol=1e-4
    )
    # singular input -> identity-inverse + zero mask
    sing = np.zeros((1, 3, 3), np.float32)
    inv, valid = safe_inverse3x3(jnp.asarray(sing))
    assert np.asarray(valid)[0] == 0.0
    np.testing.assert_allclose(np.asarray(inv)[0], np.eye(3), atol=1e-6)


def test_nearest_neighbor_vs_numpy():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 37, 3)).astype(np.float32)
    p = rng.normal(size=(2, 153, 3)).astype(np.float32)
    d2, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(p), chunk=32)
    ref = np.linalg.norm(q[:, :, None] - p[:, None], axis=-1) ** 2
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(-1))
    np.testing.assert_allclose(np.asarray(d2), ref.min(-1), atol=1e-4)


def test_sided_distance_gradients_flow():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(1, 11, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 29, 3)).astype(np.float32))

    def loss(a_, b_):
        d2, _ = sided_squared_distance(a_, b_, chunk=16)
        return jnp.mean(jnp.sqrt(d2 + 1e-10))

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    assert np.isfinite(np.asarray(ga)).all()
    assert np.abs(np.asarray(ga)).sum() > 0
    assert np.abs(np.asarray(gb)).sum() > 0  # grads reach the gathered cloud


def test_check_sign_cube():
    verts, faces = _cube_mesh()
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.5, 0.5, size=(1, 500, 3)).astype(np.float32)
    inside_ref = (np.abs(pts) < 0.25).all(-1).astype(np.float32)
    occ = check_sign(
        jnp.asarray(verts[None]), jnp.asarray(faces[None]), jnp.asarray(pts),
        chunk=8,
    )
    np.testing.assert_array_equal(np.asarray(occ), inside_ref)


def test_check_sign_face_padding():
    verts, faces = _cube_mesh()
    pad_faces = np.concatenate([faces, np.zeros((5, 3), np.int64)], 0)
    pts = np.array([[[0.0, 0.0, 0.0], [0.4, 0.4, 0.4]]], np.float32)
    occ = check_sign(
        jnp.asarray(verts[None]),
        jnp.asarray(pad_faces[None]),
        jnp.asarray(pts),
        n_valid_faces=jnp.asarray([faces.shape[0]]),
        chunk=4,
    )
    np.testing.assert_array_equal(np.asarray(occ), [[1.0, 0.0]])


def test_points_in_tets_grid():
    grid = build_tet_grid(3)
    verts = grid.centered_vertices().astype(np.float32)
    tet_pos = verts[grid.tets][None]  # (1, T, 4, 3)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-0.49, 0.49, size=(1, 200, 3)).astype(np.float32)
    cond = np.asarray(points_in_tets(jnp.asarray(tet_pos), jnp.asarray(pts),
                                     chunk=64))
    assert (cond >= 0).all()  # grid covers the box
    # verify membership via barycentric solve
    t = tet_pos[0][cond[0]]  # (P, 4, 3)
    m = np.stack([t[:, 1] - t[:, 0], t[:, 2] - t[:, 0], t[:, 3] - t[:, 0]], 2)
    bary = np.linalg.solve(m, (pts[0] - t[:, 0])[..., None])[..., 0]
    assert (bary > -1e-4).all()
    assert (bary.sum(-1) < 1 + 1e-4).all()
    # points outside the box -> -1
    far = np.full((1, 3, 3), 2.0, np.float32)
    cond_far = points_in_tets(jnp.asarray(tet_pos), jnp.asarray(far), chunk=64)
    assert (np.asarray(cond_far) == -1).all()


def test_paste_occupancy():
    occ = jnp.asarray([[0.1, 0.9, 0.5]])
    cond = jnp.asarray([[2, -1, 1]])
    out = np.asarray(paste_occupancy(occ, cond))
    np.testing.assert_allclose(out, [[0.5, 0.1, 0.9]])


def test_point_triangle_distance_vs_dense_sampling():
    rng = np.random.default_rng(5)
    tri = rng.normal(size=(50, 3, 3)).astype(np.float32)
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 2
    d2 = np.asarray(
        point_triangle_squared_distance(
            jnp.asarray(pts), jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]),
            jnp.asarray(tri[:, 2]),
        )
    )
    # dense barycentric sampling oracle
    n = 120
    u, v = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    keep = (u + v) <= 1.0
    u, v = u[keep], v[keep]
    w = 1 - u - v
    surf = (
        w[None, :, None] * tri[:, None, 0]
        + u[None, :, None] * tri[:, None, 1]
        + v[None, :, None] * tri[:, None, 2]
    )  # (T, S, 3)
    ref = ((surf - pts[:, None]) ** 2).sum(-1).min(1)
    assert (d2 <= ref + 1e-5).all()
    np.testing.assert_allclose(d2, ref, atol=2e-3)


def test_point_mesh_distance_masked_and_grads():
    verts, faces = _cube_mesh()
    tri = verts[faces][None].astype(np.float32)  # (1, 12, 3, 3)
    # off-center queries: strictly inside one face's region (no argmin ties)
    pts = np.array([[[0.1, -0.05, 0.4], [0.5, 0.03, 0.07]]], np.float32)
    mask = np.ones((1, 12), np.float32)
    d2, idx = point_to_mesh_squared_distance(
        jnp.asarray(pts), jnp.asarray(tri), jnp.asarray(mask), chunk=4
    )
    np.testing.assert_allclose(
        np.asarray(d2)[0], [0.15**2, 0.25**2], atol=1e-5
    )
    # mask out +z faces: first point's nearest becomes a side face
    mask2 = mask.copy()
    mask2[0, 10:12] = 0.0
    d2b, _ = point_to_mesh_squared_distance(
        jnp.asarray(pts), jnp.asarray(tri), jnp.asarray(mask2), chunk=4
    )
    assert np.asarray(d2b)[0, 0] > np.asarray(d2)[0, 0]

    # finite-difference gradient on triangle vertices
    def loss(t):
        d2_, _ = point_to_mesh_squared_distance(
            jnp.asarray(pts), t, jnp.asarray(mask), chunk=4
        )
        return jnp.sum(d2_)

    g = np.asarray(jax.grad(loss)(jnp.asarray(tri)))
    eps = 1e-3
    # probe gradients on the argmin faces of the two query points
    idx_np = np.asarray(idx)[0]
    for p_i, f_ in enumerate(idx_np):
        for v_ in range(3):
            for c_ in range(3):
                tp = tri.copy()
                tp[0, f_, v_, c_] += eps
                tm = tri.copy()
                tm[0, f_, v_, c_] -= eps
                fd = (loss(jnp.asarray(tp)) - loss(jnp.asarray(tm))) / (
                    2 * eps
                )
                np.testing.assert_allclose(
                    g[0, f_, v_, c_], fd, atol=2e-2,
                    err_msg=f"point {p_i} face {f_} vert {v_} coord {c_}",
                )


def test_avg_voxelize_scatter_mean():
    feats = jnp.asarray(
        np.array([[[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]], np.float32)
    )
    coords = jnp.asarray(np.array([[[0, 0, 0], [0, 0, 0], [1, 1, 1]]]))
    out = np.asarray(avg_voxelize(feats, coords, 2))
    np.testing.assert_allclose(out[0, 0, 0, 0], [2.0, 3.0])
    np.testing.assert_allclose(out[0, 1, 1, 1], [5.0, 6.0])
    assert np.abs(out).sum() == pytest.approx(16.0)


def test_trilinear_devoxelize_vs_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(6)
    r, c, n = 5, 4, 64
    vox = rng.normal(size=(2, r, r, r, c)).astype(np.float32)
    coords = rng.uniform(-1.0, r, size=(2, n, 3)).astype(np.float32)
    got = np.asarray(
        trilinear_devoxelize(jnp.asarray(vox), jnp.asarray(coords))
    )

    # reference path: torch grid_sample on (B, C, X, Y, Z) with flipped grid
    # (pv_module/functional/devoxelization.py:44-50)
    t_vox = torch.from_numpy(vox).permute(0, 4, 1, 2, 3).contiguous()
    t_coords = torch.from_numpy(np.clip(coords, 0, r - 1))
    grid = (t_coords * 2 + 1.0) / r - 1.0
    grid = grid.reshape(2, 1, 1, -1, 3).flip(-1)
    ref = F.grid_sample(
        t_vox, grid, padding_mode="border", align_corners=False
    )
    ref = ref.squeeze(2).squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_devoxelize_grads_to_coords():
    rng = np.random.default_rng(7)
    vox = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(0.5, 2.5, size=(1, 8, 3)).astype(np.float32)
    )

    def loss(v, cc):
        return jnp.sum(trilinear_devoxelize(v, cc) ** 2)

    gv, gc = jax.grad(loss, argnums=(0, 1))(vox, coords)
    assert np.abs(np.asarray(gv)).sum() > 0
    assert np.abs(np.asarray(gc)).sum() > 0


def test_occupancy_from_grid_matches_check_sign():
    """Grid-texture occupancy oracle vs exact ray parity on a blob."""
    from deftet_tpu.data.pipeline import occupancy_grid
    from deftet_tpu.data.shapes import random_shape
    from deftet_tpu.ops import check_sign, occupancy_from_grid

    verts, faces = random_shape(3, level=2)
    grid = occupancy_grid(verts, faces, 48)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.52, 0.52, (2000, 3)).astype(np.float32)

    exact = np.asarray(
        check_sign(
            jnp.asarray(verts)[None].astype(jnp.float32),
            jnp.asarray(faces)[None],
            jnp.asarray(pts)[None],
        )
    )[0]
    approx = np.asarray(
        occupancy_from_grid(jnp.asarray(grid)[None], jnp.asarray(pts)[None])
    )[0]
    agreement = float((exact == approx).mean())
    assert agreement > 0.97, f"grid oracle agreement too low: {agreement}"


def test_pallas_nn_matches_xla_interpret():
    """Fused pallas NN kernel vs the XLA oracle (interpret mode on CPU)."""
    from deftet_tpu.ops.nearest import nearest_neighbor
    from deftet_tpu.ops.nearest_pallas import nearest_neighbor_pallas

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 700, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-1, 1, (2, 300, 3)).astype(np.float32))
    nv = jnp.asarray([300, 180], jnp.int32)
    d_ref, i_ref = nearest_neighbor(q, r, nv, use_pallas=False)
    d_pal, i_pal = nearest_neighbor_pallas(
        q, r, nv, tile_p=256, m_chunk=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pal))
    np.testing.assert_allclose(
        np.asarray(d_ref), np.asarray(d_pal), rtol=1e-5, atol=1e-6
    )


def test_pallas_nn_big_reference_cloud(monkeypatch):
    """M past the VMEM residency cap takes the ref-chunk scan path (the
    100k-point eval protocol blew the 16MB scoped-vmem limit before)."""
    from deftet_tpu.ops import nearest_pallas
    from deftet_tpu.ops.nearest import nearest_neighbor

    monkeypatch.setattr(nearest_pallas, "_M_RESIDENT_CAP", 512)
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 700, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-1, 1, (2, 1300, 3)).astype(np.float32))
    nv = jnp.asarray([1300, 600], jnp.int32)  # 600: masked tail spans
    d_ref, i_ref = nearest_neighbor(q, r, nv, use_pallas=False)
    d_pal, i_pal = nearest_pallas.nearest_neighbor_pallas(
        q, r, nv, tile_p=256, m_chunk=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pal))
    np.testing.assert_allclose(
        np.asarray(d_ref), np.asarray(d_pal), rtol=1e-5, atol=1e-6
    )


def test_pallas_tri_argmin_matches_xla_interpret():
    from deftet_tpu.ops.tri_distance import (
        point_to_mesh_squared_distance,
        point_triangle_squared_distance,
    )
    from deftet_tpu.ops.tri_distance_pallas import tri_argmin_pallas

    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.uniform(-1, 1, (2, 300, 3)).astype(np.float32))
    tri = jnp.asarray(rng.uniform(-1, 1, (2, 200, 3, 3)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(2, 200)) > 0.3).astype(np.float32))
    d_ref, _ = point_to_mesh_squared_distance(pts, tri, mask)
    idx = tri_argmin_pallas(pts, tri, mask, tile_p=128, f_chunk=64,
                            interpret=True)
    sel = jnp.take_along_axis(
        tri, idx[:, :, None, None].astype(jnp.int32), axis=1
    )
    d_pal = point_triangle_squared_distance(
        pts, sel[..., 0, :], sel[..., 1, :], sel[..., 2, :]
    )
    np.testing.assert_allclose(
        np.asarray(d_ref), np.asarray(d_pal), rtol=1e-4, atol=1e-6
    )


def test_pallas_lattice_stencil_matches_conv():
    """Masked-shift stencil kernel vs the depthwise-conv formulation
    (value + gradient, interpret mode on CPU)."""
    from deftet_tpu.nn import LatticeAdjacency
    from deftet_tpu.ops.stencil_pallas import lattice_neighbor_mean
    from deftet_tpu.tetgrid import build_tet_grid
    from deftet_tpu.train.statics import lattice_offsets

    grid = build_tet_grid(4)
    offsets = lattice_offsets(grid)
    from deftet_tpu.tetgrid import build_topology

    topo = build_topology(grid.tets, grid.n_vertices)
    adj = LatticeAdjacency(offsets=offsets, degree=jnp.asarray(topo.vert_degree))
    n = grid.resolution + 1

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, n**3, 130)).astype(np.float32))
    ref = adj.matmul(x)  # conv path (CPU: pallas auto-dispatch is off)
    inv_deg = 1.0 / jnp.maximum(adj.degree, 1).astype(jnp.float32)
    got = lattice_neighbor_mean(
        x, inv_deg, n, tuple(tuple(o) for o in offsets), True
    )
    # bf16 storage inside the kernel: bf16-level tolerance
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=3e-2, atol=3e-2
    )

    # gradient: S is self-transpose, VJP = S(invdeg * g)
    w = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda a: jnp.sum(adj.matmul(a) * w))(x)
    g_got = jax.grad(
        lambda a: jnp.sum(
            lattice_neighbor_mean(
                a, inv_deg, n, tuple(tuple(o) for o in offsets), True
            ) * w
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_got), rtol=3e-2, atol=3e-2
    )


def test_pallas_nn_query_tile_skip():
    """Tiles past n_queries are skipped; the real prefix is unchanged."""
    from deftet_tpu.ops.nearest import nearest_neighbor
    from deftet_tpu.ops.nearest_pallas import nearest_neighbor_pallas

    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.uniform(-1, 1, (1, 700, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-1, 1, (1, 200, 3)).astype(np.float32))
    n_q = jnp.asarray([300], jnp.int32)
    d_ref, i_ref = nearest_neighbor(q, r, use_pallas=False)
    d_s, i_s = nearest_neighbor_pallas(
        q, r, n_queries=n_q, tile_p=128, m_chunk=64, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(i_ref)[0, :300], np.asarray(i_s)[0, :300]
    )
    np.testing.assert_allclose(
        np.asarray(d_ref)[0, :300], np.asarray(d_s)[0, :300],
        rtol=1e-5, atol=1e-6,
    )
    # tiles fully past n_queries (>=384 with tile 128) were skipped
    np.testing.assert_array_equal(np.asarray(i_s)[0, 384:], 0)
    np.testing.assert_array_equal(np.asarray(d_s)[0, 384:], 0.0)


def test_pallas_tri_argmin_chunk_skip():
    """Face chunks past the last unmasked face are skipped without
    changing the argmin on the masked set."""
    from deftet_tpu.ops.tri_distance import point_to_mesh_squared_distance
    from deftet_tpu.ops.tri_distance_pallas import tri_argmin_pallas

    rng = np.random.default_rng(10)
    pts = jnp.asarray(rng.uniform(-1, 1, (1, 90, 3)).astype(np.float32))
    tri = jnp.asarray(rng.uniform(-1, 1, (1, 300, 3, 3)).astype(np.float32))
    mask = np.zeros((1, 300), np.float32)
    mask[0, :70] = 1.0  # only the first 70 faces are real
    idx = tri_argmin_pallas(
        pts, tri, jnp.asarray(mask), tile_p=64, f_chunk=64, interpret=True
    )
    from deftet_tpu.ops.tri_distance import _argmin_face_single

    idx_ref = _argmin_face_single(pts[0], tri[0], jnp.asarray(mask)[0], 64)
    np.testing.assert_array_equal(np.asarray(idx)[0], np.asarray(idx_ref))


def test_pallas_lattice_stencil_bf16_grad_dtype():
    """bf16 activations through the stencil custom-vjp: cotangent dtype
    must match the primal (TPU-only dispatch bug regression test)."""
    from deftet_tpu.ops.stencil_pallas import lattice_neighbor_mean
    from deftet_tpu.tetgrid import build_tet_grid
    from deftet_tpu.train.statics import lattice_offsets

    grid = build_tet_grid(3)
    offs = tuple(tuple(o) for o in lattice_offsets(grid))
    n = grid.resolution + 1
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.normal(size=(1, n**3, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    inv_deg = jnp.ones((n**3,), jnp.float32)

    def f(a):
        return jnp.sum(
            lattice_neighbor_mean(a, inv_deg, n, offs, True).astype(
                jnp.float32
            ) ** 2
        )

    g = jax.grad(f)(x)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()
