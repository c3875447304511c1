"""Tests for the geometric + surface losses against numpy oracles that
re-derive the reference formulas (layers/DefTet/deftet.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from deftet_tpu.losses import (
    amips_energy,
    boundary_faces_from_occupancy,
    delta_loss,
    edge_length,
    laplacian_loss,
    normal_smoothness_loss,
    occupancy_bce,
    sample_surface_points,
    surface_align_losses,
    tet_volumes,
    volume_variance,
)
from deftet_tpu.ops.geometry import tet_rest_inverse
from deftet_tpu.tetgrid import build_tet_grid, build_topology


def _np_volume(tet):
    a = tet[..., 0, :] - tet[..., 3, :]
    b = tet[..., 1, :] - tet[..., 3, :]
    c = tet[..., 2, :] - tet[..., 3, :]
    return -np.einsum("...i,...i->...", a, np.cross(b, c)) / 6.0


def test_tet_volumes_and_variance():
    rng = np.random.default_rng(0)
    tet = rng.normal(size=(2, 9, 4, 3)).astype(np.float32)
    v = np.asarray(tet_volumes(jnp.asarray(tet)))
    np.testing.assert_allclose(v, _np_volume(tet), rtol=1e-4, atol=1e-6)
    var = np.asarray(volume_variance(jnp.asarray(tet), pow=4))
    ref = ((_np_volume(tet) - _np_volume(tet).mean(-1, keepdims=True)) ** 4)
    np.testing.assert_allclose(var, ref.sum(-1), rtol=1e-3, atol=1e-6)


def test_amips_rest_pose_energy():
    """At the rest pose J = I: trace = 3, det = 1 -> energy ~ 3."""
    grid = build_tet_grid(2)
    verts = jnp.asarray(grid.centered_vertices().astype(np.float32))
    tets = jnp.asarray(grid.tets)
    inv = tet_rest_inverse(verts, tets)
    tet_pos = verts[tets][None]
    e = np.asarray(amips_energy(tet_pos, inv))
    np.testing.assert_allclose(e, [3.0], rtol=1e-4)
    # deformation strictly increases the energy
    squished = tet_pos * jnp.asarray([1.0, 1.0, 0.5])
    e2 = np.asarray(amips_energy(squished, inv))
    assert e2[0] > e[0]


def test_amips_inverted_tets_masked():
    grid = build_tet_grid(1)
    verts = jnp.asarray(grid.centered_vertices().astype(np.float32))
    tets = jnp.asarray(grid.tets)
    inv = tet_rest_inverse(verts, tets)
    mirrored = verts[tets][None] * jnp.asarray([-1.0, 1.0, 1.0])
    e = np.asarray(amips_energy(mirrored, inv))
    np.testing.assert_allclose(e, [0.0], atol=1e-6)  # det<0 gated off


def test_edge_length():
    rng = np.random.default_rng(1)
    tet = rng.normal(size=(1, 5, 4, 3)).astype(np.float64)
    got = np.asarray(edge_length(jnp.asarray(tet.astype(np.float32)), pow=4))
    s = 20.0
    A, B, C, D = (tet[..., i, :] * s for i in range(4))
    ref = sum(
        ((x - y) ** 4).sum()
        for x, y in [(A, D), (B, D), (C, D), (A, B), (A, C), (B, C)]
    ) / (6 * 5)
    np.testing.assert_allclose(got, [ref], rtol=1e-4)


def test_laplacian_loss_vs_dense():
    grid = build_tet_grid(2)
    topo = build_topology(grid.tets, grid.n_vertices)
    rng = np.random.default_rng(2)
    off = rng.normal(size=(2, grid.n_vertices, 3)).astype(np.float32)
    got = np.asarray(
        laplacian_loss(
            jnp.asarray(off),
            jnp.asarray(topo.vert_adj_idx),
            jnp.asarray(topo.vert_adj_mask),
            jnp.asarray(topo.vert_degree),
        )
    )
    dense = np.zeros((grid.n_vertices, grid.n_vertices))
    for i in range(grid.n_vertices):
        for m in range(topo.vert_adj_idx.shape[1]):
            if topo.vert_adj_mask[i, m]:
                dense[i, topo.vert_adj_idx[i, m]] = 1.0
    dense /= dense.sum(1, keepdims=True)
    ref = (((dense @ off) - off) ** 2).sum((-1, -2))
    np.testing.assert_allclose(got, ref, rtol=1e-3)


def test_boundary_extraction_mechanics():
    grid = build_tet_grid(2)
    topo = build_topology(grid.tets, grid.n_vertices)
    rng = np.random.default_rng(3)
    occ = (rng.uniform(size=(2, grid.n_tets)) > 0.5).astype(np.float32)
    faces, mask = boundary_faces_from_occupancy(
        jnp.asarray(occ),
        jnp.asarray(topo.face_fx3),
        jnp.asarray(topo.face_tet_fx2),
    )
    faces, mask = np.asarray(faces), np.asarray(mask)
    for bi in range(2):
        for fi in range(topo.face_fx3.shape[0]):
            t0, t1 = topo.face_tet_fx2[fi]
            want_boundary = occ[bi, t0] + occ[bi, t1] == 1.0
            assert mask[bi, fi] == float(want_boundary)
            if occ[bi, t0] == 1.0:
                np.testing.assert_array_equal(
                    faces[bi, fi], topo.face_fx3[fi][::-1]
                )
            else:
                np.testing.assert_array_equal(faces[bi, fi], topo.face_fx3[fi])


def test_sample_surface_points_on_triangle():
    tri = jnp.asarray(
        np.array([[[[0, 0, 0], [1, 0, 0], [0, 1, 0]]]], np.float32)
    )
    pts = np.asarray(
        sample_surface_points(jax.random.PRNGKey(0), tri, per_face=500)
    )[0, 0]
    assert (pts[:, 2] == 0).all()
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-6).all()
    # sqrt-uv sampling is uniform: centroid ~ (1/3, 1/3)
    np.testing.assert_allclose(pts.mean(0)[:2], [1 / 3, 1 / 3], atol=0.03)


def test_normal_smoothness_flat_vs_bent():
    # two coplanar triangles sharing edge (1,2): loss 0
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    from deftet_tpu.tetgrid.topology import (
        build_edge_entries,
        build_face_edge_ids,
        build_vertex_face_incidence,
    )

    from deftet_tpu.tetgrid.topology import build_face_edge_incidence

    efi, efm = build_face_edge_incidence(faces, 4)
    fei = build_face_edge_ids(faces, 4)
    vfi, vfm = build_vertex_face_incidence(faces, 4)
    topo_args = (
        jnp.asarray(efi), jnp.asarray(efm),
        jnp.asarray(fei), jnp.asarray(vfi), jnp.asarray(vfm),
    )
    sign1 = jnp.ones((1, 2), jnp.float32)
    loss_flat = np.asarray(
        normal_smoothness_loss(
            jnp.asarray(verts)[None],
            jnp.asarray(faces),
            jnp.ones((1, 2), jnp.float32),
            sign1,
            topo_args,
        )
    )
    np.testing.assert_allclose(loss_flat, [0.0], atol=1e-6)
    # bend the second face up: loss > 0
    verts2 = verts.copy()
    verts2[3, 2] = 1.0
    loss_bent = np.asarray(
        normal_smoothness_loss(
            jnp.asarray(verts2)[None],
            jnp.asarray(faces),
            jnp.ones((1, 2), jnp.float32),
            sign1,
            topo_args,
        )
    )
    assert loss_bent[0] > 0.1
    # masking one face out -> no pairs -> 0
    loss_masked = np.asarray(
        normal_smoothness_loss(
            jnp.asarray(verts2)[None],
            jnp.asarray(faces),
            jnp.asarray([[1.0, 0.0]]),
            sign1,
            topo_args,
        )
    )
    np.testing.assert_allclose(loss_masked, [0.0], atol=1e-6)
    # segment-sum form == explicit-pair oracle
    from deftet_tpu.losses.surface import normal_smoothness_loss_pairs

    # sign flip of one face must not change the loss value... it does
    # change dot signs, matching a reversed orientation; compare oracle on
    # same orientation first:
    oracle = np.asarray(
        normal_smoothness_loss_pairs(
            jnp.asarray(verts2)[None],
            jnp.asarray(faces)[None],
            jnp.ones((1, 2), jnp.float32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([1], jnp.int32),
        )
    )
    np.testing.assert_allclose(loss_bent, oracle, rtol=1e-5)




def _edge_topo(topo):
    return (
        jnp.asarray(topo.edge_face_idx),
        jnp.asarray(topo.edge_face_mask),
        jnp.asarray(topo.face_edge_ids),
        jnp.asarray(topo.vert_face_inc_idx),
        jnp.asarray(topo.vert_face_inc_mask),
    )

def test_surface_align_losses_shapes_and_no_boundary():
    grid = build_tet_grid(2)
    topo = build_topology(grid.tets, grid.n_vertices)
    verts = jnp.asarray(grid.centered_vertices().astype(np.float32))[None]
    verts = jnp.tile(verts, (2, 1, 1))
    occ = np.zeros((2, grid.n_tets), np.float32)
    occ[0, :8] = 1.0  # sample 0 has a boundary; sample 1 none
    from deftet_tpu.losses import boundary_info_from_occupancy

    mask, sign = boundary_info_from_occupancy(
        jnp.asarray(occ), jnp.asarray(topo.face_tet_fx2)
    )
    gt = jnp.asarray(
        np.random.default_rng(4).uniform(-0.5, 0.5, (2, 64, 3)).astype(
            np.float32
        )
    )
    ch, an, nm = surface_align_losses(
        jax.random.PRNGKey(0),
        verts,
        jnp.asarray(topo.face_fx3),
        mask,
        sign,
        gt,
        _edge_topo(topo),
        per_face_samples=4,
        nn_chunk=64,
        tri_chunk=64,
    )
    ch, an, nm = np.asarray(ch), np.asarray(an), np.asarray(nm)
    assert np.isfinite([ch, an, nm]).all()
    # no-boundary sample falls back to ones (deftet.py:162-166)
    np.testing.assert_allclose([ch[1], an[1], nm[1]], 1.0)
    assert ch[0] != 1.0


def test_occupancy_bce_matches_manual():
    logits = jnp.asarray([[0.3, -1.2, 2.0]])
    target = jnp.asarray([[1.0, 0.0, 1.0]])
    got = float(occupancy_bce(logits, target))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    ref = -(np.asarray(target) * np.log(p) + (1 - target) * np.log(1 - p))
    np.testing.assert_allclose(got, ref.mean(), rtol=1e-5)


def test_delta_loss():
    x = jnp.asarray(np.ones((2, 5, 3), np.float32) * -2.0)
    np.testing.assert_allclose(np.asarray(delta_loss(x)), [2.0, 2.0])


def test_amips_finite_difference_grad():
    grid = build_tet_grid(1)
    verts = grid.centered_vertices().astype(np.float32)
    tets = jnp.asarray(grid.tets)
    inv = tet_rest_inverse(jnp.asarray(verts), tets)
    rng = np.random.default_rng(5)
    pert = verts + 0.02 * rng.normal(size=verts.shape).astype(np.float32)

    def loss(v):
        return amips_energy(v[tets][None], inv)[0]

    g = np.asarray(jax.grad(loss)(jnp.asarray(pert)))
    eps = 1e-3
    for (i, c) in [(3, 0), (7, 2), (0, 1)]:
        vp = pert.copy()
        vp[i, c] += eps
        vm = pert.copy()
        vm[i, c] -= eps
        fd = (loss(jnp.asarray(vp)) - loss(jnp.asarray(vm))) / (2 * eps)
        np.testing.assert_allclose(g[i, c], fd, rtol=2e-2, atol=1e-3)


def test_boundary_subset_equivalence():
    """Capped top-k boundary working set gives identical chamfer/analytic
    losses when the budget covers all boundary faces."""
    from deftet_tpu.losses import select_boundary_subset

    grid = build_tet_grid(2)
    topo = build_topology(grid.tets, grid.n_vertices)
    verts = jnp.asarray(grid.centered_vertices().astype(np.float32))[None]
    occ = np.zeros((1, grid.n_tets), np.float32)
    occ[0, :10] = 1.0
    from deftet_tpu.losses import (
        boundary_info_from_occupancy,
        select_boundary_subset_static,
    )

    mask, sign = boundary_info_from_occupancy(
        jnp.asarray(occ), jnp.asarray(topo.face_tet_fx2)
    )
    n_boundary = int(np.asarray(mask).sum())
    assert n_boundary > 0

    sel_faces, sel_mask = select_boundary_subset_static(
        jnp.asarray(topo.face_fx3), mask, n_boundary + 4
    )
    assert sel_mask.shape[1] == n_boundary + 4
    assert int(np.asarray(sel_mask).sum()) == n_boundary

    gt = jnp.asarray(
        np.random.default_rng(7).uniform(-0.5, 0.5, (1, 32, 3)).astype(
            np.float32
        )
    )
    kwargs = dict(per_face_samples=4, nn_chunk=64, tri_chunk=64)
    full = surface_align_losses(
        jax.random.PRNGKey(0), verts, jnp.asarray(topo.face_fx3), mask,
        sign, gt, _edge_topo(topo),
        **kwargs,
    )
    # Budget >= boundary count: analytic + normal identical; chamfer uses
    # different (but equally distributed) sample placements only when the
    # face order changes, so compare via the same subset path twice.
    capped = surface_align_losses(
        jax.random.PRNGKey(0), verts, jnp.asarray(topo.face_fx3), mask,
        sign, gt, _edge_topo(topo),
        max_boundary_faces=n_boundary + 4, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(full[1]), np.asarray(capped[1]), rtol=1e-5
    )  # analytic
    # the capped path computes normals on the subset and reduces edge
    # sums in bf16 (normal_smoothness_loss_compacted) — bf16 tolerance
    np.testing.assert_allclose(
        np.asarray(full[2]), np.asarray(capped[2]), rtol=1e-2
    )  # normal
    assert np.isfinite(np.asarray(capped[0])).all()


def test_soa_losses_match_tensor_versions():
    from deftet_tpu.losses.geometry import (
        amips_energy_soa,
        edge_length_soa,
        gather_tet_soa,
        tet_centers_soa,
        volume_variance_soa,
        amips_energy,
        edge_length,
        volume_variance,
    )

    grid = build_tet_grid(2)
    rng = np.random.default_rng(9)
    pos = jnp.asarray(
        (grid.centered_vertices()[None]
         + rng.normal(scale=0.01, size=(2, grid.n_vertices, 3))
         ).astype(np.float32)
    )
    tets = jnp.asarray(grid.tets)
    inv = tet_rest_inverse(
        jnp.asarray(grid.centered_vertices().astype(np.float32)), tets
    )
    tet_verts = pos[:, tets]
    soa = gather_tet_soa(pos, tets)

    np.testing.assert_allclose(
        np.asarray(volume_variance_soa(soa)),
        np.asarray(volume_variance(tet_verts)), rtol=1e-4, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(amips_energy_soa(soa, inv)),
        np.asarray(amips_energy(tet_verts, inv)), rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(edge_length_soa(soa)),
        np.asarray(edge_length(tet_verts)), rtol=1e-4,
    )
    centers = jnp.stack(tet_centers_soa(soa), axis=-1)
    np.testing.assert_allclose(
        np.asarray(centers), np.asarray(jnp.mean(tet_verts, axis=2)),
        rtol=1e-5, atol=1e-7,
    )


def test_normal_loss_gradient_matches_pair_oracle():
    """The scatter-free static-sign formulation must match the explicit
    pair formulation in VALUE and GRADIENT wrt vertex positions, with a
    flipped-orientation (sign = -1) face in play."""
    from deftet_tpu.losses import (
        boundary_info_from_occupancy,
        normal_smoothness_loss,
    )
    from deftet_tpu.losses.surface import normal_smoothness_loss_pairs

    grid = build_tet_grid(2)
    topo = build_topology(grid.tets, grid.n_vertices)
    rng = np.random.default_rng(11)
    occ = (rng.uniform(size=(2, grid.n_tets)) > 0.5).astype(np.float32)
    mask, sign = boundary_info_from_occupancy(
        jnp.asarray(occ), jnp.asarray(topo.face_tet_fx2)
    )
    assert float(jnp.sum((sign < 0) * mask)) > 0  # flips exercised

    pos0 = jnp.asarray(
        (grid.centered_vertices()[None]
         + rng.normal(scale=0.02, size=(2, grid.n_vertices, 3))
         ).astype(np.float32)
    )
    topo_args = _edge_topo(topo)

    def loss_static(p):
        return jnp.sum(
            normal_smoothness_loss(
                p, jnp.asarray(topo.face_fx3), mask, sign, topo_args
            )
        )

    # pair oracle on per-batch ORIENTED faces (the reference's mechanics)
    faces_b, _ = boundary_faces_from_occupancy(
        jnp.asarray(occ), jnp.asarray(topo.face_fx3),
        jnp.asarray(topo.face_tet_fx2),
    )
    pa = jnp.asarray(topo.edge_pair_fa)
    pb = jnp.asarray(topo.edge_pair_fb)

    def loss_pairs(p):
        return jnp.sum(
            normal_smoothness_loss_pairs(p, faces_b, mask, pa, pb)
        )

    v_s, g_s = jax.value_and_grad(loss_static)(pos0)
    v_p, g_p = jax.value_and_grad(loss_pairs)(pos0)
    np.testing.assert_allclose(float(v_s), float(v_p), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_p), rtol=1e-3, atol=1e-5
    )


def test_normal_loss_compacted_matches_full_set():
    """The subset-scatter + bf16 edge-reduction formulation must match the
    full-set normal loss in value and vertex gradient (bf16 tolerance)."""
    from deftet_tpu.losses import (
        boundary_info_from_occupancy,
        normal_smoothness_loss,
        normal_smoothness_loss_compacted,
    )
    from deftet_tpu.losses.surface import select_boundary_subset_static

    grid = build_tet_grid(3)
    topo = build_topology(grid.tets, grid.n_vertices)
    rng = np.random.default_rng(13)
    occ = (rng.uniform(size=(2, grid.n_tets)) > 0.5).astype(np.float32)
    mask, sign = boundary_info_from_occupancy(
        jnp.asarray(occ), jnp.asarray(topo.face_tet_fx2)
    )
    pos0 = jnp.asarray(
        (grid.centered_vertices()[None]
         + rng.normal(scale=0.02, size=(2, grid.n_vertices, 3))
         ).astype(np.float32)
    )
    topo_args = _edge_topo(topo)
    budget = int(topo.face_fx3.shape[0]) - 1  # compacted but lossless
    assert float(jnp.max(jnp.sum(mask, axis=1))) <= budget
    face_fx3 = jnp.asarray(topo.face_fx3)
    b_idx = jnp.arange(2)[:, None, None]

    def loss_full(p):
        return jnp.sum(
            normal_smoothness_loss(p, face_fx3, mask, sign, topo_args)
        )

    def loss_compact(p):
        sel_faces, sel_mask, sel_idx = select_boundary_subset_static(
            face_fx3, mask, budget, return_idx=True
        )
        work_pos = p[b_idx, sel_faces]
        return jnp.sum(
            normal_smoothness_loss_compacted(
                work_pos, sel_idx, sel_mask, mask, sign, topo_args
            )
        )

    v_f, g_f = jax.value_and_grad(loss_full)(pos0)
    v_c, g_c = jax.value_and_grad(loss_compact)(pos0)
    np.testing.assert_allclose(float(v_f), float(v_c), rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_c), rtol=0.1, atol=2e-3
    )


def test_gather_tet_soa_lattice_matches_gathers():
    """Slice-based corner reads must equal index gathers (value + grad)."""
    from deftet_tpu.losses.geometry import (
        gather_tet_soa,
        gather_tet_soa_lattice,
    )
    from deftet_tpu.train.statics import lattice_tet_offsets

    grid = build_tet_grid(3)
    offsets = lattice_tet_offsets(grid)
    assert offsets is not None and len(offsets) == 6
    rng = np.random.default_rng(3)
    pos = jnp.asarray(
        (grid.centered_vertices()[None]
         + rng.normal(scale=0.02, size=(2, grid.n_vertices, 3))
         ).astype(np.float32)
    )
    tet = jnp.asarray(grid.tets)

    soa_g = gather_tet_soa(pos, tet)
    soa_l = gather_tet_soa_lattice(pos, grid.resolution, offsets)
    for k in range(4):
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(soa_g[k][c]), np.asarray(soa_l[k][c]),
                rtol=0, atol=0,
            )

    def vol(fn):
        def f(p):
            soa = fn(p)
            return jnp.sum(
                (soa[0][0] - soa[3][0]) * (soa[1][1] - soa[3][1])
                * (soa[2][2] - soa[3][2])
            )
        return f

    g_g = jax.grad(vol(lambda p: gather_tet_soa(p, tet)))(pos)
    g_l = jax.grad(
        vol(lambda p: gather_tet_soa_lattice(p, grid.resolution, offsets))
    )(pos)
    np.testing.assert_allclose(
        np.asarray(g_g), np.asarray(g_l), rtol=1e-6, atol=1e-6
    )


def test_normal_loss_compacted_budget_overflow_consistent():
    """When the boundary overflows the compaction budget the loss must
    equal the full-set loss computed on ONLY the selected faces (uniform
    truncation — no phantom s_w contributions from unselected faces)."""
    from deftet_tpu.losses import (
        boundary_info_from_occupancy,
        normal_smoothness_loss,
        normal_smoothness_loss_compacted,
    )
    from deftet_tpu.losses.surface import select_boundary_subset_static

    grid = build_tet_grid(3)
    topo = build_topology(grid.tets, grid.n_vertices)
    rng = np.random.default_rng(17)
    occ = (rng.uniform(size=(1, grid.n_tets)) > 0.5).astype(np.float32)
    mask, sign = boundary_info_from_occupancy(
        jnp.asarray(occ), jnp.asarray(topo.face_tet_fx2)
    )
    n_boundary = int(np.asarray(mask).sum())
    budget = max(4, n_boundary // 2)  # force overflow
    assert budget < n_boundary
    pos = jnp.asarray(
        (grid.centered_vertices()[None]
         + rng.normal(scale=0.02, size=(1, grid.n_vertices, 3))
         ).astype(np.float32)
    )
    face_fx3 = jnp.asarray(topo.face_fx3)
    topo_args = _edge_topo(topo)
    sel_faces, sel_mask, sel_idx = select_boundary_subset_static(
        face_fx3, mask, budget, return_idx=True
    )
    work_pos = pos[jnp.arange(1)[:, None, None], sel_faces]
    got = float(
        normal_smoothness_loss_compacted(
            work_pos, sel_idx, sel_mask, mask, sign, topo_args
        )[0]
    )
    # oracle: full-set formulation with the mask restricted to selection
    sel_full_mask = np.zeros_like(np.asarray(mask))
    sel_full_mask[0, np.asarray(sel_idx)[0][np.asarray(sel_mask)[0] > 0]] = 1
    want = float(
        normal_smoothness_loss(
            pos, face_fx3, jnp.asarray(sel_full_mask), sign, topo_args
        )[0]
    )
    np.testing.assert_allclose(got, want, rtol=2e-2)
    assert np.isfinite(got)


def test_compact_indices_two_level_matches_searchsorted():
    """The blocked two-level search must equal plain searchsorted for
    random masks, including empty rows and overflow."""
    from deftet_tpu.losses.surface import _compact_indices

    rng = np.random.default_rng(23)
    f, k = 5000, 64  # f > 4 * block -> two-level path
    mask = (rng.uniform(size=(3, f)) < 0.01).astype(np.float32)
    mask[2] = 0.0  # empty row
    idx, valid = _compact_indices(jnp.asarray(mask), k)
    idx, valid = np.asarray(idx), np.asarray(valid)
    for b in range(3):
        rank = np.cumsum(mask[b].astype(np.int64))
        want = np.searchsorted(rank, np.arange(1, k + 1), side="left")
        want = np.minimum(want, f - 1)
        np.testing.assert_array_equal(idx[b], want)
        n = int(mask[b].sum())
        np.testing.assert_array_equal(valid[b], (np.arange(k) < n))

    # dense mask (more boundary than budget)
    mask = (rng.uniform(size=(1, f)) < 0.5).astype(np.float32)
    idx, valid = _compact_indices(jnp.asarray(mask), k)
    rank = np.cumsum(mask[0].astype(np.int64))
    want = np.minimum(
        np.searchsorted(rank, np.arange(1, k + 1), side="left"), f - 1
    )
    np.testing.assert_array_equal(np.asarray(idx)[0], want)


def test_chamfer_samples_cap_estimator_consistent():
    """samples_cap shrinks the per-face count but keeps the estimator's
    expectation: on a scene with many boundary faces, the capped chamfer
    agrees with the uncapped one to MC noise."""
    grid = build_tet_grid(6)
    topo = build_topology(grid.tets, grid.n_vertices)
    verts = jnp.asarray(grid.centered_vertices().astype(np.float32))[None]
    rng = np.random.default_rng(3)
    # occupy a ball of tets -> a few hundred boundary faces
    centers = np.asarray(grid.centered_vertices())[grid.tets].mean(1)
    occ = (np.linalg.norm(centers, axis=1) < 0.3).astype(np.float32)[None]
    from deftet_tpu.losses import boundary_info_from_occupancy

    mask, sign = boundary_info_from_occupancy(
        jnp.asarray(occ), jnp.asarray(topo.face_tet_fx2)
    )
    n_b = int(np.asarray(mask).sum())
    assert n_b > 100
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (1, 256, 3)).astype(np.float32))
    kwargs = dict(
        per_face_samples=16, nn_chunk=256, tri_chunk=128,
        max_boundary_faces=n_b + 8, with_analytic=False, with_normal=False,
    )
    full = surface_align_losses(
        jax.random.PRNGKey(0), verts, jnp.asarray(topo.face_fx3), mask,
        sign, gt, _edge_topo(topo), **kwargs,
    )[0]
    capped = surface_align_losses(
        jax.random.PRNGKey(1), verts, jnp.asarray(topo.face_fx3), mask,
        sign, gt, _edge_topo(topo), samples_cap=2 * (n_b + 8), **kwargs,
    )[0]
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(capped), rtol=0.1
    )


def test_compact_indices_bitselect_matches_oracle():
    """Packed-bit rank/select compaction (_compact_indices, F >= 2048
    path) vs a numpy nonzero oracle: random densities, exact-k, empty,
    full, overflow, and non-word-aligned F."""
    from deftet_tpu.losses.surface import _compact_indices

    rng = np.random.default_rng(3)
    for f_total, k, dens in (
        (4096, 128, 0.01),
        (5000, 200, 0.3),     # F not a multiple of 512/32
        (8192, 64, 0.9),      # heavy overflow of the budget
        (2048, 2048, 0.5),    # k == F
        (6000, 100, 0.0),     # empty mask
        (2600, 64, 1.0),      # full mask
    ):
        mask = (rng.uniform(size=(3, f_total)) < dens).astype(np.float32)
        idx, valid = _compact_indices(jnp.asarray(mask), k)
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert idx.shape == (3, k) and valid.shape == (3, k)
        for bi in range(3):
            want = np.nonzero(mask[bi])[0][:k]
            nv = want.shape[0]
            np.testing.assert_array_equal(idx[bi, :nv], want)
            np.testing.assert_array_equal(valid[bi, :nv], 1.0)
            np.testing.assert_array_equal(valid[bi, nv:], 0.0)
            assert idx[bi].max() < f_total and idx[bi].min() >= 0


def test_compact_indices_bitselect_matches_small_path():
    """The packed path and the small-F searchsorted path agree on the
    same mask (idx on valid prefix + valid mask)."""
    from deftet_tpu.losses.surface import _compact_indices

    rng = np.random.default_rng(4)
    mask = (rng.uniform(size=(2, 2048)) < 0.1).astype(np.float32)
    idx_a, val_a = _compact_indices(jnp.asarray(mask), 64)
    idx_b, val_b = _compact_indices(jnp.asarray(mask[:, :2047]), 64)
    nv = int(min(np.asarray(val_a).sum(1).min(),
                 np.asarray(val_b).sum(1).min()))
    assert nv > 0
    np.testing.assert_array_equal(
        np.asarray(idx_a)[:, :nv], np.asarray(idx_b)[:, :nv]
    )
