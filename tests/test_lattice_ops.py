"""Equivalence of the shifted-slice lattice fast paths vs gather paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deftet_tpu.losses.surface import boundary_info_from_occupancy
from deftet_tpu.ops.geometry import edge_face_sum
from deftet_tpu.ops.lattice import (
    lattice_boundary_info,
    lattice_edge_quadratics,
)
from deftet_tpu.tetgrid.grid import build_tet_grid
from deftet_tpu.tetgrid.lattice_faces import (
    build_lattice_faces,
    build_lattice_topology,
    face_lattice_info,
)
from deftet_tpu.tetgrid.topology import build_faces


@pytest.mark.parametrize("r", [2, 4])
def test_lattice_boundary_info_matches_gather(r):
    g = build_tet_grid(r)
    fl = face_lattice_info(g)
    _, face_tet, _, valid, _ = build_lattice_faces(r)
    rng = np.random.RandomState(0)
    occ = jnp.asarray(
        rng.randint(0, 2, size=(3, g.n_tets)).astype(np.float32)
    )
    ref_mask, ref_sign = boundary_info_from_occupancy(
        occ, jnp.asarray(face_tet)
    )
    lat_mask, lat_sign = lattice_boundary_info(occ, fl)
    np.testing.assert_array_equal(np.asarray(lat_mask), np.asarray(ref_mask))
    # sign only matters where mask is set
    m = np.asarray(ref_mask) > 0
    np.testing.assert_array_equal(
        np.asarray(lat_sign)[m], np.asarray(ref_sign)[m]
    )
    # invalid (hull-padded) slots are never boundary
    assert not np.asarray(lat_mask)[:, ~valid].any()


@pytest.mark.parametrize("r", [2, 4])
def test_lattice_boundary_info_matches_tight_layout(r):
    """Cross-check against the ORIGINAL tight face list via permutation."""
    g = build_tet_grid(r)
    fl = face_lattice_info(g)
    face_lat, _, _, valid, _ = build_lattice_faces(r)
    ref_face, ref_tet, _, _ = build_faces(g.tets, g.n_vertices)
    n = g.n_vertices

    def key(tri):
        tri = np.sort(np.asarray(tri, np.int64), axis=-1)
        return (tri[:, 0] * n + tri[:, 1]) * n + tri[:, 2]

    # permutation: tight face i == padded slot perm[i]
    lat_keys = key(face_lat[valid])
    order_ref = np.argsort(key(ref_face))
    order_lat = np.argsort(lat_keys)
    perm = np.where(valid)[0][order_lat][np.argsort(order_ref)]

    rng = np.random.RandomState(1)
    occ = jnp.asarray(
        rng.randint(0, 2, size=(2, g.n_tets)).astype(np.float32)
    )
    ref_mask, ref_sign = boundary_info_from_occupancy(
        occ, jnp.asarray(ref_tet)
    )
    lat_mask, lat_sign = lattice_boundary_info(occ, fl)
    np.testing.assert_array_equal(
        np.asarray(lat_mask)[:, perm], np.asarray(ref_mask)
    )
    m = np.asarray(ref_mask) > 0
    np.testing.assert_array_equal(
        np.asarray(lat_sign)[:, perm][m], np.asarray(ref_sign)[m]
    )


def _gather_quadratics(w, nx, ny, nz, topo):
    """The edge_face_sum closed form (normal_smoothness_loss_compacted)."""
    b = w.shape[0]
    fields = jnp.concatenate([w, nx, ny, nz], axis=0)
    sums = edge_face_sum(
        fields,
        jnp.asarray(topo.edge_face_idx),
        jnp.asarray(topo.edge_face_mask),
        jnp.asarray(topo.face_edge_ids),
    ).astype(jnp.float32).reshape(4, b, -1)
    s_w, s_nx, s_ny, s_nz = sums
    total = jnp.sum(
        s_w * s_w - (s_nx * s_nx + s_ny * s_ny + s_nz * s_nz), axis=1
    )
    count = jnp.sum(s_w * s_w - s_w, axis=1)
    return total, count


@pytest.mark.parametrize("r", [2, 3])
def test_lattice_edge_quadratics_matches_gather(r):
    g = build_tet_grid(r)
    fl = face_lattice_info(g)
    topo = build_lattice_topology(g)
    _, _, _, valid, _ = build_lattice_faces(r)
    f = 12 * r**3
    rng = np.random.RandomState(2)
    b = 2
    w = rng.randint(0, 2, size=(b, f)).astype(np.float32)
    w[:, ~valid] = 0.0  # hull-padded slots carry no weight (invariant)
    n = rng.randn(b, f, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n *= w[..., None]  # fields are ws * n in the loss
    wj = jnp.asarray(w)
    nj = [jnp.asarray(n[..., c]) for c in range(3)]

    ref_total, ref_count = _gather_quadratics(wj, *nj, topo)
    lat_total, lat_count = lattice_edge_quadratics(wj, *nj, fl)
    np.testing.assert_allclose(
        np.asarray(lat_total), np.asarray(ref_total), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lat_count), np.asarray(ref_count), rtol=1e-6, atol=1e-5
    )

    # the arithmetic-derived edge arrays (build_lattice_edge_arrays, used
    # by topo above) must agree with the generic sort-based builders on
    # the same padded face list
    from deftet_tpu.tetgrid.topology import (
        build_face_edge_ids,
        build_face_edge_incidence,
    )

    face_v = np.asarray(build_lattice_faces(r)[0])
    n_pt = g.n_vertices
    import dataclasses as dc

    gen = dc.replace(
        topo,
        edge_face_idx=build_face_edge_incidence(face_v, n_pt)[0],
        edge_face_mask=build_face_edge_incidence(face_v, n_pt)[1],
        face_edge_ids=build_face_edge_ids(face_v, n_pt),
    )
    gen_total, gen_count = _gather_quadratics(wj, *nj, gen)
    np.testing.assert_allclose(
        np.asarray(gen_total), np.asarray(ref_total), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gen_count), np.asarray(ref_count), rtol=1e-6, atol=1e-5
    )


def test_lattice_edge_quadratics_gradients_match(r=2):
    g = build_tet_grid(r)
    fl = face_lattice_info(g)
    topo = build_lattice_topology(g)
    _, _, _, valid, _ = build_lattice_faces(r)
    f = 12 * r**3
    rng = np.random.RandomState(3)
    w = rng.randint(0, 2, size=(1, f)).astype(np.float32)
    w[:, ~valid] = 0.0
    n = rng.randn(3, 1, f).astype(np.float32)
    wj = jnp.asarray(w)

    def loss_lat(nf):
        t, c = lattice_edge_quadratics(wj, nf[0], nf[1], nf[2], fl)
        return jnp.sum(t / jnp.maximum(c, 1.0))

    def loss_ref(nf):
        t, c = _gather_quadratics(wj, nf[0], nf[1], nf[2], topo)
        return jnp.sum(t / jnp.maximum(c, 1.0))

    g_lat = jax.grad(loss_lat)(jnp.asarray(n))
    g_ref = jax.grad(loss_ref)(jnp.asarray(n))
    np.testing.assert_allclose(
        np.asarray(g_lat), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_surface_align_losses_lattice_parity(r=3):
    """Full surface-loss stack: shifted-slice vs gather paths agree."""
    from deftet_tpu.losses.surface import surface_align_losses

    g = build_tet_grid(r)
    fl = face_lattice_info(g)
    topo = build_lattice_topology(g)
    rng = np.random.RandomState(4)
    b = 2
    occ = jnp.asarray(
        rng.randint(0, 2, size=(b, g.n_tets)).astype(np.float32)
    )
    mask_g, sign_g = boundary_info_from_occupancy(
        occ, jnp.asarray(topo.face_tet_fx2)
    )
    mask_l, sign_l = lattice_boundary_info(occ, fl)
    pos = jnp.asarray(
        (g.vertices - 0.5 + rng.randn(*g.vertices.shape) * 0.01)
        .astype(np.float32)
    )[None].repeat(b, axis=0)
    gt = jnp.asarray(rng.randn(b, 64, 3).astype(np.float32) * 0.3)
    edge_topo = (
        jnp.asarray(topo.edge_face_idx),
        jnp.asarray(topo.edge_face_mask),
        jnp.asarray(topo.face_edge_ids),
        jnp.asarray(topo.vert_face_inc_idx),
        jnp.asarray(topo.vert_face_inc_mask),
    )
    key = jax.random.PRNGKey(0)
    kwargs = dict(
        per_face_samples=4, max_boundary_faces=16 * r * r,
    )
    ref = surface_align_losses(
        key, pos, jnp.asarray(topo.face_fx3), mask_g, sign_g, gt,
        edge_topo, **kwargs,
    )
    lat = surface_align_losses(
        key, pos, jnp.asarray(topo.face_fx3), mask_l, sign_l, gt,
        edge_topo, face_lattice=fl, **kwargs,
    )
    for a, bb, name in zip(ref, lat, ("chamfer", "analytic", "normal")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-2, atol=2e-2,
            err_msg=name,
        )


def test_lattice_topology_matches_generic_semantics(r=3):
    """build_lattice_topology's tet-derived arrays equal the generic ones."""
    from deftet_tpu.tetgrid.topology import build_topology

    g = build_tet_grid(r)
    lat = build_lattice_topology(g)
    ref = build_topology(g.tets, g.n_vertices)
    np.testing.assert_array_equal(lat.vert_adj_idx, ref.vert_adj_idx)
    np.testing.assert_array_equal(lat.vert_degree, ref.vert_degree)
    # tet neighbors are order-independent (slot-addressed)
    np.testing.assert_array_equal(
        lat.tet_neighbor_tx4, ref.tet_neighbor_tx4
    )
    np.testing.assert_array_equal(lat.vert_tet_inc_idx, ref.vert_tet_inc_idx)
