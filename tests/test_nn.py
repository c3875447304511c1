"""Shape/behaviour tests for the flax network modules."""

import numpy as np
import jax
import jax.numpy as jnp

from deftet_tpu.nn import (
    DeformableTetNetwork,
    GCNMLPDecoder,
    PVCNNEncoder,
    VertexAdjacency,
    sample_grid_features,
    voxelize_coords,
)
from deftet_tpu.tetgrid import build_tet_grid, build_topology


def _adjacency(grid):
    topo = build_topology(grid.tets, grid.n_vertices)
    return VertexAdjacency(
        idx=jnp.asarray(topo.vert_adj_idx),
        mask=jnp.asarray(topo.vert_adj_mask),
        degree=jnp.asarray(topo.vert_degree),
    )


def test_voxelize_coords_scale_pvcnn():
    coords = jnp.asarray(np.array([[[-1, -1, -1], [1, 1, 1], [0, 0, 0]]],
                                  np.float32))
    norm, vox = voxelize_coords(coords, 8, scale_pvcnn=True)
    np.testing.assert_allclose(np.asarray(norm)[0, 0], [0, 0, 0])
    np.testing.assert_allclose(np.asarray(norm)[0, 1], [7, 7, 7])
    np.testing.assert_allclose(np.asarray(norm)[0, 2], [4, 4, 4])
    assert np.asarray(vox).dtype == np.int32


def test_pvcnn_encoder_pyramid_shapes():
    enc = PVCNNEncoder(blocks=((8, 1, 8), (16, 2, 4)))
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (2, 128, 3)).astype(
            np.float32
        )
    )
    vars_ = enc.init(jax.random.PRNGKey(0), pts, train=False)
    pyramid = enc.apply(vars_, pts, train=False)
    assert [tuple(v.shape) for v in pyramid] == [
        (2, 8, 8, 8, 8),
        (2, 4, 4, 4, 16),
        (2, 4, 4, 4, 16),
    ]
    # train mode updates batch stats
    _, mutated = enc.apply(
        vars_, pts, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated


def test_sample_grid_features_concat():
    pyramid = [
        jnp.ones((1, 4, 4, 4, 8)),
        jnp.full((1, 2, 2, 2, 16), 2.0),
    ]
    pts = jnp.zeros((1, 10, 3))
    f = sample_grid_features(pts, pyramid)
    assert f.shape == (1, 10, 24)
    np.testing.assert_allclose(np.asarray(f)[..., :8], 1.0)
    np.testing.assert_allclose(np.asarray(f)[..., 8:], 2.0)


def test_gcn_decoder_shapes_and_locality():
    grid = build_tet_grid(2)
    adj = _adjacency(grid)
    dec = GCNMLPDecoder(gcn_hidden=(16, 16, 8), mlp_hidden=(8,), out_dim=3)
    n = grid.n_vertices
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, n, 5)).astype(np.float32)
    )
    vars_ = dec.init(jax.random.PRNGKey(0), x, adj, train=False)
    y = dec.apply(vars_, x, adj, train=False)
    assert y.shape == (2, n, 3)


def test_full_network_forward_and_grad():
    grid = build_tet_grid(2)
    adj = _adjacency(grid)
    model = DeformableTetNetwork(
        adj=adj, blocks=((8, 1, 8), (16, 1, 4)), use_two_encoder=True,
        gcn_hidden=(16, 16, 8), pos_mlp_hidden=(8,),
        occ_mlp_hidden=(16, 0.2, 8),
    )
    rng = np.random.default_rng(2)
    inp = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 3)).astype(np.float32))
    p = jnp.asarray(
        np.tile(grid.centered_vertices().astype(np.float32)[None], (2, 1, 1))
    )
    centers = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 32, 3)).astype(
        np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inp, p, centers, train=False,
    )
    delta, pos, ori, logits = model.apply(
        variables, inp, p, centers, train=False
    )
    assert delta.shape == p.shape
    assert logits.shape == (2, 32)
    # scale_pos squashes deltas into (-0.1, 0.1)
    assert np.abs(np.asarray(delta)).max() < 0.1
    np.testing.assert_allclose(
        np.asarray(pos), np.asarray(p) + np.asarray(delta), atol=1e-6
    )

    # gradients flow to both encoders
    def loss(params):
        d, _, _, lg = model.apply(
            {**variables, "params": params}, inp, p, centers, train=False
        )
        return jnp.sum(d**2) + jnp.sum(lg**2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    g_enc_occ = jax.tree_util.tree_leaves(g["encoder_occ"])
    assert sum(np.abs(np.asarray(x)).sum() for x in g_enc_occ) > 0


def test_pos_mask_freezes_boundary():
    grid = build_tet_grid(2)
    adj = _adjacency(grid)
    model = DeformableTetNetwork(
        adj=adj, blocks=((8, 1, 4),), use_two_encoder=False,
        gcn_hidden=(8, 8), pos_mlp_hidden=(8,), occ_mlp_hidden=(8,),
    )
    rng = np.random.default_rng(3)
    inp = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 32, 3)).astype(np.float32))
    p = jnp.asarray(grid.centered_vertices().astype(np.float32)[None])
    centers = jnp.zeros((1, 4, 3))
    mask = jnp.asarray(grid.interior_mask[None])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, inp, p, centers,
        pos_mask_bxnx3=mask, train=False,
    )
    delta, _, _, _ = model.apply(
        variables, inp, p, centers, pos_mask_bxnx3=mask, train=False
    )
    boundary = np.asarray(mask)[0] == 0.0
    assert np.abs(np.asarray(delta)[0][boundary]).max() == 0.0


def test_disn_encoder_decoder():
    from deftet_tpu.nn.disn import (
        DISNDecoder,
        DISNEncoder,
        bilinear_sample,
        project_points,
        sample_image_features,
    )

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    enc = DISNEncoder(image_encoding_dim=64, local_feature_size=16)
    vars_e = enc.init(jax.random.PRNGKey(0), img)
    global_feat, maps = enc.apply(vars_e, img)
    assert global_feat.shape == (1, 64)
    assert len(maps) == 5
    assert all(m.shape[1] == 16 and m.shape[2] == 16 for m in maps)
    # local feature dim = 64+128+256+512+512 = 1472
    assert sum(m.shape[-1] for m in maps) == 1472

    # projection: identity camera maps (x, y, 1, .) -> (x, y)
    pts = jnp.asarray([[[0.25, -0.5, 1.0]]])
    cam = jnp.eye(4)[None]
    xy = project_points(pts, cam)
    np.testing.assert_allclose(np.asarray(xy)[0, 0], [0.25, -0.5], atol=1e-6)

    # bilinear sampling of a constant map is constant; outside -> 0
    const = jnp.full((1, 8, 8, 2), 3.0)
    inside = bilinear_sample(const, jnp.asarray([[[0.0, 0.0]]]))
    np.testing.assert_allclose(np.asarray(inside)[0, 0], [3.0, 3.0],
                               atol=1e-5)
    outside = bilinear_sample(const, jnp.asarray([[[5.0, 5.0]]]))
    np.testing.assert_allclose(np.asarray(outside)[0, 0], [0.0, 0.0])

    local = sample_image_features(maps, pts, cam)
    assert local.shape == (1, 1, 1472)

    dec = DISNDecoder(out_features=1)
    vars_d = dec.init(jax.random.PRNGKey(1), pts, global_feat, local)
    sdf = dec.apply(vars_d, pts, global_feat, local)
    assert sdf.shape == (1, 1, 1)
    assert np.isfinite(np.asarray(sdf)).all()


def test_lattice_adjacency_matches_padded_gather():
    from deftet_tpu.nn import LatticeAdjacency
    from deftet_tpu.train.statics import lattice_offsets

    grid = build_tet_grid(4)
    adj = _adjacency(grid)
    offs = lattice_offsets(grid)
    assert offs is not None and len(offs) == 14
    lat = LatticeAdjacency(
        offsets=offs,
        degree=jnp.asarray(
            build_topology(grid.tets, grid.n_vertices).vert_degree
        ),
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(2, grid.n_vertices, 5)
        ).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(lat.matmul(x)), np.asarray(adj.matmul(x)),
        rtol=1e-4, atol=1e-5,
    )


def test_lattice_feature_probe_matches_gather():
    from deftet_tpu.nn.model import (
        sample_grid_features,
        sample_grid_features_lattice,
    )

    rng = np.random.default_rng(11)
    res = 5
    n = res + 1
    pyramid = [
        jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 4, 4, 4, 2)).astype(np.float32)),
    ]
    grid = build_tet_grid(res)
    p = jnp.asarray(
        np.tile(grid.centered_vertices().astype(np.float32)[None], (2, 1, 1))
    )
    ref = sample_grid_features(p, pyramid)
    fast = sample_grid_features_lattice(pyramid, res, n)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_lap_layer_refinement_decoder():
    """use_lap_layer adds a second masked/scaled refinement pass
    (pc_model.py:231-254)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deftet_tpu.nn import DeformableTetNetwork, VertexAdjacency
    from deftet_tpu.tetgrid import build_tet_grid, build_topology

    grid = build_tet_grid(3)
    topo = build_topology(grid.tets, grid.n_vertices)
    adj = VertexAdjacency(
        idx=jnp.asarray(topo.vert_adj_idx),
        mask=jnp.asarray(topo.vert_adj_mask),
        degree=jnp.asarray(topo.vert_degree),
    )
    blocks = ((8, 1, 8), (16, 1, 4))
    kw = dict(adj=adj, blocks=blocks, gcn_hidden=(8,), pos_mlp_hidden=(8,),
              occ_mlp_hidden=(8,))
    rng = jax.random.PRNGKey(0)
    inp = jax.random.uniform(rng, (2, 64, 3), minval=-0.5, maxval=0.5)
    p = jnp.asarray(grid.centered_vertices().astype(np.float32))[None].repeat(2, 0)
    centers = jax.random.uniform(rng, (2, 16, 3), minval=-0.5, maxval=0.5)
    mask = jnp.asarray(grid.interior_mask.astype(np.float32))[None].repeat(2, 0)

    base = DeformableTetNetwork(use_lap_layer=False, **kw)
    lap = DeformableTetNetwork(use_lap_layer=True, **kw)
    vb = base.init(rng, inp, p, centers, train=False)
    vl = lap.init(rng, inp, p, centers, train=False)
    assert "lap_decoder_pos" in vl["params"]
    assert "lap_decoder_pos" not in vb["params"]

    pyr, _ = lap.apply(vl, inp, train=False, method=lap.encode)
    delta, pos, ori = lap.apply(
        vl, p, pyr, mask, False, adj, 0, method=lap.decode_pos
    )
    assert pos.shape == p.shape and delta.shape == p.shape
    # masked vertices stay put end-to-end (both passes masked)
    np.testing.assert_allclose(
        np.asarray((pos - p) * (1 - mask)), 0.0, atol=1e-7
    )
    # refinement delta respects the sigmoid scale bound
    assert float(jnp.max(jnp.abs(delta))) <= 0.1 + 1e-6
