"""Render-stack tests: rasterizer vs hand-computed scenes, compositing,
camera, gradients, and the optimizable tet scene."""

import jax
import jax.numpy as jnp
import numpy as np

from deftet_tpu.render import (
    TetScene,
    build_render_faces,
    deftet_sparse_render,
    peel2mask,
    perspective,
)
from deftet_tpu.render.raster import barycentric_2d
from deftet_tpu.tetgrid import build_tet_grid


def test_barycentric_identity():
    tri = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    for p, expect in [
        ((0.0, 0.0), (1, 0, 0)),
        ((1.0, 0.0), (0, 1, 0)),
        ((0.0, 1.0), (0, 0, 1)),
        ((1 / 3, 1 / 3), (1 / 3, 1 / 3, 1 / 3)),
    ]:
        w = barycentric_2d(jnp.asarray(p), tri)
        np.testing.assert_allclose(
            [float(x) for x in w], expect, atol=1e-6
        )


def _tri_scene(z_vals, feats):
    """Faces: one triangle per entry, all covering the origin pixel."""
    f = len(z_vals)
    img = jnp.tile(
        jnp.asarray([[[-1.0, -1.0], [3.0, -1.0], [-1.0, 3.0]]]), (1, f, 1, 1)
    )
    z = jnp.asarray([z_vals], jnp.float32)[..., None].repeat(3, axis=-1)
    feat = jnp.asarray([feats], jnp.float32)[:, :, None, :].repeat(3, axis=2)
    return z, img, feat


def test_raster_depth_ordering_and_k():
    # three stacked triangles at z = -1 (closest), -2, -3
    z, img, feat = _tri_scene(
        [-3.0, -1.0, -2.0],
        [[3.0], [1.0], [2.0]],
    )
    pix = jnp.zeros((1, 1, 2))
    ranges = jnp.asarray([[[-1000.0, 0.0]]])
    layers, idx = deftet_sparse_render(pix, ranges, z, img, feat, k=2)
    # closest first: z=-1 (feature 1), then z=-2 (feature 2); k=2 drops -3
    np.testing.assert_allclose(
        np.asarray(layers)[0, 0, :, 0], [1.0, 2.0], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [1, 2])


def test_raster_miss_gives_empty():
    z, img, feat = _tri_scene([-1.0], [[5.0]])
    pix = jnp.asarray([[[10.0, 10.0]]])  # far outside the triangle
    ranges = jnp.asarray([[[-1000.0, 0.0]]])
    layers, idx = deftet_sparse_render(pix, ranges, z, img, feat, k=2)
    assert (np.asarray(idx) == -1).all()
    np.testing.assert_allclose(np.asarray(layers), 0.0)


def test_raster_range_filter():
    z, img, feat = _tri_scene([-1.0, -5.0], [[1.0], [2.0]])
    pix = jnp.zeros((1, 1, 2))
    ranges = jnp.asarray([[[-3.0, 0.0]]])  # excludes z=-5
    _, idx = deftet_sparse_render(pix, ranges, z, img, feat, k=2)
    assert np.asarray(idx)[0, 0, 0] == 0
    assert np.asarray(idx)[0, 0, 1] == -1


def test_raster_barycentric_interpolation():
    # one triangle, feature = x coordinate at corners -> interp = pixel x
    img = jnp.asarray([[[[-1.0, -1.0], [3.0, -1.0], [-1.0, 3.0]]]])
    z = jnp.full((1, 1, 3), -1.0)
    feat = jnp.asarray([[[[-1.0], [3.0], [-1.0]]]])  # equals corner x
    pix = jnp.asarray([[[0.5, 0.0], [0.0, 0.5]]])
    ranges = jnp.tile(jnp.asarray([[[-1000.0, 0.0]]]), (1, 2, 1))
    layers, _ = deftet_sparse_render(pix, ranges, z, img, feat, k=1)
    np.testing.assert_allclose(
        np.asarray(layers)[0, :, 0, 0], [0.5, 0.0], atol=1e-5
    )


def test_raster_gradients_flow():
    z, img, feat = _tri_scene([-1.0], [[2.0]])
    pix = jnp.asarray([[[0.3, 0.2]]])
    ranges = jnp.asarray([[[-1000.0, 0.0]]])

    def loss(img_v, feat_v):
        layers, _ = deftet_sparse_render(pix, ranges, z, img_v, feat_v, k=1)
        return jnp.sum(layers**2)

    g_img, g_feat = jax.grad(loss, argnums=(0, 1))(img, feat)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.abs(np.asarray(g_feat)).sum() > 0
    # constant-feature triangle: gradient wrt positions is ~0, but replace
    # with varying features and positions matter
    feat_vary = jnp.asarray([[[[1.0], [2.0], [3.0]]]])
    g_img2 = jax.grad(loss, argnums=0)(img, feat_vary)
    assert np.abs(np.asarray(g_img2)).sum() > 0


def test_peel2mask_compositing():
    # front layer opaque red-ish (alpha~1), second layer ignored
    big = 1.0  # alpha close to 1 after clip
    layers = jnp.asarray(
        [[[[big, 0.8, 0.1, 0.1], [big, 0.0, 0.9, 0.0]]]]
    )  # (1,1,2,4)
    color, vis, _ = peel2mask(layers)
    np.testing.assert_allclose(
        np.asarray(color)[0, 0], [0.8, 0.1, 0.1], atol=1e-6
    )
    assert float(vis[0, 0, 0]) > 1 - 1e-6
    # all-transparent -> white background
    empty = jnp.zeros((1, 1, 2, 4))
    color2, vis2, _ = peel2mask(empty)
    np.testing.assert_allclose(np.asarray(color2)[0, 0], 1.0, atol=1e-6)
    assert float(vis2[0, 0, 0]) < 1e-6


def test_peel2mask_50_50():
    layers = jnp.asarray([[[[0.5, 1.0, 0.0, 0.0], [1.0, 0.0, 1.0, 0.0]]]])
    color, vis, _ = peel2mask(layers)
    # 0.5 red + 0.5 green, full coverage
    np.testing.assert_allclose(
        np.asarray(color)[0, 0], [0.5, 0.5, 0.0], atol=1e-6
    )
    np.testing.assert_allclose(float(vis[0, 0, 0]), 1.0, atol=1e-6)


def test_perspective_center_point():
    rot = jnp.eye(3)[None]
    pos = jnp.asarray([[0.0, 0.0, 5.0]])
    proj = jnp.asarray([2.0, 2.0, 1.0])
    pts = jnp.asarray([[[0.5, 0.25, 0.0]]])
    cam, xy = perspective(pts, rot, pos, proj)
    np.testing.assert_allclose(
        np.asarray(cam)[0, 0], [0.5, 0.25, -5.0], atol=1e-6
    )
    # xy = (p * proj)_xy / z = (1.0, 0.5) / -5
    np.testing.assert_allclose(
        np.asarray(xy)[0, 0], [-0.2, -0.1], atol=1e-6
    )


def test_build_render_faces_counts():
    grid = build_tet_grid(1)  # 6 tets, single cube
    faces = build_render_faces(grid.tets, grid.n_vertices)
    # each tet: 4 faces; interior faces shared; total unique for Kuhn cube:
    # 6*4 = 24 face slots, interior shared pairs -> 24 - 6 = 18 unique
    assert faces.shape == (18, 3)


def test_scene_render_carve_subdivide():
    grid = build_tet_grid(2)
    scene = TetScene.from_grid(grid, coef=2.0)
    params = scene.init_params()
    assert params["mov"].shape == (grid.n_vertices, 3)

    rot = jnp.eye(3)[None]
    pos = jnp.asarray([[0.0, 0.0, 4.0]])
    proj = jnp.asarray([2.0, 2.0, 1.0])
    pix = jnp.asarray([[[0.0, 0.0], [0.4, 0.4]]])
    color, mask = scene.render(params, pix, rot, pos, proj, k=4)[:2]
    assert color.shape == (1, 2, 3)
    assert np.isfinite(np.asarray(color)).all()
    # zero feature logits -> alpha 0.5 everywhere; center pixel is covered
    assert float(mask[0, 0, 0]) > 0.5

    # feature laplacian of a constant field is 0
    lap = scene.feature_laplacian(jnp.ones((scene.n_points, 4)))
    np.testing.assert_allclose(np.asarray(lap), 0.0, atol=1e-6)

    # carve with very high threshold would empty the scene -> no-op False
    n_before = scene.n_tets
    assert scene.carve(params, threshold=100.0) is False
    assert scene.n_tets == n_before

    # carve nothing (alpha=0.5 > 0.01) -> unchanged
    assert scene.carve(params, threshold=0.01) is False

    # subdivision: 8x tets, params sized to new points
    params2 = scene.subdivide(params)
    assert scene.n_tets == 8 * n_before
    assert params2["mov"].shape[0] == scene.n_points
    assert params2["feat"].shape[0] == scene.n_points

    # gradients flow through a rendered loss to mov and feat
    def loss(p):
        c, m = scene.render(p, pix, rot, pos, proj, k=4)[:2]
        return jnp.sum(c**2) + jnp.sum(m**2)

    g = jax.grad(loss)(params2)
    assert np.isfinite(np.asarray(g["mov"])).all()
    assert np.abs(np.asarray(g["feat"])).sum() > 0


def test_scene_state_roundtrip(tmp_path):
    """save_state/load_state persist topology + params across a carve
    (the reference's state_dict override, 3_model/deftet.py:480-501)."""
    import numpy as np
    import jax.numpy as jnp

    from deftet_tpu.render.scene import TetScene
    from deftet_tpu.tetgrid import build_tet_grid

    scene = TetScene.from_grid(build_tet_grid(4), coef=2.0)
    params = scene.init_params()
    rng = np.random.default_rng(0)
    params = {
        "feat": jnp.asarray(
            rng.normal(size=params["feat"].shape).astype(np.float32)
        ),
        "mov": jnp.asarray(
            rng.normal(scale=0.01, size=params["mov"].shape).astype(
                np.float32
            )
        ),
    }
    # carve so the tet count differs from the fresh grid
    assert scene.carve(params, threshold=0.55, neighbor_levels=0)
    n_tets = scene.n_tets

    path = str(tmp_path / "scene.npz")
    scene.save_state(path, params)
    scene2, params2 = TetScene.load_state(path)
    assert scene2.n_tets == n_tets
    np.testing.assert_array_equal(scene2.tets_tx4, scene.tets_tx4)
    np.testing.assert_array_equal(scene2.faces_fx3, scene.faces_fx3)
    np.testing.assert_allclose(
        np.asarray(params2["feat"]), np.asarray(params["feat"])
    )
    np.testing.assert_allclose(
        np.asarray(scene2.world_points(params2)),
        np.asarray(scene.world_points(params)),
    )


def _random_scene(seed, f, p, spread=0.08):
    """Random small triangles + random pixels for binning equivalence."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1.0, 1.0, (1, f, 1, 2))
    img = (base + rng.uniform(-spread, spread, (1, f, 3, 2))).astype(
        np.float32
    )
    z = rng.uniform(-5.0, -1.0, (1, f, 3)).astype(np.float32)
    feat = rng.uniform(0.0, 1.0, (1, f, 3, 3)).astype(np.float32)
    pix = rng.uniform(-1.0, 1.0, (1, p, 2)).astype(np.float32)
    ranges = np.concatenate(
        [np.full((1, p, 1), -1000.0), np.zeros((1, p, 1))], axis=-1
    ).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (pix, ranges, z, img, feat))


def test_raster_binned_matches_unbinned():
    """Candidate binning is exact when every tile's overlap fits the
    candidate budget (small faces here, generous bin_cand)."""
    pix, ranges, z, img, feat = _random_scene(0, f=600, p=700)
    ref_feat, ref_idx = deftet_sparse_render(
        pix, ranges, z, img, feat, k=4, chunk=128
    )
    out_feat, out_idx = deftet_sparse_render(
        pix, ranges, z, img, feat, k=4, chunk=128,
        pixel_chunk=128, bin_cand=512,
    )
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(out_idx))
    np.testing.assert_allclose(
        np.asarray(ref_feat), np.asarray(out_feat), atol=1e-6
    )


def test_raster_binned_gradients_match():
    pix, ranges, z, img, feat = _random_scene(1, f=300, p=200)

    def loss(args, bin_cand):
        zz, ii, ff = args
        layers, _ = deftet_sparse_render(
            pix, ranges, zz, ii, ff, k=3, chunk=64,
            pixel_chunk=64, bin_cand=bin_cand,
        )
        return jnp.sum(layers**2)

    g_ref = jax.grad(lambda a: loss(a, 0))((z, img, feat))
    g_bin = jax.grad(lambda a: loss(a, 256))((z, img, feat))
    for a, b in zip(g_ref, g_bin):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


def test_raster_bin_overflow_diagnostic():
    from deftet_tpu.render.raster import bin_overflow

    pix, _, _, img, _ = _random_scene(2, f=400, p=500)
    # generous budget: no overflow
    assert bin_overflow(img[0], pix[0], pixel_chunk=128, n_cand=400) == 0
    # one-slot budget on a busy scene must overflow
    assert bin_overflow(img[0], pix[0], pixel_chunk=512, n_cand=1) > 0


def test_hit_count_max_matches_peel():
    """The k-calibration oracle: hit_count_max equals the count of
    non-sentinel ids an unbounded peel returns, so any k >= it is exact."""
    from deftet_tpu.render.raster import hit_count_max

    pix, ranges, z, img, feat = _random_scene(4, f=300, p=400)
    big_k = 64  # > any possible coverage for this scene
    _, idx = deftet_sparse_render(
        pix, ranges, z, img, feat, k=big_k, chunk=64
    )
    per_pixel = np.asarray((np.asarray(idx[0]) >= 0).sum(axis=-1))
    assert per_pixel.max() < big_k  # oracle precondition
    got = int(np.asarray(hit_count_max(
        jnp.concatenate([pix[0], ranges[0]], axis=-1), z[0], img[0],
        chunk=64,
    )))
    assert got == per_pixel.max()


def test_peel_truncation_is_suffix():
    """A smaller k returns exactly the first k layers of a larger k —
    the invariant the adaptive peel depth (frame k_eff, training
    calibrate_peel_k) relies on for bit-exactness when k >= max hits."""
    pix, ranges, z, img, feat = _random_scene(5, f=300, p=200)
    feat_big, idx_big = deftet_sparse_render(
        pix, ranges, z, img, feat, k=32, chunk=64
    )
    feat_small, idx_small = deftet_sparse_render(
        pix, ranges, z, img, feat, k=8, chunk=64
    )
    np.testing.assert_array_equal(
        np.asarray(idx_big[..., :8]), np.asarray(idx_small)
    )
    np.testing.assert_allclose(
        np.asarray(feat_big[..., :8, :]), np.asarray(feat_small),
        atol=1e-6,
    )
