"""PointNet sampling/grouping ops vs numpy oracles mirroring the
reference CUDA kernels (pv_module/functional/src/**), plus the PointNet
module family and the frustum/KL loss extras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deftet_tpu.ops.sampling import (
    ball_query,
    furthest_point_sample,
    gather_points,
    grouping,
    logits_mask,
    three_nn_interpolate,
)


def _np_fps(coords_nx3, m):
    """Oracle for sampling.cu furthest_point_sampling_kernel."""
    n = coords_nx3.shape[0]
    idx = np.zeros(m, np.int32)
    mind = np.full(n, np.inf)
    for i in range(1, m):
        d = np.sum((coords_nx3 - coords_nx3[idx[i - 1]]) ** 2, axis=-1)
        mind = np.minimum(mind, d)
        idx[i] = int(np.argmax(mind))
    return idx


def _np_ball_query(centers_mx3, points_nx3, radius, u):
    """Oracle for ball_query.cu: scan order, first hit fills all slots."""
    m = centers_mx3.shape[0]
    out = np.zeros((m, u), np.int32)
    for j in range(m):
        d2 = np.sum((points_nx3 - centers_mx3[j]) ** 2, axis=-1)
        cnt = 0
        for k in range(points_nx3.shape[0]):
            if cnt >= u:
                break
            if d2[k] < radius * radius:
                if cnt == 0:
                    out[j, :] = k
                out[j, cnt] = k
                cnt += 1
    return out


def test_fps_matches_oracle():
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(2, 64, 3)).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(coords), 16))
    for b in range(2):
        np.testing.assert_array_equal(idx[b], _np_fps(coords[b], 16))


def test_fps_covers_clusters():
    # two far-apart clusters: 2-point FPS must pick one from each
    rng = np.random.default_rng(1)
    a = rng.normal(size=(32, 3)) * 0.01
    b = rng.normal(size=(32, 3)) * 0.01 + 10.0
    coords = np.concatenate([a, b]).astype(np.float32)[None]
    idx = np.asarray(furthest_point_sample(jnp.asarray(coords), 2))[0]
    assert (idx[0] < 32) != (idx[1] < 32)


def test_ball_query_matches_oracle():
    rng = np.random.default_rng(2)
    points = rng.uniform(-1, 1, (2, 40, 3)).astype(np.float32)
    centers = rng.uniform(-1, 1, (2, 7, 3)).astype(np.float32)
    got = np.asarray(ball_query(jnp.asarray(centers), jnp.asarray(points), 0.7, 5))
    for b in range(2):
        np.testing.assert_array_equal(
            got[b], _np_ball_query(centers[b], points[b], 0.7, 5)
        )


def test_ball_query_empty_ball_returns_zero():
    points = jnp.ones((1, 8, 3))
    centers = -jnp.ones((1, 2, 3)) * 100.0
    got = np.asarray(ball_query(centers, points, 0.1, 4))
    np.testing.assert_array_equal(got, 0)


def test_grouping_gathers_and_backprops():
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(1, 10, 4)).astype(np.float32)
    idx = np.array([[[0, 3], [9, 9], [2, 5]]], np.int32)
    out = np.asarray(grouping(jnp.asarray(feats), jnp.asarray(idx)))
    assert out.shape == (1, 3, 2, 4)
    np.testing.assert_allclose(out[0, 1, 0], feats[0, 9])

    # backward = scatter-add transpose (grouping.cu grad kernel): index 9
    # is used twice, so its grad is 2.
    g = jax.grad(
        lambda f: jnp.sum(grouping(f, jnp.asarray(idx)))
    )(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g)[0, 9], 2.0)
    np.testing.assert_allclose(np.asarray(g)[0, 1], 0.0)


def test_three_nn_interpolate_weights_and_grad_contract():
    rng = np.random.default_rng(4)
    points = rng.uniform(-1, 1, (2, 20, 3)).astype(np.float32)
    centers = rng.uniform(-1, 1, (2, 6, 3)).astype(np.float32)
    cfeat = rng.normal(size=(2, 6, 5)).astype(np.float32)

    out = np.asarray(
        three_nn_interpolate(
            jnp.asarray(points), jnp.asarray(centers), jnp.asarray(cfeat)
        )
    )
    # numpy oracle of neighbor_interpolate.cu weights
    for b in range(2):
        for j in range(20):
            d2 = np.sum((centers[b] - points[b, j]) ** 2, axis=-1)
            nn3 = np.argsort(d2, kind="stable")[:3]
            d = np.clip(d2[nn3], 1e-10, 1e10)
            w = np.array([d[1] * d[2], d[0] * d[2], d[0] * d[1]])
            w = w / (d[0] * d[1] + d[0] * d[2] + d[1] * d[2])
            ref = np.sum(cfeat[b, nn3] * w[:, None], axis=0)
            np.testing.assert_allclose(out[b, j], ref, rtol=2e-5, atol=2e-6)

    # reference backward sends gradient to centers_features ONLY
    gp, gc, gf = jax.grad(
        lambda p, c, f: jnp.sum(three_nn_interpolate(p, c, f) ** 2),
        argnums=(0, 1, 2),
    )(jnp.asarray(points), jnp.asarray(centers), jnp.asarray(cfeat))
    assert float(jnp.abs(gp).max()) == 0.0
    assert float(jnp.abs(gc).max()) == 0.0
    assert float(jnp.abs(gf).max()) > 0.0


def test_interpolate_exact_at_center_locations():
    # querying exactly at a center → weight ~1 on that center
    centers = jnp.asarray(
        np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]]], np.float32)
    )
    cfeat = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    out = np.asarray(three_nn_interpolate(centers, centers, cfeat))
    np.testing.assert_allclose(out[0], np.eye(4), atol=1e-4)


def test_gather_points():
    feats = jnp.arange(24.0).reshape(1, 8, 3)
    idx = jnp.asarray(np.array([[7, 0, 2]], np.int32))
    out = np.asarray(gather_points(feats, idx))
    np.testing.assert_allclose(out[0, 0], [21, 22, 23])
    np.testing.assert_allclose(out[0, 1], [0, 1, 2])


def test_logits_mask_semantics():
    rng = np.random.default_rng(5)
    n, m = 50, 12
    coords = rng.uniform(-1, 1, (3, n, 3)).astype(np.float32)
    logits = np.zeros((3, n, 2), np.float32)
    logits[0, :30, 1] = 1.0  # 30 candidates >= m: no repeats
    logits[1, :4, 1] = 1.0  # 4 candidates < m: wrap-repeat
    # sample 2: no candidates
    sel, mean, mask = logits_mask(
        jnp.asarray(coords), jnp.asarray(logits), m, jax.random.PRNGKey(0)
    )
    sel, mean, mask = np.asarray(sel), np.asarray(mean), np.asarray(mask)
    assert mask[0].sum() == 30 and mask[1].sum() == 4 and mask[2].sum() == 0

    # sample 0: selected coords ∈ {centered candidate coords}, all unique
    cand0 = coords[0, :30] - mean[0]
    d = np.linalg.norm(sel[0][:, None] - cand0[None], axis=-1)
    assert d.min(axis=1).max() < 1e-5
    picked = d.argmin(axis=1)
    assert len(set(picked.tolist())) == m

    # sample 1: only the 4 candidates appear, each >= floor(m/4) times
    cand1 = coords[1, :4] - mean[1]
    d1 = np.linalg.norm(sel[1][:, None] - cand1[None], axis=-1)
    assert d1.min(axis=1).max() < 1e-5
    counts = np.bincount(d1.argmin(axis=1), minlength=4)
    assert counts.min() >= m // 4

    # masked mean matches manual
    np.testing.assert_allclose(mean[1], coords[1, :4].mean(axis=0), rtol=1e-5)


def test_pointnet_modules_shapes_and_jit():
    from deftet_tpu.nn import (
        PointNetAModule,
        PointNetFPModule,
        PointNetSAModule,
    )

    rng = jax.random.PRNGKey(0)
    b, n, c = 2, 64, 8
    coords = jax.random.uniform(rng, (b, n, 3), minval=-1, maxval=1)
    feats = jax.random.normal(rng, (b, n, c))

    sa = PointNetSAModule(
        num_centers=16, radius=[0.4, 0.8], num_neighbors=[8, 16],
        out_channels=[[16, 32], [16, 32]],
    )
    vs = sa.init(rng, feats, coords, train=False)
    (sa_out, sa_coords), _ = jax.jit(
        lambda v, f, co: sa.apply(
            v, f, co, train=True, mutable=["batch_stats"]
        )
    )(vs, feats, coords)
    assert sa_out.shape == (b, 16, 64) and sa_coords.shape == (b, 16, 3)

    fp = PointNetFPModule(out_channels=[32, 16])
    vf = fp.init(rng, coords, sa_coords, sa_out, feats, train=False)
    fp_out, fp_coords = fp.apply(
        vf, coords, sa_coords, sa_out, feats, train=False
    )
    assert fp_out.shape == (b, n, 16) and fp_coords.shape == (b, n, 3)

    am = PointNetAModule(out_channels=[32, 64])
    va = am.init(rng, feats, coords, train=False)
    a_out, a_coords = am.apply(va, feats, coords, train=False)
    assert a_out.shape == (b, 1, 64) and a_coords.shape == (b, 1, 3)


def test_huber_and_kl_losses():
    from deftet_tpu.losses import huber_loss, kl_loss

    err = jnp.asarray([0.5, -2.0, 0.0])
    # |e|<=delta: 0.5 e^2 ; else 0.5 d^2 + d(|e|-d), delta=1
    expected = np.mean([0.125, 0.5 + 1.0, 0.0])
    np.testing.assert_allclose(float(huber_loss(err, 1.0)), expected, rtol=1e-6)

    x = jnp.asarray(np.random.default_rng(6).normal(size=(4, 5)).astype(np.float32))
    assert float(kl_loss(x, x)) == pytest.approx(0.0, abs=1e-6)
    y = x + 1.0  # constant shift leaves softmax unchanged
    assert float(kl_loss(x, y)) == pytest.approx(0.0, abs=1e-6)
    z = x * 2.0
    assert float(kl_loss(x, z)) > 0.0
    # gradient must not flow into the target (x is detached)
    g = jax.grad(lambda a: kl_loss(a, z))(x)
    assert float(jnp.abs(g).max()) == 0.0


def test_frustum_pointnet_loss_runs_and_zero_at_target():
    from deftet_tpu.losses import FrustumPointNetLoss, get_box_corners_3d

    nh, ns, b = 4, 2, 3
    templates = np.array([[1.0, 2.0, 1.0], [3.0, 1.5, 2.0]], np.float32)
    loss_fn = FrustumPointNetLoss(nh, ns, templates)

    rng = np.random.default_rng(7)
    hbin = np.array([0, 1, 2])
    sbin = np.array([0, 1, 0])
    center = rng.normal(size=(b, 3)).astype(np.float32)
    hres = rng.uniform(-0.1, 0.1, b).astype(np.float32)
    sres = rng.uniform(-0.1, 0.1, (b, 3)).astype(np.float32)

    # perfect predictions: large margins on the right class, exact residuals
    hscores = np.full((b, nh), -50.0, np.float32)
    hscores[np.arange(b), hbin] = 50.0
    sscores = np.full((b, ns), -50.0, np.float32)
    sscores[np.arange(b), sbin] = 50.0
    hres_all = np.zeros((b, nh), np.float32)
    hres_all[np.arange(b), hbin] = hres
    sres_all = np.zeros((b, ns, 3), np.float32)
    sres_all[np.arange(b), sbin] = sres
    mask_logits = np.zeros((b, 10, 2), np.float32)
    mask_logits[..., 1] = 50.0
    inputs = {
        "mask_logits": jnp.asarray(mask_logits),
        "center": jnp.asarray(center),
        "center_reg": jnp.asarray(center),
        "heading_scores": jnp.asarray(hscores),
        "heading_residuals_normalized": jnp.asarray(
            hres_all / (np.pi / nh)
        ),
        "heading_residuals": jnp.asarray(hres_all),
        "size_scores": jnp.asarray(sscores),
        "size_residuals_normalized": jnp.asarray(
            sres_all / templates[:, None][sbin].reshape(b, 1, 3)
        ).reshape(b, ns, 3),
        "size_residuals": jnp.asarray(sres_all),
    }
    targets = {
        "mask_logits": jnp.ones((b, 10), jnp.int32),
        "center": jnp.asarray(center),
        "heading_bin_id": jnp.asarray(hbin),
        "heading_residual": jnp.asarray(hres),
        "size_template_id": jnp.asarray(sbin),
        "size_residual": jnp.asarray(sres),
    }
    val = float(loss_fn(inputs, targets))
    assert val == pytest.approx(0.0, abs=1e-3)

    # perturbed centers → positive loss
    inputs_bad = dict(inputs)
    inputs_bad["center"] = inputs["center"] + 1.0
    assert float(loss_fn(inputs_bad, targets)) > 0.1

    # corner layout sanity: unit box, zero heading
    corners = np.asarray(
        get_box_corners_3d(
            jnp.zeros((1, 3)), jnp.zeros((1,)), jnp.ones((1, 3))
        )
    )
    assert corners.shape == (1, 3, 8)
    np.testing.assert_allclose(corners[0, :, 0], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.abs(corners), 0.5)
