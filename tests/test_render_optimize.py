"""End-to-end 2D-supervision pipeline test: optimize a tiny tet grid
against procedurally rendered GT and check the image loss drops."""

import json

import numpy as np

from deftet_tpu.render.optimize import (
    RenderOptConfig,
    evaluate_psnr,
    make_synthetic_scene,
    optimize_stage,
    pixel_grid,
    run_pipeline,
)
from deftet_tpu.render.scene import TetScene
from deftet_tpu.tetgrid import build_tet_grid


def test_pixel_grid_ndc():
    g = pixel_grid(2, 2).reshape(2, 2, 2)
    # top-left pixel: x=-0.5, y=+0.5 (y up)
    np.testing.assert_allclose(g[0, 0], [-0.5, 0.5])
    np.testing.assert_allclose(g[1, 1], [0.5, -0.5])


def test_synthetic_scene_shapes():
    images, poses, hwf, splits = make_synthetic_scene(
        n_views=4, height=16, width=16
    )
    assert images.shape == (4, 16, 16, 4)
    assert poses.shape == (4, 4, 4)
    assert images.min() >= 0.0 and images.max() <= 1.0
    # object visible: mask covers some but not all pixels
    mask = images[..., 3]
    assert 0.01 < mask.mean() < 0.9
    # interleaved holdout: test views sit inside the trained azimuth
    # range (every 4th view), not a contiguous never-seen arc
    i_train, i_val, i_test = splits
    np.testing.assert_array_equal(i_test, [0])
    # val is held out from BOTH train and test (the carve-escalation
    # guard consults val, so it must not leak test views)
    assert len(np.intersect1d(i_train, i_test)) == 0
    assert len(np.intersect1d(i_val, i_test)) == 0
    assert len(np.intersect1d(i_train, i_val)) == 0
    all_views = np.sort(np.concatenate([i_train, i_val, i_test]))
    np.testing.assert_array_equal(all_views, np.arange(4))


def test_optimize_stage_reduces_loss():
    images, poses, hwf, (i_train, _, i_test) = make_synthetic_scene(
        n_views=4, height=24, width=24
    )
    cfg = RenderOptConfig(
        tet_res=4, sublevels=0, pixel_sampling=0.5, k=4,
        delete_every=10_000, seed=0,
    )
    grid = build_tet_grid(cfg.tet_res)
    scene = TetScene.from_grid(grid, coef=cfg.coef)
    params = scene.init_params()

    mse0, _ = evaluate_psnr(
        scene, params, images, poses, hwf, i_test, cfg
    )
    params, history, stage_info = optimize_stage(
        scene, params, images, poses, hwf, i_train, cfg,
        gridmov=False, steps=60, log=None,
    )
    assert stage_info["bin_overflow_final"] == 0
    mse1, psnr1 = evaluate_psnr(
        scene, params, images, poses, hwf, i_test, cfg
    )
    assert mse1 < mse0, f"test MSE did not improve: {mse0} -> {mse1}"
    assert np.isfinite(history).all()


def test_run_pipeline_with_subdivision():
    images, poses, hwf, splits = make_synthetic_scene(
        n_views=3, height=16, width=16
    )
    cfg = RenderOptConfig(
        tet_res=3, sublevels=1, steps_fix=12, steps_mov=8,
        pixel_sampling=0.5, k=4, delete_every=10_000, seed=1,
    )
    scene, params, records = run_pipeline(
        images, poses, hwf, splits, cfg, log=None
    )
    # stages ran: (mov, fix) x 2 sublevels
    assert [r["stage"] for r in records] == ["mov", "fix", "mov", "fix"]
    # subdivision happened between sublevels
    assert records[2]["n_tets"] == 8 * records[1]["n_tets"]
    assert params["feat"].shape[0] == scene.n_points
    assert all(np.isfinite(r["mse"]) for r in records)


def test_surface_obj_and_turntable(tmp_path):
    import jax.numpy as jnp

    from deftet_tpu.render.optimize import export_turntable
    from deftet_tpu.utils import load_obj

    grid = build_tet_grid(3)
    scene = TetScene.from_grid(grid, coef=2.0)
    params = scene.init_params()
    # make a blob occupied: high alpha near the center
    import numpy as np

    base = scene.points_px3
    r = np.linalg.norm(base, axis=1)
    alpha_logit = np.where(r < 0.3, 5.0, -5.0).astype(np.float32)
    params = {
        "mov": params["mov"],
        "feat": jnp.asarray(
            np.concatenate(
                [alpha_logit[:, None],
                 np.zeros((base.shape[0], 3), np.float32)], axis=1
            )
        ),
    }
    obj = tmp_path / "surface.obj"
    n_faces = scene.save_surface_obj(params, str(obj), threshold=0.4)
    assert n_faces > 0
    verts, faces = load_obj(str(obj))
    assert faces.shape[0] == n_faces
    assert np.isfinite(verts).all()

    cfg = RenderOptConfig(tet_res=3, k=4)
    gif = tmp_path / "turn.gif"
    frames = export_turntable(
        scene, params, (16, 16, 20.0), cfg, str(gif), n_frames=3
    )
    assert frames.shape == (3, 16, 16, 3)
    assert gif.exists() and gif.stat().st_size > 0

    mp4 = tmp_path / "turn.mp4"
    export_turntable(scene, params, (16, 16, 20.0), cfg, str(mp4),
                     n_frames=3)
    assert mp4.exists() and mp4.stat().st_size > 0


def test_write_video_mp4_roundtrip(tmp_path):
    from deftet_tpu.render.optimize import write_video

    frames = (np.random.default_rng(0).random((4, 32, 32, 3)) * 255
              ).astype(np.uint8)
    path = write_video(frames, str(tmp_path / "v.mp4"), fps=4)
    assert path.endswith(".mp4")
    import cv2

    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4


def test_optimize_stage_convergence_video(tmp_path):
    images, poses, hwf, (i_train, _, _) = make_synthetic_scene(
        n_views=3, height=16, width=16
    )
    cfg = RenderOptConfig(
        tet_res=3, sublevels=0, pixel_sampling=0.5, k=4,
        delete_every=10_000, seed=0,
    )
    grid = build_tet_grid(cfg.tet_res)
    scene = TetScene.from_grid(grid, coef=cfg.coef)
    params = scene.init_params()
    vid = tmp_path / "stage.mp4"
    optimize_stage(
        scene, params, images, poses, hwf, i_train, cfg,
        gridmov=False, steps=5, log=None,
        video_path=str(vid), video_every=2,
    )
    assert vid.exists() and vid.stat().st_size > 0


def test_render_cli_end_to_end(tmp_path):
    """deftet-render with a micro procedural scene: runs the staged
    pipeline, writes records.json + surface OBJ + turntable GIF."""
    import json
    import os

    from deftet_tpu.cli import render_main

    rc = render_main([
        "--synthetic", "--n_views", "3", "--image_size", "16",
        "--tetres", "4", "--sublevel", "0", "--optfixnum", "6",
        "--optmovnum", "4", "--deletenum", "5", "--peel_k", "3",
        "--savedir", str(tmp_path), "--expname", "t",
    ])
    assert rc == 0
    out = tmp_path / "t"
    rec = json.loads((out / "records.json").read_text())
    assert rec["stages"] and "final_psnr" in rec
    names = os.listdir(out)
    assert "surface.obj" in names
    assert any(n.endswith(".gif") for n in names)


def test_save_surface_obj_includes_occupied_hull_faces(tmp_path):
    """A fully occupied grid touches every box wall: the export must be
    the closed grid hull (reference saveobj includes hull faces via the
    occ-0 missing-neighbor rule, 3_model/deftet.py:503-557)."""
    import jax.numpy as jnp
    import numpy as np

    from deftet_tpu.utils import load_obj

    grid = build_tet_grid(2)
    scene = TetScene.from_grid(grid, coef=2.0)
    params = scene.init_params()
    n_pts = scene.points_px3.shape[0]
    params = {
        "mov": params["mov"],
        "feat": jnp.asarray(
            np.concatenate(
                [np.full((n_pts, 1), 5.0, np.float32),
                 np.zeros((n_pts, 3), np.float32)], axis=1
            )
        ),
    }
    obj = tmp_path / "hull.obj"
    n_faces = scene.save_surface_obj(params, str(obj), threshold=0.4)
    assert n_faces > 0
    _, faces = load_obj(str(obj))
    # closed surface: every edge shared by exactly two faces
    edges = np.sort(
        np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        ),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), "exported hull surface is not closed"

def test_load_blender_fake_dataset(tmp_path):
    """NeRF-synthetic loader parity (2_data/load_blender.py:55-115):
    per-split transforms json + RGBA pngs -> stacked [0,1] images, pose
    matrices, focal from camera_angle_x, and half-res decimation."""
    import imageio.v2 as imageio

    from deftet_tpu.render.optimize import load_blender

    rng = np.random.default_rng(0)
    h = w = 8
    counts = {"train": 3, "val": 1, "test": 2}
    for split, n in counts.items():
        frames = []
        for i in range(n):
            name = f"r_{split}_{i}"
            img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            imageio.imwrite(tmp_path / f"{name}.png", img)
            pose = np.eye(4)
            pose[:3, 3] = [i, 0.0, 4.0]
            frames.append(
                {"file_path": f"./{name}",
                 "transform_matrix": pose.tolist()}
            )
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)

    imgs, poses, (hh, ww, focal), i_split = load_blender(
        str(tmp_path), half_res=False
    )
    assert imgs.shape == (6, h, w, 4)
    assert imgs.dtype == np.float32 and imgs.max() <= 1.0
    assert poses.shape == (6, 4, 4)
    assert np.allclose(poses[1, :3, 3], [1.0, 0.0, 4.0])
    assert [len(s) for s in i_split] == [3, 1, 2]
    assert abs(focal - 0.5 * w / np.tan(0.5 * 0.6911)) < 1e-4

    imgs2, _, (h2, w2, f2), _ = load_blender(str(tmp_path), half_res=True)
    assert imgs2.shape == (6, h // 2, w // 2, 4)
    assert (h2, w2) == (h // 2, w // 2) and abs(f2 * 2 - focal) < 1e-6


def test_carve_and_subdivide_budget_paths():
    """Budget-bounded sublevel transition (carve_and_subdivide):
    reference all-tet 8x split under budget; selective surface-band or
    no-op escalation when the budget is tight."""
    import jax.numpy as jnp

    from deftet_tpu.render.optimize import carve_and_subdivide

    images, poses, hwf, (i_train, _, i_test) = make_synthetic_scene(
        n_views=3, height=16, width=16
    )
    cfg = RenderOptConfig(tet_res=3, k=4, pixel_sampling=0.5, seed=0)
    grid = build_tet_grid(cfg.tet_res)

    # --- under budget: exact reference semantics (all tets split 1->8)
    scene = TetScene.from_grid(grid, coef=cfg.coef)
    params = scene.init_params()
    n0 = scene.n_tets
    params = carve_and_subdivide(
        scene, params, images, poses, hwf, i_test, cfg, log=None
    )
    assert scene.n_tets == 8 * n0
    assert params["feat"].shape[0] == scene.n_points

    # --- over budget, carvable: most tets empty (alpha ~ 0), a small
    # occupied cluster; the escalated carve must fit the budget
    scene = TetScene.from_grid(grid, coef=cfg.coef)
    params = scene.init_params()
    feat = np.full((scene.n_points, 4), -12.0, np.float32)
    center = np.linalg.norm(scene.points_px3, axis=1) < 0.3
    feat[center, 0] = 6.0
    params = {"feat": jnp.asarray(feat), "mov": params["mov"]}
    n_occupied = int(
        (1.0 / (1.0 + np.exp(-feat[scene.tets_tx4[:, 0], 0])) > 0.1).sum()
    )
    assert 0 < n_occupied < scene.n_tets
    cfg_tight = RenderOptConfig(
        tet_res=3, k=4, pixel_sampling=0.5, seed=0,
        tet_budget=8 * scene.n_tets - 1,  # all-split cannot fit
    )
    n0 = scene.n_tets
    params = carve_and_subdivide(
        scene, params, images, poses, hwf, i_test, cfg_tight, log=None
    )
    assert scene.n_tets <= cfg_tight.tet_budget
    assert scene.n_tets < 8 * n0
    assert params["feat"].shape[0] == scene.n_points

    # --- budget so tight even selective split fails: keep current level
    scene = TetScene.from_grid(grid, coef=cfg.coef)
    params = scene.init_params()  # all alpha 0.5: carving keeps all
    n0 = scene.n_tets
    cfg_noop = RenderOptConfig(
        tet_res=3, k=4, pixel_sampling=0.5, seed=0, tet_budget=n0 + 1,
    )
    params2 = carve_and_subdivide(
        scene, params, images, poses, hwf, i_test, cfg_noop, log=None
    )
    assert scene.n_tets == n0
    assert params2["feat"].shape[0] == scene.n_points


def test_run_pipeline_from_tet_file(tmp_path):
    """--tet_file parity path: the pipeline runs on a quartet-format
    .tet grid instead of the built-in Kuhn lattice
    (dataloder_helper.py:36-43 reads quartet grids the same way)."""
    from deftet_tpu.tetgrid.grid import save_tet_file

    grid = build_tet_grid(3)
    path = str(tmp_path / "grid.tet")
    save_tet_file(grid, path)

    images, poses, hwf, splits = make_synthetic_scene(
        n_views=3, height=16, width=16
    )
    cfg = RenderOptConfig(
        tet_res=999, tet_file=path,  # tet_res must be ignored
        sublevels=0, steps_fix=4, steps_mov=0,
        pixel_sampling=0.5, k=4, delete_every=10_000, seed=0,
    )
    scene, params, records = run_pipeline(
        images, poses, hwf, splits, cfg, log=None
    )
    assert scene.n_tets == grid.n_tets
    assert params["feat"].shape[0] == grid.n_vertices
    assert all(np.isfinite(r["mse"]) for r in records)


def test_carve_and_subdivide_selective_band_split():
    """Pins escalation step 2: when no carve threshold can fit the
    budget (all alphas above the hardest escalated threshold) but the
    surface band alone fits, only tets with min corner alpha < 0.9 are
    split and the rest survive unsplit."""
    import jax.numpy as jnp

    from deftet_tpu.render.optimize import carve_and_subdivide

    images, poses, hwf, (_, i_val, _) = make_synthetic_scene(
        n_views=3, height=16, width=16
    )
    grid = build_tet_grid(3)
    scene = TetScene.from_grid(grid, coef=2.5)
    params = scene.init_params()
    # half-space occupancy: x<0 vertices fully occupied (alpha~1), the
    # rest at alpha~0.6 — above every escalated carve threshold
    # (delete_threshold*100 = 0.1), so carving is a no-op at all rungs
    feat = np.full((scene.n_points, 4), 0.4, np.float32)  # alpha ~0.599
    feat[scene.points_px3[:, 0] < 0.0, 0] = 12.0          # alpha ~1
    params = {"feat": jnp.asarray(feat), "mov": params["mov"]}

    alpha = 1.0 / (1.0 + np.exp(-feat[:, 0]))
    flagged = int((alpha[scene.tets_tx4].min(axis=1) < 0.9).sum())
    n0 = scene.n_tets
    assert 0 < flagged < n0  # both branches of the selective split exist
    est = 8 * flagged + (n0 - flagged)

    cfg = RenderOptConfig(
        tet_res=3, k=4, pixel_sampling=0.5, seed=0, tet_budget=est,
    )
    params = carve_and_subdivide(
        scene, params, images, poses, hwf, i_val, cfg, log=None
    )
    # exactly the flagged band split 1->8; interior tets kept whole
    assert scene.n_tets == est
    assert n0 < scene.n_tets < 8 * n0
    assert params["feat"].shape[0] == scene.n_points
