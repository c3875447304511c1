"""Real-mesh ingestion tests (dataloader.py:118-207 parity): a directory
of arbitrary OBJ meshes -> watertight -> surface/SDF/occ-texture shards
-> end-to-end train + inference eval on the ingested data."""

import json
import os

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "assets", "meshes")


@pytest.fixture(scope="module")
def mesh_shards(tmp_path_factory):
    from deftet_tpu.data import build_dataset_from_meshes

    root = tmp_path_factory.mktemp("mesh_shards")
    paths = build_dataset_from_meshes(
        str(root), ASSETS, n_surface=512, n_sdf=256, seed=0,
        watertight_res=32, num_workers=1,
    )
    return paths


def test_ingestion_builds_valid_shards(mesh_shards):
    assert len(mesh_shards) == 3
    for p in mesh_shards:
        with np.load(p) as d:
            verts = d["verts"]
            faces = d["faces"]
            assert verts.shape[0] > 0 and faces.shape[0] > 0
            # watertighted into the unit box
            assert np.abs(verts).max() <= 0.5 + 1e-5
            assert np.isfinite(d["surface_points"]).all()
            assert d["sdf"].shape == (256,)
            # the occupancy texture must contain interior volume
            assert d["occ_grid"].sum() > 0


def test_ingested_meshes_watertight(mesh_shards):
    """Every edge must bound an even number of faces (closed surface —
    ray parity well-defined everywhere).  Diagonally-touching occupied
    voxels produce a few pinch edges shared by 4 faces; those are closed
    but non-manifold, same as the reference's voxel remesh."""
    for p in mesh_shards:
        with np.load(p) as d:
            faces = d["faces"]
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        key = np.sort(edges, axis=1)
        _, counts = np.unique(key, axis=0, return_counts=True)
        assert (counts % 2 == 0).all(), f"{p}: open (odd-count) edges"
        assert (counts == 2).mean() > 0.99, f"{p}: too many pinch edges"


def test_train_eval_on_ingested_meshes(mesh_shards, tmp_path):
    """End-to-end: deftet-train --mesh_dir, then deftet-eval on it."""
    from deftet_tpu.cli import eval_main, train_main

    logdir = str(tmp_path / "exp")
    rc = train_main([
        "--res", "4", "--batch_size", "2", "--n_point", "128",
        "--num_sample_points", "256", "--occ_sample", "128",
        "--per_face_samples", "4", "--encoder_blocks", "8,1,8;16,1,4",
        "--gcn_hidden", "16,8", "--pos_mlp_hidden", "8",
        "--occ_mlp_hidden", "16,8", "--epochs", "1",
        "--mesh_dir", ASSETS, "--watertight_res", "32",
        "--dataset_root", str(tmp_path / "cache"), "--logdir", logdir,
    ])
    assert rc == 0
    import glob

    exp = glob.glob(os.path.join(logdir, "*"))[0]
    rc = eval_main(["--experiment_path", exp])
    assert rc == 0
    with open(os.path.join(exp, "result_update.json")) as f:
        report = json.load(f)
    assert np.isfinite(report["metrics"]["occ_iou"])
    # category attribution from the mesh parent dir
    assert "meshes" in report["per_category"]

    # --res override: the encoders/decoders are grid-agnostic, so the
    # res-4 checkpoint must restore and evaluate on a res-5 grid
    # (finer-cell surface extraction; VERDICT weak #3 diagnostics).
    rc = eval_main(["--experiment_path", exp, "--res", "5"])
    assert rc == 0
    # the override writes a suffixed report; as-trained one is untouched
    with open(os.path.join(exp, "result_update_res5.json")) as f:
        report5 = json.load(f)
    assert report5["res"] == 5
    assert np.isfinite(report5["metrics"]["occ_iou"])
    with open(os.path.join(exp, "result_update.json")) as f:
        assert json.load(f)["res"] == 4
