"""Command-line entry points (reference: train_multigpu.py:503-511,
eval.py:393-402).

``deftet-train``: build (or reuse) a procedural dataset, create an
experiment, run the fit loop with best-IoU checkpointing.

``deftet-eval``: load an experiment dir, restore the best (or last)
checkpoint, report validation losses + occupancy IoU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from .config import Experiment, TrainConfig, add_config_args, config_from_args
from .data import ShapeDataset, batch_iterator, build_dataset
from .train import Engine


def _maybe_force_platform() -> None:
    """Honor DEFTET_PLATFORM=cpu|tpu and enable the persistent
    compilation cache (utils/jaxsetup.py)."""
    from .utils.jaxsetup import setup_jax

    setup_jax()


def _split(dataset: ShapeDataset, batch_size: int):
    """Train/val split; the val split is always >= one full batch.

    Val shapes are picked at a uniform stride through the (sorted) path
    list rather than as a contiguous prefix: shard names sort by
    category (the ShapeNet class-dir convention), so a prefix val split
    holds out exactly one category and the per-category eval table
    degenerates to a single row (the round-3 hard-geometry run).  The
    stride spreads the holdout across every category.

    With fewer than 2 batches of shapes total, val reuses training shapes
    (small smoke runs) rather than silently validating on nothing.
    """
    n = len(dataset)
    n_val = max(batch_size, n // 8)
    stride = max(1, n // n_val)
    val_idx = list(range(0, n, stride))[:n_val]
    # top up if the stride undershot (n not divisible)
    rest = [i for i in range(n) if i not in set(val_idx)]
    val_idx += rest[: n_val - len(val_idx)]
    val_set = set(val_idx)
    val_paths = [dataset.paths[i] for i in sorted(val_set)]
    if n >= n_val + batch_size:
        train_paths = [
            p for i, p in enumerate(dataset.paths) if i not in val_set
        ]
    else:
        train_paths = dataset.paths
    return ShapeDataset(train_paths), ShapeDataset(val_paths)


def _dataset(config: TrainConfig) -> ShapeDataset:
    if config.mesh_dir:
        from .data import build_dataset_from_meshes

        paths = build_dataset_from_meshes(
            config.dataset_root,
            config.mesh_dir,
            n_surface=max(config.num_sample_points, config.n_point),
            n_sdf=config.num_sample_points,
            seed=config.seed,
            watertight_res=config.watertight_res,
            occ_grid_res=config.resolved_occ_grid_res(),
            with_images=config.use_disn,
        )
    else:
        paths = build_dataset(
            config.dataset_root,
            n_shapes=config.n_shapes,
            n_surface=max(config.num_sample_points, config.n_point),
            n_sdf=config.num_sample_points,
            seed=config.seed,
            occ_grid_res=config.resolved_occ_grid_res(),
            with_images=config.use_disn,
        )
    return ShapeDataset(paths)


def train_main(argv=None) -> int:
    _maybe_force_platform()
    parser = argparse.ArgumentParser(prog="deftet-train")
    add_config_args(parser)
    args = parser.parse_args(argv)
    config = config_from_args(args)

    dataset = _dataset(config)
    train_set, val_set = _split(dataset, config.batch_size)

    engine = Engine(config)
    # Persist the split manifest so eval provably runs on the same
    # held-out shapes (the reference's fixed val dataloader,
    # train_multigpu.py:469-501); `disjoint` records whether the small-
    # dataset fallback reused training shapes.
    with open(engine.experiment.file_path("split.json"), "w") as f:
        json.dump(
            {
                "train": [os.path.abspath(p) for p in train_set.paths],
                "val": [os.path.abspath(p) for p in val_set.paths],
                "disjoint": not (
                    set(train_set.paths) & set(val_set.paths)
                ),
            },
            f, indent=2,
        )
    print(f"experiment: {engine.experiment.path}", flush=True)
    history = engine.fit(
        lambda: batch_iterator(
            train_set,
            config.batch_size,
            rng=np.random.default_rng(config.seed + engine.epoch),
        ),
        lambda: batch_iterator(val_set, config.batch_size),
    )
    for rec in history:
        print(json.dumps(rec), flush=True)
    print(f"best occupancy IoU: {engine.best_iou:.4f}")
    return 0


def eval_main(argv=None) -> int:
    """Full inference evaluation: surface extraction + the 9 metrics of
    eval.py:171-349 (occ IoU, F-score/extend, Chamfer, Chamfer-L1,
    Hausdorff avg/max) plus validation losses."""
    _maybe_force_platform()
    import jax

    from .evals import make_inference_step

    parser = argparse.ArgumentParser(prog="deftet-eval")
    parser.add_argument("--experiment_path", required=True)
    parser.add_argument("--checkpoint", default="best",
                        choices=["best", "last"])
    parser.add_argument("--save_vis", action="store_true",
                        help="dump predicted-surface OBJs for one batch")
    parser.add_argument("--res", type=int, default=0,
                        help="override the tet-grid resolution for "
                        "inference (0 = as trained).  The encoders/"
                        "decoders are grid-agnostic (per-vertex feature "
                        "sampling), so a res-50 checkpoint can extract "
                        "surfaces on a res-70 grid — finer cells, better "
                        "small-radius F-score")
    parser.add_argument("--eval_points", type=int, default=100_000,
                        help="surface samples per side for F-score/Chamfer "
                        "(reference eval.py:244 uses 100k; point-to-point "
                        "metrics are sampling-density-floored, so small "
                        "counts understate surface quality)")
    parser.add_argument("--batch_size", type=int, default=0,
                        help="override the eval batch size (0 = as "
                        "trained).  The reference evals at batch 1 "
                        "(eval.py:147); batch 1 makes the per-category "
                        "tables exact instead of batch-majority "
                        "attributed")
    args = parser.parse_args(argv)

    experiment = Experiment.load(args.experiment_path)
    import dataclasses as _dc

    config = _dc.replace(
        experiment.config, eval_points=args.eval_points
    )
    if args.res:
        config = _dc.replace(config, res=args.res)
    if args.batch_size:
        config = _dc.replace(config, batch_size=args.batch_size)
    engine = Engine(config, experiment=experiment)
    engine.restore(args.checkpoint)

    # Consume the persisted split manifest when present (auditable
    # held-out eval); fall back to re-deriving it from config.
    split_file = os.path.join(args.experiment_path, "split.json")
    val_set = None
    if os.path.exists(split_file):
        with open(split_file) as f:
            manifest = json.load(f)
        val_paths = [p for p in manifest.get("val", []) if os.path.exists(p)]
        if val_paths and len(val_paths) == len(manifest.get("val", [])):
            val_set = ShapeDataset(val_paths)
    if val_set is None:
        dataset = _dataset(config)
        _, val_set = _split(dataset, config.batch_size)
    means = engine.validate(
        batch_iterator(val_set, config.batch_size)
    )

    infer = make_inference_step(
        engine.model, config,
        lattice_offsets=engine._lattice_offsets,
        tet_lattice=engine._tet_lattice,
    )
    sums, n = {}, 0
    per_cat: dict = {}
    vis_done = False
    for batch in batch_iterator(val_set, config.batch_size):
        out = infer(
            engine.state, engine._prep_batch(batch),
            jax.random.PRNGKey(config.seed), engine.statics,
        )
        out = {k: float(v) for k, v in out.items()}
        for k, v in out.items():
            sums[k] = sums.get(k, 0.0) + v
        n += 1
        # per-category accumulation (eval.py:310-349 result_update tables);
        # batches are metric-averaged, so attribute to the batch's majority
        # category (homogeneous for category-sorted datasets).
        cats = batch.get("category")
        if cats:
            cat = max(set(cats), key=cats.count)
            bucket = per_cat.setdefault(cat, {"n": 0})
            bucket["n"] += 1
            for k, v in out.items():
                bucket[k] = bucket.get(k, 0.0) + v
        if args.save_vis and not vis_done:
            from .evals.harness import save_predicted_surface_objs

            save_predicted_surface_objs(
                engine.model, engine.state, engine._prep_batch(batch),
                engine.statics, config,
                experiment.file_path("vis_surface"),
                lattice_offsets=engine._lattice_offsets,
                tet_lattice=engine._tet_lattice,
            )
            vis_done = True
    metrics = {k: v / max(n, 1) for k, v in sums.items()}
    per_category = {
        cat: {k: v / b["n"] for k, v in b.items() if k != "n"}
        for cat, b in per_cat.items()
    }
    report = {
        "checkpoint": args.checkpoint,
        "res": config.res,
        "val_losses": means,
        "metrics": metrics,
        "per_category": per_category,
    }
    # A res override writes a suffixed report so the as-trained
    # result_update.json is never clobbered by diagnostic re-evals.
    suffix = f"_res{config.res}" if args.res else ""
    if args.batch_size:
        suffix += f"_b{args.batch_size}"
    with open(
        experiment.file_path(f"result_update{suffix}.json"), "w"
    ) as f:
        json.dump(report, f, indent=2)
    # per-category ampersand-separated tables like eval.py:311-349's
    # result_update.txt (metric x100, trailing row mean)
    cats = sorted(per_category) or ["all"]
    with open(experiment.file_path("result_update.txt"), "a") as f:
        f.write("cats: " + " ".join(cats) + "\n")
        keys = sorted(metrics)
        for k in keys:
            f.write(k + ": ")
            vals = [
                per_category.get(c, metrics).get(k, metrics.get(k, 0.0))
                for c in cats
            ]
            for v in vals:
                f.write(f"{100 * v:2.2f} &")
            f.write(f"{100 * sum(vals) / len(vals):2.3f} &\n")
    print(json.dumps(report, indent=2))
    return 0


def preprocess_main(argv=None) -> int:
    """Offline mesh-directory ingestion (the reference's first-run
    DataLoader preprocessing, dataloader.py:118-207, as an explicit
    command): watertight + surface/SDF sample + occupancy texture each
    OBJ under --mesh_dir into npz shards at --dataset_root."""
    parser = argparse.ArgumentParser(prog="deftet-preprocess")
    parser.add_argument("--mesh_dir", required=True)
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--n_surface", type=int, default=20000)
    parser.add_argument("--n_sdf", type=int, default=20000)
    parser.add_argument("--watertight_res", type=int, default=100)
    parser.add_argument("--occ_grid_res", type=int, default=64)
    parser.add_argument("--with_images", action="store_true",
                        help="also render DISN images + camera matrices")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=8)
    args = parser.parse_args(argv)

    from .data import build_dataset_from_meshes

    paths = build_dataset_from_meshes(
        args.dataset_root, args.mesh_dir,
        n_surface=args.n_surface, n_sdf=args.n_sdf, seed=args.seed,
        watertight_res=args.watertight_res,
        num_workers=args.num_workers, occ_grid_res=args.occ_grid_res,
        with_images=args.with_images,
    )
    print(json.dumps({"n_shards": len(paths), "paths": paths}, indent=2))
    return 0


def render_main(argv=None) -> int:
    """2D-supervision optimization entry point (the diff_render app,
    optim_with_mask_subdiv_from_gridmov.py:403-521).  Flag names follow
    6_optim/expconfig.py; data comes from a NeRF-synthetic scene dir
    (--datadir) or a self-contained procedural GT scene (--synthetic)."""
    _maybe_force_platform()
    from .render.optimize import (
        DEFAULT_WEIGHTS,
        RenderOptConfig,
        evaluate_psnr,
        load_blender,
        make_synthetic_scene,
        run_pipeline,
    )

    parser = argparse.ArgumentParser(prog="deftet-render")
    parser.add_argument("--expname", default="scene")
    parser.add_argument("--savedir", default="./render_out")
    parser.add_argument("--datadir", default=None,
                        help="NeRF-synthetic scene dir (transforms_*.json)")
    parser.add_argument("--synthetic", action="store_true",
                        help="use the procedural GT scene instead of data")
    parser.add_argument("--n_views", type=int, default=16)
    parser.add_argument("--image_size", type=int, default=100)
    hr = parser.add_mutually_exclusive_group()
    hr.add_argument("--half_res", dest="half_res", action="store_true",
                    default=True)
    hr.add_argument("--no_half_res", dest="half_res", action="store_false")
    parser.add_argument("--tetres", type=int, default=40)
    parser.add_argument("--tet_file", default=None,
                        help="quartet-format .tet grid file (overrides "
                        "--tetres; the reference's diff_render scenes use "
                        "quartet grids, dataloder_helper.py:36-43)")
    parser.add_argument("--tetcoef", type=float, default=2.5)
    parser.add_argument("--sublevel", type=int, default=2)
    parser.add_argument("--deletenum", type=int, default=1000)
    parser.add_argument("--deletethres", type=float, default=1e-3)
    parser.add_argument("--optfixnum", type=int, default=3000)
    parser.add_argument("--optmovnum", type=int, default=2000)
    parser.add_argument("--lrfix", type=float, default=5e-2)
    parser.add_argument("--lrmov", type=float, default=5e-4)
    parser.add_argument("--pixelsampling", type=float, default=0.04)
    # kaolin deftet_sparse_render knum default (see RenderOptConfig.k)
    parser.add_argument("--peel_k", type=int, default=300)
    parser.add_argument("--tet_budget", type=int, default=1_000_000,
                        help="post-subdivision tet budget; 0 = unlimited "
                        "(exact reference semantics — subdivide every "
                        "alive tet).  See RenderOptConfig.tet_budget.")
    parser.add_argument("--seed", type=int, default=0)
    for name, default in (
        ("weights_im_loss", 1.0), ("weights_mask_loss", 2.0),
        ("weights_mask_reg", 1e-2), ("weights_occ_lap", 0.0),
        ("weights_color_reg", 0.0), ("weights_point_mov", 1e-2),
        ("weights_tetvariance", 0.0),
    ):
        parser.add_argument(f"--{name}", type=float, default=default)
    args = parser.parse_args(argv)

    if args.datadir:
        images, poses, hwf, i_split = load_blender(
            args.datadir, half_res=args.half_res
        )
    else:
        images, poses, hwf, i_split = make_synthetic_scene(
            n_views=args.n_views, height=args.image_size,
            width=args.image_size, seed=args.seed, coef=args.tetcoef,
        )

    weights = dict(DEFAULT_WEIGHTS)
    weights.update(
        weights_im_loss=args.weights_im_loss,
        weights_mask_loss=args.weights_mask_loss,
        weights_mask_reg=args.weights_mask_reg,
        weights_point_mov=args.weights_point_mov,
        weights_tetvariance=args.weights_tetvariance,
        # per-channel feature-laplacian vector [rgb=color_reg, alpha=occ_lap]
        weights_vector=(
            (args.weights_color_reg,) * 3 + (args.weights_occ_lap,)
        ),
        weights_vector_with_gridmov=(
            (args.weights_color_reg,) * 3 + (args.weights_occ_lap,)
            + (args.weights_point_mov,) * 3
        ),
    )
    cfg = RenderOptConfig(
        tet_res=args.tetres, tet_file=args.tet_file,
        coef=args.tetcoef, sublevels=args.sublevel,
        steps_fix=args.optfixnum, steps_mov=args.optmovnum,
        pixel_sampling=args.pixelsampling, lr_feat=args.lrfix,
        lr_mov=args.lrmov, delete_every=args.deletenum,
        delete_threshold=args.deletethres, k=args.peel_k,
        tet_budget=args.tet_budget, seed=args.seed,
    )
    outdir = os.path.join(args.savedir, args.expname)
    os.makedirs(outdir, exist_ok=True)
    scene, params, records = run_pipeline(
        images, poses, hwf, i_split, cfg, weights=weights
    )
    mse, psnr = evaluate_psnr(
        scene, params, images, poses, hwf, i_split[2], cfg
    )
    with open(os.path.join(outdir, "records.json"), "w") as f:
        json.dump({"stages": records, "final_mse": mse,
                   "final_psnr": psnr}, f, indent=2)
    from .render.optimize import export_turntable

    scene.save_surface_obj(params, os.path.join(outdir, "surface.obj"))
    export_turntable(
        scene, params, hwf, cfg,
        os.path.join(outdir, f"rgb-mse{mse:.3f}-psnr{psnr:.3f}.gif"),
    )
    print(json.dumps({"mse": mse, "psnr": psnr, "outdir": outdir}))
    return 0


if __name__ == "__main__":  # python -m deftet_tpu.cli <cmd> ...
    cmd = sys.argv[1] if len(sys.argv) > 1 else "train"
    fn = {
        "train": train_main,
        "eval": eval_main,
        "render": render_main,
        "preprocess": preprocess_main,
    }[cmd]
    sys.exit(fn(sys.argv[2:]))
