"""Per-term train-step cost attribution (byte-diet targeting).

The round-3 roofline showed the res-50/bs-4 train step memory-bound at
224 GB / 648 GB/s (79% of v5e HBM peak).  This script attributes that
traffic: it compiles the step with one loss family ablated at a time
(lambda=0 skips the term at TRACE time — forward_losses never emits it)
and reports time + XLA-accounted bytes deltas vs the full step.

Run on the real chip:  python scripts/step_breakdown.py [--res 50]
Each variant pays its own (smaller) compile; expect ~15 min total.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", default="docs/step_breakdown_r4.json")
    ap.add_argument("--variants", default="",
                    help="comma-separated subset of variant names to run "
                         "(each ablation pays its own compile; subset to "
                         "bound chip time)")
    args = ap.parse_args()

    import jax

    # Honor DEFTET_PLATFORM=cpu|tpu like the CLIs: the axon TPU plugin
    # ignores the JAX_PLATFORMS env var, so a CPU smoke run would land on
    # the (possibly busy) TPU without this.
    plat = os.environ.get("DEFTET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.random as jrandom

    from deftet_tpu.config import TrainConfig
    from deftet_tpu.data.pipeline import occupancy_grid
    from deftet_tpu.data.shapes import random_shape
    from deftet_tpu.train import Engine

    rng = np.random.default_rng(0)
    verts, faces = random_shape(0, level=2)
    occ = occupancy_grid(verts, faces, 64)

    # Ablations: each zeroes ONE family out of the full step; "occ_only"
    # is the lower bound (encoders + BCE, no geometry/surface terms).
    variants = [
        ("full", {}),
        ("no_chamfer", {"lambda_surf_chamfer": 0.0}),
        ("no_analytic", {"lambda_surf": 0.0}),
        ("no_normal", {"lambda_normal": 0.0}),
        ("no_surface_all", {"lambda_surf": 0.0, "lambda_surf_chamfer": 0.0,
                            "lambda_normal": 0.0}),
        ("no_geom_regs", {"lambda_area": 0.0, "lambda_edge": 0.0,
                          "lambda_amips": 0.0, "lambda_lap": 0.0,
                          "lambda_delta": 0.0}),
        ("occ_only", {"lambda_def": 0.0}),
    ]

    if args.variants:
        want = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in want]

    results = []
    for name, over in variants:
        cfg = TrainConfig(
            res=args.res, batch_size=args.batch, n_point=5000,
            num_sample_points=5000, occ_sample=10000, per_face_samples=20,
            logdir="/tmp/deftet_breakdown", experiment_id=f"bd_{name}",
        )
        for k, v in over.items():
            setattr(cfg, k, v)
        t_build = time.perf_counter()
        engine = Engine(cfg)
        b = cfg.batch_size
        batch = {
            "surface_points": rng.uniform(
                -0.4, 0.4, (b, cfg.num_sample_points, 3)
            ).astype(np.float32),
            "verts": np.tile(verts.astype(np.float32)[None], (b, 1, 1)),
            "faces": np.tile(faces.astype(np.int32)[None], (b, 1, 1)),
            "n_faces": np.full((b,), faces.shape[0], np.int32),
            "occ_grid": np.tile(occ[None], (b, 1, 1, 1)),
        }
        sharded = engine._prep_batch(batch)
        build_s = time.perf_counter() - t_build
        t0 = time.perf_counter()
        state, terms = engine._train_step(
            engine.state, sharded, jrandom.PRNGKey(0), engine.statics
        )
        float(terms["total"])  # host fetch = real sync on this backend
        compile_s = time.perf_counter() - t0
        engine.state = state
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            state, terms = engine._train_step(
                engine.state, sharded, jrandom.PRNGKey(i + 1),
                engine.statics,
            )
            engine.state = state
            float(terms["total"])
            times.append(time.perf_counter() - t0)
        step_ms = float(np.median(times)) * 1e3
        rec = {"variant": name, "step_ms": round(step_ms, 1),
               "compile_s": round(compile_s, 1),
               "build_s": round(build_s, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        del engine, state, terms, sharded

    full = next(
        (r["step_ms"] for r in results if r["variant"] == "full"), None
    )
    if full is not None:
        for r in results:
            r["delta_vs_full_ms"] = round(full - r["step_ms"], 1)
    out = os.path.join(REPO, args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
