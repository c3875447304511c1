"""Roofline / MFU accounting for the hot kernels + the train step.

For each site, times the compiled program (host-fetch sync — this remote
TPU's block_until_ready can return early) and reads XLA's own
cost_analysis (flops / bytes accessed) off the compiled executable, then
reports achieved FLOP/s and HBM GB/s against the chip peaks:

  TPU v5e (1 chip): 197 TFLOP/s bf16 MXU, 16 GB HBM @ 819 GB/s.
  (f32 elementwise work runs on the VPU, roughly an order of magnitude
  below MXU peak — VPU-bound kernels are flagged, not %-scored.)

Usage:  python scripts/roofline.py [--small] [--json OUT]

Answers BASELINE.md's north-star ask ("Mtets/s for the occupancy
(point-in-tet) and rasterizer kernels") with a utilization denominator.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_GBS = 819.0


def sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1).astype(jnp.float32)[0])


def timed(compiled, args, iters=5):
    sync(compiled(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(compiled(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def analyze(name, fn, args, work_items=None, unit="items"):
    """Compile fn(*args), time it, pull XLA cost analysis."""
    import jax

    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    dt = timed(jitted, args)
    row = {
        "site": name,
        "time_ms": round(dt * 1e3, 2),
        "xla_gflops": round(flops / 1e9, 2),
        "xla_gbytes": round(bytes_acc / 1e9, 3),
        "achieved_tflops_s": round(flops / dt / 1e12, 3),
        "achieved_hbm_gbs": round(bytes_acc / dt / 1e9, 1),
        "pct_mxu_peak": round(100 * flops / dt / PEAK_BF16_FLOPS, 2),
        "pct_hbm_peak": round(100 * bytes_acc / dt / 1e9 / PEAK_HBM_GBS, 1),
    }
    if work_items:
        row[f"m{unit}_per_s"] = round(work_items / dt / 1e6, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--json", default="")
    ap.add_argument("--skip_step", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from deftet_tpu.ops.nearest import nearest_neighbor
    from deftet_tpu.ops.point_tet import points_in_tets
    from deftet_tpu.ops.tri_distance import point_to_mesh_squared_distance
    from deftet_tpu.render.raster import deftet_sparse_render

    rng = np.random.default_rng(0)
    small = args.small
    rows = []

    # --- occupancy point-in-tet (eval-path shape at res 50) -----------
    P, T = (512, 2048) if small else (8192, 625_000)
    centers = rng.uniform(-0.5, 0.5, (1, T, 1, 3))
    tets = jnp.asarray(
        (centers + rng.uniform(-0.02, 0.02, (1, T, 4, 3))).astype(
            np.float32
        )
    )
    queries = jnp.asarray(
        rng.uniform(-0.5, 0.5, (1, P, 3)).astype(np.float32)
    )
    rows.append(
        analyze(
            "occupancy point-in-tet",
            lambda t, q: points_in_tets(t, q),
            (tets, queries),
            work_items=P * T,
            unit="tets",
        )
    )

    # --- analytic point-to-mesh distance (surface loss shape) ---------
    B, Q, F = (2, 256, 512) if small else (4, 16_000, 40_000)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (B, Q, 3)).astype(np.float32))
    tris = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, F, 1, 3)).astype(np.float32)
        + rng.uniform(-0.03, 0.03, (B, F, 3, 3)).astype(np.float32)
    )
    mask = jnp.ones((B, F), jnp.float32)
    rows.append(
        analyze(
            "tri analytic distance",
            lambda p, t, m: point_to_mesh_squared_distance(p, t, m)[0],
            (pts, tris, mask),
            work_items=B * Q * F,
            unit="pairs",
        )
    )

    # --- nearest neighbor (surface loss shape) ------------------------
    B, Q, M = (2, 512, 256) if small else (4, 200_000, 5000)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (B, Q, 3)).astype(np.float32))
    refs = jnp.asarray(rng.uniform(-0.5, 0.5, (B, M, 3)).astype(np.float32))
    rows.append(
        analyze(
            "nearest neighbor",
            lambda a, b: nearest_neighbor(a, b),
            (q, refs),
            work_items=B * Q,
            unit="queries",
        )
    )

    # --- rasterizer, binned, campaign shape ---------------------------
    PIX, FF, K, CAND = (
        (256, 1024, 8, 256) if small else (6400, 100_000, 120, 16384)
    )
    pixf = rng.uniform(-1, 1, (1, PIX, 2)).astype(np.float32)
    ranges = np.concatenate(
        [np.full((1, PIX, 1), -1000.0), np.zeros((1, PIX, 1))], axis=-1
    ).astype(np.float32)
    tri = rng.uniform(-1, 1, (1, FF, 1, 2)) + rng.uniform(
        -0.02, 0.02, (1, FF, 3, 2)
    )
    fz = rng.uniform(-6.0, -2.0, (1, FF, 3)).astype(np.float32)
    ffeat = rng.uniform(0, 1, (1, FF, 3, 4)).astype(np.float32)
    a = [jnp.asarray(x) for x in (pixf, ranges, fz, tri.astype(np.float32),
                                  ffeat)]
    rows.append(
        analyze(
            "raster (binned)",
            lambda *xs: deftet_sparse_render(
                *xs, k=K, pixel_chunk=512, bin_cand=CAND
            )[0],
            a,
            work_items=PIX,
            unit="pix",
        )
    )
    rows.append(
        analyze(
            "raster (unbinned)",
            lambda *xs: deftet_sparse_render(*xs, k=K)[0],
            a,
            work_items=PIX,
            unit="pix",
        )
    )

    # --- full train step (bench config, via Engine) --------------------
    if not args.skip_step:
        import jax.random as jrandom

        from deftet_tpu.config import TrainConfig
        from deftet_tpu.data.pipeline import occupancy_grid
        from deftet_tpu.data.shapes import random_shape
        from deftet_tpu.train import Engine

        res = int(os.environ.get("BENCH_RES", "8" if small else "50"))
        batch = int(os.environ.get("BENCH_BATCH", "2" if small else "4"))
        config = TrainConfig(
            res=res, batch_size=batch, n_point=5000,
            num_sample_points=5000,
            occ_sample=10000 if not small else 512,
            per_face_samples=20 if not small else 4,
            logdir="/tmp/deftet_roofline", experiment_id="roofline",
        )
        if small:
            config.encoder_blocks = "8,1,8;16,1,4"
            config.gcn_hidden = "16,8"
            config.pos_mlp_hidden = "8"
            config.occ_mlp_hidden = "16,8"
            config.n_point = 256
            config.num_sample_points = 256
        engine = Engine(config)
        verts, faces = random_shape(0, level=2)
        b = config.batch_size
        occ = occupancy_grid(verts, faces, 32 if small else 64)
        batch_data = {
            "surface_points": rng.uniform(
                -0.4, 0.4, (b, config.num_sample_points, 3)
            ).astype(np.float32),
            "verts": np.tile(verts.astype(np.float32)[None], (b, 1, 1)),
            "faces": np.tile(faces.astype(np.int32)[None], (b, 1, 1)),
            "n_faces": np.full((b,), faces.shape[0], np.int32),
            "occ_grid": np.tile(occ[None], (b, 1, 1, 1)),
        }
        sharded = engine._prep_batch(batch_data)
        key = jrandom.PRNGKey(0)
        step_fn = engine._train_step

        # cost analysis off the AOT-lowered step (donation is irrelevant
        # for lowering)
        ca = (
            step_fn.lower(engine.state, sharded, key, engine.statics)
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))

        # timing: thread the donated state like the training loop does
        state, terms = step_fn(engine.state, sharded, key, engine.statics)
        sync(terms["total"])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            state, terms = step_fn(state, sharded, key, engine.statics)
            sync(terms["total"])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = ts[len(ts) // 2]
        rows.append(
            {
                "site": f"train step (res{res} bs{batch})",
                "time_ms": round(dt * 1e3, 2),
                "xla_gflops": round(flops / 1e9, 2),
                "xla_gbytes": round(bytes_acc / 1e9, 3),
                "achieved_tflops_s": round(flops / dt / 1e12, 3),
                "achieved_hbm_gbs": round(bytes_acc / dt / 1e9, 1),
                "pct_mxu_peak": round(
                    100 * flops / dt / PEAK_BF16_FLOPS, 2
                ),
                "pct_hbm_peak": round(
                    100 * bytes_acc / dt / 1e9 / PEAK_HBM_GBS, 1
                ),
            }
        )

    hdr = (
        f"{'site':26s} {'ms':>8s} {'TF/s':>7s} {'GB/s':>7s} "
        f"{'%MXU':>6s} {'%HBM':>6s}  work"
    )
    print(hdr)
    for r in rows:
        extra = [
            f"{k.replace('_per_s', '/s')}={v}"
            for k, v in r.items()
            if k.startswith("m") and k.endswith("_per_s")
        ]
        print(
            f"{r['site']:26s} {r['time_ms']:8.2f} "
            f"{r['achieved_tflops_s']:7.3f} {r['achieved_hbm_gbs']:7.1f} "
            f"{r['pct_mxu_peak']:6.2f} {r['pct_hbm_peak']:6.1f}  "
            + " ".join(extra)
        )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
