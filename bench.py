"""Headline benchmark: full training-step throughput on real hardware.

Runs the paper-shaped recipe scaled to one chip — res-50 tet grid
(T = 750k tets), batch 4, two PVCNN encoders, GCN position decoder, full
loss set (occupancy BCE + volume/AMIPS/edge/Laplacian/delta + boundary
chamfer/analytic/normal surface terms) — and reports steps/sec.

The reference publishes no throughput numbers (BASELINE.md): baseline is
self-measured.  ``vs_baseline`` is steps/sec relative to the most recent
prior round's recorded number for the same metric (BENCH_r{N}.json files
written by the driver at each round end), so regressions are visible;
first round for a metric falls back to a nominal 1.0 step/s.

Env overrides: BENCH_RES, BENCH_BATCH, BENCH_STEPS, BENCH_SMALL=1 (tiny
config for CPU smoke runs).
"""

import json
import os
import time

import numpy as np


def prior_round_baseline(metric: str) -> float | None:
    """Latest recorded value for `metric` from BENCH_r*.json in repo root."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best_n, best_val = -1, None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed") or {}
            if parsed.get("metric") == metric and int(m.group(1)) > best_n:
                best_n, best_val = int(m.group(1)), float(parsed["value"])
        except (OSError, ValueError, KeyError):
            continue
    return best_val


def main():
    # Honor DEFTET_PLATFORM=cpu|tpu like the CLIs do — the axon TPU
    # plugin ignores the JAX_PLATFORMS env var, so a CPU smoke run
    # (BENCH_SMALL) silently lands on the TPU without this, colliding
    # with any live TPU process (one-process rule).
    plat = os.environ.get("DEFTET_PLATFORM")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.random as jrandom

    from deftet_tpu.config import TrainConfig
    from deftet_tpu.data.shapes import random_shape
    from deftet_tpu.train import Engine

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    res = int(os.environ.get("BENCH_RES", "8" if small else "50"))
    batch = int(os.environ.get("BENCH_BATCH", "2" if small else "4"))
    steps = int(os.environ.get("BENCH_STEPS", "3" if small else "10"))

    config = TrainConfig(
        res=res,
        batch_size=batch,
        n_point=5000,
        num_sample_points=5000,
        occ_sample=10000 if not small else 512,
        per_face_samples=20 if not small else 4,
        logdir="/tmp/deftet_bench",
        experiment_id="bench",
    )
    # BENCH_SET="lambda_surf=0,lambda_normal=0" — ad-hoc config overrides
    # (used to bisect compile/runtime cost by loss term).
    for kv in os.environ.get("BENCH_SET", "").split(","):
        if "=" in kv:
            key, val = kv.split("=", 1)
            cur = getattr(config, key)
            setattr(config, key, type(cur)(val))

    if small:
        config.encoder_blocks = "8,1,8;16,1,4"
        config.gcn_hidden = "16,8"
        config.pos_mlp_hidden = "8"
        config.occ_mlp_hidden = "16,8"
        config.n_point = 256
        config.num_sample_points = 256

    import sys

    def note(msg):
        print(f"# {msg} [t={time.perf_counter() - t_start:.1f}s]",
              file=sys.stderr, flush=True)

    t_start = time.perf_counter()
    note(f"building engine: res={res} batch={batch}")
    engine = Engine(config)
    note("engine ready")

    from deftet_tpu.data.pipeline import occupancy_grid

    rng = np.random.default_rng(0)
    verts, faces = random_shape(0, level=2)
    b = config.batch_size
    note("building occupancy grid")
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

    # Warmup / compile.  NOTE: synchronize via a host fetch (float()), not
    # block_until_ready — some remote TPU backends return from
    # block_until_ready before execution completes, which silently turns
    # the benchmark into a dispatch-rate measurement.  The remote compile
    # service occasionally drops the connection mid-compile; retry the
    # warmup a few times rather than losing the round's benchmark.
    note("compiling train step")
    last_err = None
    for attempt in range(3):
        try:
            state, terms = engine._train_step(
                engine.state, sharded, jrandom.PRNGKey(0), engine.statics
            )
            float(terms["total"])
            last_err = None
            break
        except Exception as e:  # noqa: BLE001 — RPC-layer errors vary
            last_err = e
            if attempt < 2:
                note(
                    f"warmup attempt {attempt + 1} failed: {e}; "
                    "retrying in 30s"
                )
                time.sleep(30)
    if last_err is not None:
        raise last_err
    engine.state = state
    note("compiled; timing")

    t0 = time.perf_counter()
    for i in range(steps):
        state, terms = engine._train_step(
            engine.state, sharded, jrandom.PRNGKey(i + 1), engine.statics
        )
        engine.state = state
    final = float(terms["total"])  # forces the whole dependent chain
    assert np.isfinite(final)
    dt = time.perf_counter() - t0

    steps_per_sec = steps / dt
    metric = f"train_step_res{res}_bs{batch}"
    baseline = prior_round_baseline(metric) or 1.0
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(steps_per_sec, 4),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
