"""Graph-size attribution for the train step (compile-time proxy).

Counts StableHLO ops in the lowered train step per loss-term variant on
CPU (lowering = tracing, no XLA compile) — a blown-up graph is the usual
driver of remote-TPU compile seconds.
"""
import os, sys, time, collections
os.environ["JAX_PLATFORMS"] = "cpu"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.random as jrandom
from deftet_tpu.config import TrainConfig
from deftet_tpu.data.pipeline import occupancy_grid
from deftet_tpu.data.shapes import random_shape
from deftet_tpu.train import Engine

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
    ("full_remat", {"remat": True}),
]
verts, faces = random_shape(0, level=2)
occ = occupancy_grid(verts, faces, 32)
rng = np.random.default_rng(0)
for name, over in variants:
    cfg = TrainConfig(res=10, batch_size=2, n_point=512,
                      num_sample_points=512, occ_sample=512,
                      per_face_samples=4, logdir="/tmp/hlo_stats",
                      experiment_id=f"h_{name}")
    for k, v in over.items():
        setattr(cfg, k, v)
    eng = Engine(cfg)
    b = cfg.batch_size
    batch = {
        "surface_points": rng.uniform(-0.4, 0.4, (b, cfg.num_sample_points, 3)).astype(np.float32),
        "verts": np.tile(verts.astype(np.float32)[None], (b, 1, 1)),
        "faces": np.tile(faces.astype(np.int32)[None], (b, 1, 1)),
        "n_faces": np.full((b,), faces.shape[0], np.int32),
        "occ_grid": np.tile(occ[None], (b, 1, 1, 1)),
    }
    sharded = eng._prep_batch(batch)
    t0 = time.perf_counter()
    lowered = eng._train_step.lower(eng.state, sharded, jrandom.PRNGKey(0), eng.statics)
    txt = lowered.as_text()
    t_lower = time.perf_counter() - t0
    ops = collections.Counter()
    for line in txt.splitlines():
        line = line.strip()
        if "=" in line and ("stablehlo." in line or "mhlo." in line):
            op = line.split("=", 1)[1].strip().split(" ", 1)[0].strip('"')
            ops[op] += 1
    total = sum(ops.values())
    top = ", ".join(f"{k.split('.')[-1]}:{v}" for k, v in ops.most_common(6))
    print(f"{name:16s} ops={total:7d} chars={len(txt):9d} lower_s={t_lower:5.1f}  {top}", flush=True)
