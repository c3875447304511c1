"""Hard-geometry training campaign: real ingested meshes, not blobs.

The round-2 quality numbers (F@0.01 0.9969 / Chamfer 0.0032) were
measured on smooth procedural families; the reference's eval regime is
13 ShapeNet categories with thin structures (eval.py:310-349).  This
campaign trains on the repo's bundled hard meshes (gear teeth, trefoil
knot, twisted box — tests/assets/meshes) expanded by rigid
augmentations (random rotations + anisotropic scales), plus the
thinnest procedural family (torus), then reports the 100k-point eval
protocol on held-out augmentations.

Usage:
  python scripts/hard_geom_campaign.py --outdir /tmp/hard_geom \
      --res 50 --epochs 30 [--budget_s 1800]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def random_rotation(rng) -> np.ndarray:
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def make_augmented_meshes(out_dir: str, n_aug: int, seed: int) -> int:
    """Write n_aug rigid+scale augmentations of each bundled mesh, one
    category dir per source mesh (the ShapeNet class-dir convention the
    ingestion pipeline expects)."""
    from deftet_tpu.utils.objio import load_obj, save_obj
    from deftet_tpu.data.shapes import normalize_mesh

    src_dir = os.path.join(REPO, "tests", "assets", "meshes")
    rng = np.random.default_rng(seed)
    n = 0
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".obj"):
            continue
        verts, faces = load_obj(os.path.join(src_dir, fname))
        cat = os.path.splitext(fname)[0]
        cat_dir = os.path.join(out_dir, cat)
        os.makedirs(cat_dir, exist_ok=True)
        for a in range(n_aug):
            r = random_rotation(rng)
            scale = rng.uniform(0.7, 1.0, size=3)
            v = normalize_mesh((verts @ r.T) * scale)
            save_obj(os.path.join(cat_dir, f"{cat}_{a:02d}.obj"), v, faces)
            n += 1
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/hard_geom")
    ap.add_argument("--res", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_aug", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_points", type=int, default=100_000)
    ap.add_argument("--extra", default="",
                    help="extra train CLI flags, space separated")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    mesh_dir = os.path.join(args.outdir, "meshes")
    data_root = os.path.join(args.outdir, "data")
    logdir = os.path.join(args.outdir, "exp")

    t0 = time.time()
    n = make_augmented_meshes(mesh_dir, args.n_aug, args.seed)
    print(f"[{time.time()-t0:.0f}s] wrote {n} augmented meshes", flush=True)

    train_cmd = [
        sys.executable, "-m", "deftet_tpu.cli", "train",
        "--res", str(args.res), "--batch_size", str(args.batch_size),
        "--epochs", str(args.epochs),
        "--mesh_dir", mesh_dir, "--dataset_root", data_root,
        "--logdir", logdir, "--seed", str(args.seed),
    ] + ([a for a in args.extra.split() if a])
    print("+", " ".join(train_cmd), flush=True)
    rc = subprocess.call(train_cmd)
    if rc != 0:
        return rc

    # newest experiment *directory* by mtime (lexicographic listdir can
    # pick a stale run or stray file when --outdir is reused)
    exps = [
        p for e in os.listdir(logdir)
        if os.path.isdir(p := os.path.join(logdir, e))
    ]
    exp = max(exps, key=os.path.getmtime)
    eval_cmd = [
        sys.executable, "-m", "deftet_tpu.cli", "eval",
        "--experiment_path", exp,
        "--eval_points", str(args.eval_points),
    ]
    print("+", " ".join(eval_cmd), flush=True)
    out = subprocess.run(eval_cmd, capture_output=True, text=True)
    print(out.stdout[-4000:])
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        return out.returncode
    with open(os.path.join(args.outdir, "eval_stdout.txt"), "w") as f:
        f.write(out.stdout)
    print(f"[{time.time()-t0:.0f}s] done; experiment: {exp}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
