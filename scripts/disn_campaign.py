"""DISN image-branch training campaign: train to a measured result.

The reference treats DISN as a first-class encoder option
(layers/pc_model.py:73-111, config.py:465): images + per-view camera
matrices replace the surface-point encoders; everything downstream
(deformation + occupancy heads, losses, eval) is shared.  This campaign
trains `--use_disn` on the procedural dataset rendered WITH images
(data/pipeline.make_example with_image=True) and reports the 100k-point
eval protocol — the first measured IoU/Chamfer for the image branch.

Usage:
  python scripts/disn_campaign.py --outdir /tmp/disn --res 50 --epochs 80
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/disn")
    ap.add_argument("--data_root", default="/tmp/disn_data")
    ap.add_argument("--res", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--n_shapes", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_points", type=int, default=100_000)
    ap.add_argument("--disn_width", type=float, default=0.5,
                    help="VGG width multiplier (1.0 = full VGG-16-D)")
    ap.add_argument("--disn_encoding_dim", type=int, default=512)
    ap.add_argument("--extra", default="",
                    help="extra train CLI flags, space separated")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    logdir = os.path.join(args.outdir, "exp")

    t0 = time.time()
    train_cmd = [
        sys.executable, "-m", "deftet_tpu.cli", "train",
        "--use_disn",
        "--disn_width", str(args.disn_width),
        "--disn_encoding_dim", str(args.disn_encoding_dim),
        "--res", str(args.res), "--batch_size", str(args.batch_size),
        "--epochs", str(args.epochs), "--n_shapes", str(args.n_shapes),
        "--dataset_root", args.data_root,
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
