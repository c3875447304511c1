"""Pre-ingest round-4 campaign datasets on CPU while the TPU is busy.

Shard cache keys must match what the later chip-side train CLIs compute:
res-50 -> occ_grid_res=resolved 100, n_surface=n_sdf=5000 (config.py
defaults).  Ingestion is host/numpy work; forcing JAX_PLATFORMS=cpu keeps
it off the (contended) TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The axon TPU plugin ignores JAX_PLATFORMS; jax.config always wins
# (same forcing as scripts/step_breakdown.py / hlo_stats.py).
from deftet_tpu.utils.jaxsetup import setup_jax

setup_jax(platform=os.environ.get("DEFTET_PLATFORM", "cpu"))


def main() -> int:
    t0 = time.time()
    from scripts.hard_geom_campaign import make_augmented_meshes
    from deftet_tpu.data.pipeline import (
        build_dataset,
        build_dataset_from_meshes,
    )

    # --- hard-geometry: 3 bundled meshes x 8 rigid+scale augmentations
    hg = "/tmp/hard_geom"
    n = make_augmented_meshes(os.path.join(hg, "meshes"), 8, 0)
    print(f"[{time.time()-t0:.0f}s] wrote {n} augmented meshes", flush=True)
    paths = build_dataset_from_meshes(
        os.path.join(hg, "data"), os.path.join(hg, "meshes"),
        n_surface=5000, n_sdf=5000, seed=0,
        watertight_res=100, occ_grid_res=100, num_workers=8,
    )
    print(f"[{time.time()-t0:.0f}s] hard-geom: {len(paths)} shards", flush=True)

    # --- DISN: procedural shapes WITH rendered images + camera matrices
    paths = build_dataset(
        "/tmp/disn_data", n_shapes=32, n_surface=5000, n_sdf=5000,
        seed=0, occ_grid_res=100, num_workers=8, with_images=True,
    )
    print(f"[{time.time()-t0:.0f}s] disn: {len(paths)} shards", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
