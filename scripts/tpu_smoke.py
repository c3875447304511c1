"""On-device (real TPU) smoke test of every pallas kernel dispatch path.

Run `python scripts/tpu_smoke.py` on a machine with a TPU attached
(takes ~2 min incl. compiles; exits non-zero on any parity failure).

CPU CI runs the kernels in interpret mode only; Mosaic lowering bugs
(dtype mismatches, cond-skip paths) only surface on hardware — a bf16
cotangent dtype mismatch once passed every interpret-mode test and
failed only on device.  Asserts parity with the XLA oracles for f32 and
bf16 payloads, incl. the padding-skip (n_valid/n_queries) branches.
"""
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
failures = []

def check(name, a, b, tol):
    ok = np.allclose(np.asarray(a), np.asarray(b), atol=tol, rtol=tol)
    print(("PASS" if ok else "FAIL"), name, flush=True)
    if not ok:
        failures.append(name)

# --- nearest neighbor: pallas vs XLA, incl. n_queries skip path --------
from deftet_tpu.ops.nearest import nearest_neighbor
from deftet_tpu.ops.nearest_pallas import nearest_neighbor_pallas

q = jnp.asarray(rng.uniform(-1, 1, (2, 700, 3)).astype(np.float32))
r = jnp.asarray(rng.uniform(-1, 1, (2, 500, 3)).astype(np.float32))
nv = jnp.asarray([500, 300], jnp.int32)
nq = jnp.asarray([700, 640], jnp.int32)
d_p, i_p = nearest_neighbor_pallas(q, r, n_valid=nv, n_queries=nq)
d_x, i_x = nearest_neighbor(q, r, n_valid=nv)
check("nn idx (skip path)", i_p[0], i_x[0], 0)
check("nn idx b1 valid prefix", i_p[1, :640], i_x[1, :640], 0)
check("nn dist", d_p[0], d_x[0], 1e-5)

# --- tri distance: pallas vs XLA, f32 + bf16 cotangent -----------------
from deftet_tpu.ops.tri_distance import point_to_mesh_squared_distance
from deftet_tpu.ops.tri_distance_pallas import (
    point_to_mesh_squared_distance_pallas,
)

pts = jnp.asarray(rng.uniform(-1, 1, (2, 256, 3)).astype(np.float32))
tris = jnp.asarray(rng.uniform(-1, 1, (2, 200, 3, 3)).astype(np.float32))
mask = jnp.ones((2, 200), jnp.float32)
mask = mask.at[1, 120:].set(0.0)
d2p, _ = point_to_mesh_squared_distance_pallas(pts, tris, mask)
d2x, _ = point_to_mesh_squared_distance(pts, tris, mask)
check("tri d2", d2p, d2x, 1e-4)
# gradient through the pallas path in bf16 compute
def loss_p(t):
    d2, _ = point_to_mesh_squared_distance_pallas(pts, t, mask)
    return jnp.sum(jnp.sqrt(d2 + 1e-10))
def loss_x(t):
    d2, _ = point_to_mesh_squared_distance(pts, t, mask)
    return jnp.sum(jnp.sqrt(d2 + 1e-10))
gp = jax.grad(loss_p)(tris)
gx = jax.grad(loss_x)(tris)
check("tri grad", gp, gx, 1e-2)

# --- lattice stencil: pallas vs conv fallback, f32 + bf16 --------------
from deftet_tpu.ops.stencil_pallas import lattice_neighbor_mean, stencil_fits_vmem
from deftet_tpu.train.statics import build_grid_statics, lattice_offsets
from deftet_tpu.tetgrid import build_tet_grid

grid = build_tet_grid(12)
st = build_grid_statics(12, grid=grid)
offs = tuple(tuple(o) for o in lattice_offsets(grid))
n = 13
inv_deg = 1.0 / np.maximum(np.asarray(st.vert_degree), 1).astype(np.float32)
for dtype in (jnp.float32, jnp.bfloat16):
    x = jnp.asarray(
        rng.standard_normal((2, n**3, 128)).astype(np.float32)
    ).astype(dtype)
    got = lattice_neighbor_mean(x, jnp.asarray(inv_deg), n, offs)
    # conv-free numpy oracle
    xg = np.asarray(x, np.float32).reshape(2, n, n, n, 128)
    xp = np.pad(xg, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros_like(xg)
    for dx, dy, dz in offs:
        acc += xp[:, 1+dx:1+dx+n, 1+dy:1+dy+n, 1+dz:1+dz+n]
    want = acc.reshape(2, n**3, 128) * inv_deg[None, :, None]
    check(f"stencil {dtype.__name__}", np.asarray(got, np.float32), want,
          5e-2 if dtype == jnp.bfloat16 else 1e-4)
    # backward
    g = jax.grad(lambda x: jnp.sum(
        lattice_neighbor_mean(x, jnp.asarray(inv_deg), n, offs)
        .astype(jnp.float32)))(x)
    assert np.isfinite(np.asarray(g, np.float32)).all()
    print("PASS stencil grad finite", dtype.__name__, flush=True)

print("FAILURES:", failures)
assert not failures
print("ALL TPU PALLAS SMOKE TESTS PASSED")
