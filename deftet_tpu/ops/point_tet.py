"""Point-in-tetrahedron query: containing tet index per point, or -1.

TPU-native replacement for the reference's check_condition CUDA kernel
(layers/DefTet/check_condition_tetrahedron_base/check_condition_tet_for.cu:
106-185): per point, scan all tets with four same-side half-space tests and
return the first containing tet.  No gradient (the reference's autograd
backward returns None, utils.py:56-58).

Tiled as a scan over tet chunks; the running reduction keeps the *lowest*
containing tet index, matching the CUDA kernel's first-hit semantics.

Inputs are structure-of-arrays tet corner columns (12 per-sample (T,)
arrays) — a (B, T, 4, 3) corner tensor pads ~40x on TPU (tiny trailing
dims in the lane/sublane positions) and OOMs production grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .tiling import chunked_scan_reduce, pad_axis, query_tiled


@functools.partial(jax.jit, static_argnames=("chunk",))
def _points_in_tets_single(cols, n_valid, query_px3, chunk):
    """cols: tuple of 12 (T_pad,) arrays, corner-major (A.xyz, B.xyz, ...)."""
    big = jnp.int32(2**30)
    init = jnp.full(query_px3.shape[0], big, dtype=jnp.int32)
    qx = query_px3[:, 0:1]
    qy = query_px3[:, 1:2]
    qz = query_px3[:, 2:3]

    def body(carry, chunk_items, start):
        ax, ay, az, bx, by, bz, cx, cy, cz, dx, dy, dz = chunk_items

        def side_ok(p1, p2, p3, p4):
            # plane through p1,p2,p3; p4 and the query must lie on one side
            (x1, y1, z1), (x2, y2, z2), (x3, y3, z3), (x4, y4, z4) = (
                p1, p2, p3, p4
            )
            e1x, e1y, e1z = x2 - x1, y2 - y1, z2 - z1
            e2x, e2y, e2z = x3 - x1, y3 - y1, z3 - z1
            nx = e1y * e2z - e1z * e2y
            ny = e1z * e2x - e1x * e2z
            nz = e1x * e2y - e1y * e2x
            ref = (x4 - x1) * nx + (y4 - y1) * ny + (z4 - z1) * nz
            off = x1 * nx + y1 * ny + z1 * nz
            qd = qx * nx[None, :] + qy * ny[None, :] + qz * nz[None, :] - off
            return qd * ref[None, :] >= 0.0

        A = (ax, ay, az)
        B = (bx, by, bz)
        C = (cx, cy, cz)
        D = (dx, dy, dz)
        inside = (
            side_ok(A, B, C, D)
            & side_ok(A, B, D, C)
            & side_ok(A, C, D, B)
            & side_ok(B, C, D, A)
        )  # (P, chunk)
        ids = jax.lax.broadcasted_iota(jnp.int32, inside.shape, 1) + start
        ids = jnp.where(inside & (ids < n_valid), ids, big)
        return jnp.minimum(carry, jnp.min(ids, axis=1))

    found = chunked_scan_reduce(cols, init, body, chunk)
    return jnp.where(found == big, -1, found)


def points_in_tets_soa(
    soa,
    query_bxpx3: jnp.ndarray,
    chunk: int = 1024,
    query_chunk: int = 16384,
) -> jnp.ndarray:
    """(B, P) int32 first containing tet per point, or -1.

    `soa` is the corner/coordinate structure from
    losses.geometry.gather_tet_soa: soa[k][c] = (B, T).
    """
    q = jax.lax.stop_gradient(query_bxpx3).astype(jnp.float32)
    cols = tuple(
        jax.lax.stop_gradient(soa[k][c]).astype(jnp.float32)
        for k in range(4)
        for c in range(3)
    )
    n_valid = cols[0].shape[1]

    def single(args):
        qq = args[0]
        cs = args[1:]
        cs_pad = tuple(pad_axis(c, 0, chunk, 0.0)[0] for c in cs)
        return query_tiled(
            lambda qc: _points_in_tets_single(cs_pad, n_valid, qc, chunk),
            qq,
            query_chunk,
        )

    return jax.lax.map(single, (q,) + cols)


def points_in_tets(
    tet_pos_bxtx4x3: jnp.ndarray,
    query_bxpx3: jnp.ndarray,
    chunk: int = 1024,
    query_chunk: int = 16384,
) -> jnp.ndarray:
    """(B, P) int32 index of the first tet containing each point, or -1.

    Convenience wrapper over the SoA path (prefer points_in_tets_soa with
    gather_tet_soa output to avoid materializing the corner tensor).
    """
    t = jax.lax.stop_gradient(tet_pos_bxtx4x3).astype(jnp.float32)
    soa = [[t[:, :, k, c] for c in range(3)] for k in range(4)]
    return points_in_tets_soa(soa, query_bxpx3, chunk, query_chunk)


def paste_occupancy(
    tet_occ_bxt: jnp.ndarray, condition_bxp: jnp.ndarray
) -> jnp.ndarray:
    """Gather per-tet occupancy at each point's containing tet.

    Points outside every tet (condition == -1) read tet 0, matching
    deftet.py:132-136 (``paste_occ`` clamps negatives to 0).
    """
    cond = jnp.maximum(condition_bxp, 0).astype(jnp.int32)
    return jnp.take_along_axis(tet_occ_bxt, cond, axis=1)
