"""Pallas TPU kernel: fused point-to-triangle-soup argmin distance.

Fused equivalent of the scan in ops.tri_distance._argmin_face_single (the
C2 tet_analytic_distance forward): for each query point, the squared
distance to every (masked) triangle and the argmin face — with the
(P, F) distance matrix living entirely in VMEM tiles.

Layout mirrors ops.nearest_pallas: queries ship transposed (3, P) with
the big axis in lanes; triangles ship as nine per-face coordinate ROWS
(9, F_pad) (ax, ay, az, bx, ..., cz) so a face chunk is nine (1, fc)
lane-major row reads — no transposes anywhere.  The distance math is the
same region-based closest-point-on-triangle used by the XLA twin
(tri_distance.point_triangle_squared_distance), evaluated on
(TILE_P, f_chunk) lane-major blocks.

Forward only (argmin int + stop-grad distance); the differentiable
recompute on the argmin face stays in ops.tri_distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e30


def _tri_kernel(q_ref, tri_ref, mask_ref, nact_ref, d_ref, i_ref, *,
                f_chunk: int):
    """q_ref (TILE_P, 3) row-major (column reads give (TILE_P, 1) with no
    transpose); tri_ref (9, F_pad); mask_ref (1, F_pad) [0/1];
    nact_ref (1, 1) SMEM — 1 + index of the last unmasked face: chunks
    beyond it are all padding and their whole distance block is skipped
    (compacted boundary subsets put real faces first, so typically only
    ~n_boundary of the max_boundary_faces budget is scanned);
    outputs (P_pad, 1) with (TILE_P, 1) grid blocks."""
    tile_p = q_ref.shape[0]
    f_pad = tri_ref.shape[1]
    n_active = nact_ref[0, 0]

    px = q_ref[:, 0:1]  # (TILE_P, 1)
    py = q_ref[:, 1:2]
    pz = q_ref[:, 2:3]

    def body(c, carry):
        start = c * f_chunk
        return jax.lax.cond(
            start < n_active, _chunk, lambda cc, _s: cc, carry, start
        )

    def _chunk(carry, start):
        best_d, best_i = carry  # (TILE_P, 1) each

        def tri_row(k):
            return tri_ref[k:k + 1, pl.ds(start, f_chunk)]  # (1, f_chunk)

        ax, ay, az = tri_row(0), tri_row(1), tri_row(2)
        bx, by, bz = tri_row(3), tri_row(4), tri_row(5)
        cx, cy, cz = tri_row(6), tri_row(7), tri_row(8)
        m = mask_ref[0:1, pl.ds(start, f_chunk)]

        # All (TILE_P, f_chunk) via (TILE_P,1) x (1,f_chunk) broadcasts.
        abx, aby, abz = bx - ax, by - ay, bz - az
        acx, acy, acz = cx - ax, cy - ay, cz - az
        apx, apy, apz = px - ax, py - ay, pz - az
        d1 = abx * apx + aby * apy + abz * apz
        d2 = acx * apx + acy * apy + acz * apz
        bpx, bpy, bpz = px - bx, py - by, pz - bz
        d3 = abx * bpx + aby * bpy + abz * bpz
        d4 = acx * bpx + acy * bpy + acz * bpz
        cpx, cpy, cpz = px - cx, py - cy, pz - cz
        d5 = abx * cpx + aby * cpy + abz * cpz
        d6 = acx * cpx + acy * cpy + acz * cpz
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        eps = 1e-20

        def safe_div(x, y):
            return x / jnp.where(jnp.abs(y) < eps, 1.0, y)

        v_ab = safe_div(d1, d1 - d3)
        w_ac = safe_div(d2, d2 - d6)
        w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
        denom = va + vb + vc
        v_in = safe_div(vb, denom)
        w_in = safe_div(vc, denom)

        # closest point, region by region (same order as the XLA twin)
        qx = ax + v_in * abx + w_in * acx
        qy = ay + v_in * aby + w_in * acy
        qz = az + v_in * abz + w_in * acz

        r_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
        qx = jnp.where(r_bc, bx + w_bc * (cx - bx), qx)
        qy = jnp.where(r_bc, by + w_bc * (cy - by), qy)
        qz = jnp.where(r_bc, bz + w_bc * (cz - bz), qz)
        r_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
        qx = jnp.where(r_ac, ax + w_ac * acx, qx)
        qy = jnp.where(r_ac, ay + w_ac * acy, qy)
        qz = jnp.where(r_ac, az + w_ac * acz, qz)
        r_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        qx = jnp.where(r_ab, ax + v_ab * abx, qx)
        qy = jnp.where(r_ab, ay + v_ab * aby, qy)
        qz = jnp.where(r_ab, az + v_ab * abz, qz)
        r_c = (d6 >= 0) & (d5 <= d6)
        qx = jnp.where(r_c, cx, qx)
        qy = jnp.where(r_c, cy, qy)
        qz = jnp.where(r_c, cz, qz)
        r_b = (d3 >= 0) & (d4 <= d3)
        qx = jnp.where(r_b, bx, qx)
        qy = jnp.where(r_b, by, qy)
        qz = jnp.where(r_b, bz, qz)
        r_a = (d1 <= 0) & (d2 <= 0)
        qx = jnp.where(r_a, ax, qx)
        qy = jnp.where(r_a, ay, qy)
        qz = jnp.where(r_a, az, qz)

        dx, dy, dz = px - qx, py - qy, pz - qz
        d = dx * dx + dy * dy + dz * dz  # (TILE_P, f_chunk)
        ids = (
            jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + start
        )
        d = jnp.where(m > 0, d, _BIG)
        loc_d = jnp.min(d, axis=1, keepdims=True)      # (TILE_P, 1)
        hit = d == loc_d
        loc_i = jnp.min(
            jnp.where(hit, ids, jnp.int32(2**30)), axis=1, keepdims=True
        ).astype(jnp.int32)
        take = loc_d < best_d
        return (
            jnp.where(take, loc_d, best_d),
            jnp.where(take, loc_i, best_i),
        )

    init = (
        jnp.full((tile_p, 1), _BIG, dtype=jnp.float32),
        jnp.zeros((tile_p, 1), dtype=jnp.int32),
    )
    best_d, best_i = jax.lax.fori_loop(0, f_pad // f_chunk, body, init)
    d_ref[:, :] = best_d
    i_ref[:, :] = best_i


def _pad_to(x, axis, multiple, value=0.0):
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("tile_p", "f_chunk", "interpret")
)
def tri_argmin_pallas_single(
    points_px3, tri_fx3x3, face_mask_f,
    tile_p: int = 512, f_chunk: int = 512, interpret: bool = False,
):
    """(argmin_face (P,) int32) for one sample."""
    p = points_px3.shape[0]
    qt = _pad_to(points_px3.astype(jnp.float32), 0, tile_p)  # (P_pad, 3)
    # nine coordinate rows (9, F)
    tri = tri_fx3x3.astype(jnp.float32)
    rows = tri.reshape(tri.shape[0], 9).T  # (9, F) ax ay az bx ... cz
    rows = _pad_to(rows, 1, f_chunk)
    mask = _pad_to(
        face_mask_f.astype(jnp.float32)[None], 1, f_chunk
    )  # (1, F_pad)
    # 1 + last unmasked index (0 if none): padding chunks are skipped
    f = face_mask_f.shape[0]
    any_on = jnp.any(face_mask_f > 0)
    last = f - jnp.argmax((face_mask_f > 0)[::-1])
    n_active = jnp.where(any_on, last, 0).astype(jnp.int32).reshape(1, 1)
    n_tiles = qt.shape[0] // tile_p

    d2, idx = pl.pallas_call(
        functools.partial(_tri_kernel, f_chunk=f_chunk),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_p, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, rows.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_p, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.int32),
        ],
        interpret=interpret,
    )(qt, rows, mask, n_active)
    return idx[:p, 0]


def tri_argmin_pallas(
    points_bxpx3, tri_bxfx3x3, face_mask_bxf,
    tile_p: int = 512, f_chunk: int = 512, interpret: bool = False,
):
    """Batched argmin-face (sequential over batch, see nearest_pallas)."""
    return jax.lax.map(
        lambda args: tri_argmin_pallas_single(
            *args, tile_p=tile_p, f_chunk=f_chunk, interpret=interpret
        ),
        (
            jax.lax.stop_gradient(points_bxpx3),
            jax.lax.stop_gradient(tri_bxfx3x3),
            face_mask_bxf,
        ),
    )
