"""Pallas TPU kernel: fused nearest-neighbour (distance + argmin).

The XLA formulation of brute-force NN materializes the (P, M) distance
matrix in HBM several times (matmul out, +|q|^2+|r|^2, argmin) — measured
~0.4s for P=800k, M=5k, B=4 (bandwidth-bound).  This kernel keeps the
whole reference cloud and one query tile resident in VMEM and emits only
(min distance, argmin) per query: HBM traffic drops from O(P*M) to
O(P + M).

Layouts are chosen for the 8x128 vector registers:
  * queries and refs ship TRANSPOSED as (3, P) / (3, M) — the big axis
    rides the 128-lane dimension, the xyz axis pads 3->8 sublanes only.
  * the per-tile distance matrix is built as (M_chunk, TILE_P): M in
    sublanes, queries in lanes; the argmin reduces across sublanes.

Forward only (int argmin + stop-grad distances) — differentiable
consumers recompute the distance through a gather exactly like the XLA
path (ops.nearest.sided_squared_distance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e30


def _nn_kernel(q_ref, r_ref, nvalid_ref, nq_ref, d_ref, i_ref, *,
               m_chunk: int):
    """One query tile vs the full reference cloud.

    q_ref: (3, TILE_P) VMEM (queries transposed — big axis in lanes);
    r_ref: (M_pad, 3) VMEM (refs row-major — column reads give
    (m_chunk, 1) without a lane/sublane transpose);
    nvalid_ref: (1, 1) SMEM — count of real reference points;
    nq_ref: (1, 1) SMEM — count of real QUERIES: tiles that lie entirely
    in the padded/masked tail (e.g. the unused part of a compacted
    boundary-face sample budget) skip the whole reference scan;
    d_ref/i_ref: (n_tiles, TILE_P) FULL-array VMEM outputs — the kernel
    writes row program_id (full blocks sidestep Mosaic's (8, 128)
    block-tiling constraint, which size-1 blocked dims violate).
    """
    tile_p = q_ref.shape[1]
    m_pad = r_ref.shape[0]
    n_valid = nvalid_ref[0, 0]
    n_queries = nq_ref[0, 0]
    row = pl.program_id(0)

    qx = q_ref[0:1, :]  # (1, TILE_P)
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]

    def body(c, carry):
        best_d, best_i = carry  # (1, TILE_P) each
        start = c * m_chunk
        rx = r_ref[pl.ds(start, m_chunk), 0:1]  # (m_chunk, 1)
        ry = r_ref[pl.ds(start, m_chunk), 1:2]
        rz = r_ref[pl.ds(start, m_chunk), 2:3]
        # (m_chunk, TILE_P): refs in sublanes, queries in lanes
        dx = rx - qx
        dy = ry - qy
        dz = rz - qz
        d = dx * dx + dy * dy + dz * dz
        ids = (
            jax.lax.broadcasted_iota(jnp.int32, (m_chunk, tile_p), 0)
            + start
        )
        d = jnp.where(ids < n_valid, d, _BIG)
        loc_d = jnp.min(d, axis=0, keepdims=True)          # (1, TILE_P)
        # first-hit argmin without a 1-D intermediate
        hit = d == loc_d
        loc_i = jnp.min(
            jnp.where(hit, ids, jnp.int32(2**30)), axis=0, keepdims=True
        ).astype(jnp.int32)
        take = loc_d < best_d
        return (
            jnp.where(take, loc_d, best_d),
            jnp.where(take, loc_i, best_i),
        )

    init = (
        jnp.full((1, tile_p), _BIG, dtype=jnp.float32),
        jnp.zeros((1, tile_p), dtype=jnp.int32),
    )

    @pl.when(row * tile_p < n_queries)
    def _run():
        best_d, best_i = jax.lax.fori_loop(0, m_pad // m_chunk, body, init)
        d_ref[pl.ds(row, 1), :] = jnp.maximum(best_d, 0.0)
        i_ref[pl.ds(row, 1), :] = best_i

    @pl.when(row * tile_p >= n_queries)
    def _skip():
        d_ref[pl.ds(row, 1), :] = jnp.zeros((1, tile_p), jnp.float32)
        i_ref[pl.ds(row, 1), :] = jnp.zeros((1, tile_p), jnp.int32)


def _pad_to(x, axis, multiple):
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads)


@functools.partial(
    jax.jit, static_argnames=("tile_p", "m_chunk", "interpret")
)
def nn_pallas_single(
    query_px3: jnp.ndarray,
    refs_mx3: jnp.ndarray,
    n_valid,
    n_queries=None,
    tile_p: int = 512,
    m_chunk: int = 2048,
    interpret: bool = False,
):
    """(d2 (P,), idx (P,)) nearest reference per query (one sample).

    ``n_queries``: count of real queries (rest is padding whose outputs
    are never consumed) — fully-padded tiles skip the reference scan.
    """
    p = query_px3.shape[0]
    qt = _pad_to(
        jnp.swapaxes(query_px3.astype(jnp.float32), 0, 1), 1, tile_p
    )  # (3, P_pad)
    rt = _pad_to(refs_mx3.astype(jnp.float32), 0, m_chunk)  # (M_pad, 3)
    p_pad = qt.shape[1]
    n_tiles = p_pad // tile_p
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
    if n_queries is None:
        n_queries = p
    nq = jnp.asarray(n_queries, jnp.int32).reshape(1, 1)

    d2, idx = pl.pallas_call(
        functools.partial(_nn_kernel, m_chunk=m_chunk),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (3, tile_p), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rt.shape[0], 3), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_tiles, tile_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, tile_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_p), jnp.int32),
        ],
        interpret=interpret,
    )(qt, rt, nv, nq)
    return d2.reshape(-1)[:p], idx.reshape(-1)[:p]


# Max reference points resident in VMEM at once.  The (M, 3) refs block
# is (8, 128)-tile padded, so its VMEM footprint is M*128*4 bytes — 8MB
# at 16384 — against the 16MB scoped-vmem limit (queries + output blocks
# take the rest).  Larger clouds scan VMEM-sized chunks below.
_M_RESIDENT_CAP = 16384


def _nn_single_scan_refs(
    query_px3, refs_mx3, n_valid, n_queries, tile_p, m_chunk, interpret
):
    """nn_pallas_single over reference-cloud chunks, mins merged.

    The eval harness's 100k-point chamfer protocol passes M ~ 100k,
    whose (M, 3) lane-padded VMEM block (M*128*4 bytes) blows the 16MB
    scoped-vmem limit — observed as a Mosaic stack OOM at compile time.
    Queries are re-read per chunk ((3, P) is ~1MB; negligible)."""
    m = refs_mx3.shape[0]
    n_ch = -(-m // _M_RESIDENT_CAP)
    refs_pad = _pad_to(refs_mx3, 0, _M_RESIDENT_CAP)
    chunks = refs_pad.reshape(n_ch, _M_RESIDENT_CAP, 3)
    starts = jnp.arange(n_ch, dtype=jnp.int32) * _M_RESIDENT_CAP

    def body(carry, inp):
        best_d, best_i = carry
        ref_chunk, start = inp
        nv = jnp.clip(
            jnp.asarray(n_valid, jnp.int32) - start, 0, _M_RESIDENT_CAP
        )
        d, i = nn_pallas_single(
            query_px3, ref_chunk, nv, n_queries,
            tile_p=tile_p, m_chunk=m_chunk, interpret=interpret,
        )
        # fully-masked chunks return _BIG distances: never taken
        i = i + start
        take = d < best_d
        return (
            jnp.where(take, d, best_d),
            jnp.where(take, i, best_i),
        ), None

    p = query_px3.shape[0]
    init = (
        jnp.full((p,), _BIG, jnp.float32),
        jnp.zeros((p,), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(body, init, (chunks, starts))
    return best_d, best_i


def nearest_neighbor_pallas(
    query_bxpx3: jnp.ndarray,
    points_bxmx3: jnp.ndarray,
    n_valid=None,
    n_queries=None,
    tile_p: int = 512,
    m_chunk: int = 2048,
    interpret: bool = False,
):
    """Batched fused NN; same contract as ops.nearest.nearest_neighbor.
    ``n_queries`` (B,) optionally marks the count of real queries per
    sample (outputs past it are unconsumed padding)."""
    q = jax.lax.stop_gradient(query_bxpx3)
    r = jax.lax.stop_gradient(points_bxmx3)
    if n_valid is None:
        n_valid = jnp.full(q.shape[0], r.shape[1], dtype=jnp.int32)
    if n_queries is None:
        n_queries = jnp.full(q.shape[0], q.shape[1], dtype=jnp.int32)
    if r.shape[1] > _M_RESIDENT_CAP:
        single = lambda args: _nn_single_scan_refs(  # noqa: E731
            *args, tile_p=tile_p, m_chunk=m_chunk, interpret=interpret
        )
    else:
        single = lambda args: nn_pallas_single(  # noqa: E731
            *args, tile_p=tile_p, m_chunk=m_chunk, interpret=interpret
        )
    # lax.map (sequential over batch) rather than vmap: Mosaic requires
    # the last two block dims to be (8, 128)-tileable, which a vmapped
    # size-1 batch block dimension violates for 1/2-D outputs.
    return jax.lax.map(single, (q, r, n_valid, n_queries))
