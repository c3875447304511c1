"""Chunked reduction helper for O(P·T) brute-force geometry queries.

The reference implements these queries as one-CUDA-thread-per-point loops
over all tets/faces (e.g. check_condition_tet_for.cu, tet_analytic_distance
_for.cu, nearest_neighbor_cuda.cu).  On TPU the same math is expressed as a
scan over fixed-size item chunks with a running reduction — static shapes,
VMEM-sized tiles, and the inner elementwise work fused by XLA.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def pad_axis(x: jnp.ndarray, axis: int, multiple: int, value):
    """Pad `axis` of x up to the next multiple; returns (padded, n_valid)."""
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value), n


def chunked_scan_reduce(
    items: Tuple[jnp.ndarray, ...],
    init: Tuple[jnp.ndarray, ...],
    body: Callable,
    chunk: int,
    axis: int = 0,
):
    """Scan `body` over fixed-size chunks of every array in `items`.

    Args:
      items: arrays sharing the scanned axis 0 length (already padded to a
        multiple of `chunk`).
      init: carry pytree (e.g. running min + argmin).
      body: (carry, chunk_items, chunk_start) -> carry.
      chunk: chunk size along axis 0 of each item.

    Returns the final carry.
    """
    n = items[0].shape[axis]
    assert n % chunk == 0, (n, chunk)
    n_chunks = n // chunk
    stacked = tuple(
        jnp.moveaxis(
            x.reshape(x.shape[:axis] + (n_chunks, chunk) + x.shape[axis + 1 :]),
            axis,
            0,
        )
        for x in items
    )
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def scan_body(carry, xs):
        chunk_items, start = xs
        return body(carry, chunk_items, start), None

    carry, _ = jax.lax.scan(scan_body, init, (stacked, starts))
    return carry


def query_tiled(fn: Callable, query_px3: jnp.ndarray, query_chunk: int):
    """Apply `fn` over fixed-size tiles of the query axis.

    The brute-force kernels hold a (P, item_chunk) tile live per scan step;
    with P in the hundreds of thousands (all sampled surface points, all
    tet centers) that alone exceeds HBM.  Tiling the query axis bounds the
    live tile to (query_chunk, item_chunk) — queries are independent, so a
    sequential `lax.map` costs nothing but loop overhead.

    Args:
      fn: (q_chunk, D) -> pytree of arrays with leading dim q_chunk.
      query_px3: (P, D) query rows (D is usually 3; any width works).
      query_chunk: tile size (also the minimum P for which tiling engages).

    Returns fn's output pytree with leading dim P.
    """
    p = query_px3.shape[0]
    if p <= query_chunk:
        return fn(query_px3)
    q_pad, _ = pad_axis(query_px3, 0, query_chunk, 0.0)
    n_tiles = q_pad.shape[0] // query_chunk
    tiles = q_pad.reshape((n_tiles, query_chunk) + query_px3.shape[1:])
    out = jax.lax.map(fn, tiles)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_tiles * query_chunk,) + x.shape[2:])[:p], out
    )
