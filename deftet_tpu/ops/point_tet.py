"""Point-in-tetrahedron query: containing tet index per point, or -1.

TPU-native replacement for the reference's check_condition CUDA kernel
(layers/DefTet/check_condition_tetrahedron_base/check_condition_tet_for.cu:
106-185): per point, scan all tets with four same-side half-space tests and
return the first containing tet.  No gradient (the reference's autograd
backward returns None, utils.py:56-58).

Tiled as a scan over tet chunks; the running reduction keeps the *lowest*
containing tet index, matching the CUDA kernel's first-hit semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .tiling import chunked_scan_reduce, pad_axis, query_tiled


@functools.partial(jax.jit, static_argnames=("chunk",))
def _points_in_tets_single(tet_tx4x3, query_px3, chunk):
    tet_pad, n_valid = pad_axis(tet_tx4x3, 0, chunk, 0.0)
    big = jnp.int32(2**30)
    init = jnp.full(query_px3.shape[0], big, dtype=jnp.int32)

    def body(carry, chunk_items, start):
        (t,) = chunk_items  # (chunk, 4, 3)
        A, B, C, D = t[:, 0], t[:, 1], t[:, 2], t[:, 3]

        def side_ok(a, b, c, d):
            # plane through (a, b, c); d and the query must lie on one side
            n = jnp.cross(b - a, c - a)  # (chunk, 3)
            ref = jnp.sum((d - a) * n, axis=-1)  # (chunk,)
            qd = jnp.einsum(
                "pc,tc->pt", query_px3, n
            ) - jnp.sum(a * n, axis=-1)[None, :]
            return qd * ref[None, :] >= 0.0

        inside = (
            side_ok(A, B, C, D)
            & side_ok(A, B, D, C)
            & side_ok(A, C, D, B)
            & side_ok(B, C, D, A)
        )  # (P, chunk)
        ids = jax.lax.broadcasted_iota(jnp.int32, inside.shape, 1) + start
        ids = jnp.where(inside & (ids < n_valid), ids, big)
        return jnp.minimum(carry, jnp.min(ids, axis=1))

    found = chunked_scan_reduce((tet_pad,), init, body, chunk)
    return jnp.where(found == big, -1, found)


def points_in_tets(
    tet_pos_bxtx4x3: jnp.ndarray,
    query_bxpx3: jnp.ndarray,
    chunk: int = 1024,
    query_chunk: int = 16384,
) -> jnp.ndarray:
    """(B, P) int32 index of the first tet containing each point, or -1."""
    t = jax.lax.stop_gradient(tet_pos_bxtx4x3).astype(jnp.float32)
    q = jax.lax.stop_gradient(query_bxpx3).astype(jnp.float32)
    return jax.vmap(
        lambda tt, qq: query_tiled(
            lambda qc: _points_in_tets_single(tt, qc, chunk), qq, query_chunk
        )
    )(t, q)


def paste_occupancy(
    tet_occ_bxt: jnp.ndarray, condition_bxp: jnp.ndarray
) -> jnp.ndarray:
    """Gather per-tet occupancy at each point's containing tet.

    Points outside every tet (condition == -1) read tet 0, matching
    deftet.py:132-136 (``paste_occ`` clamps negatives to 0).
    """
    cond = jnp.maximum(condition_bxp, 0).astype(jnp.int32)
    return jnp.take_along_axis(tet_occ_bxt, cond, axis=1)
