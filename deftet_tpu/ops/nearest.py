"""Brute-force nearest neighbour as tiled MXU matmuls.

Replaces layers/nearest_neighbor/nearest_neighbor_cuda.cu:17-55 (one thread
per query scanning all points) and kaolin's ``sided_distance``
(utils/point_cloud_utils.py:92-126).  The pairwise squared distance
``|a|^2 + |b|^2 - 2 a.b`` is dominated by the a @ b^T term, which tiles onto
the MXU; a scan over reference-point chunks keeps the (P_chunk, M_chunk)
tile in VMEM regardless of cloud size.

Gradient contract matches the reference: the argmin index is
non-differentiable (nearest_neighbor.py:48-50); distance gradients flow
through the *gather* of the nearest point (mesh_utils.py:360-366), which is
how `sided_squared_distance` is assembled here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .tiling import chunked_scan_reduce, pad_axis, query_tiled


@functools.partial(jax.jit, static_argnames=("chunk",))
def _nn_single(query_px3, points_mx3, n_valid, chunk: int):
    points_pad, _ = pad_axis(points_mx3, 0, chunk, 0.0)
    m_pad = points_pad.shape[0]
    q2 = jnp.sum(query_px3 * query_px3, axis=-1)  # (P,)

    init = (
        jnp.full(query_px3.shape[0], jnp.inf, dtype=jnp.float32),
        jnp.zeros(query_px3.shape[0], dtype=jnp.int32),
    )

    def body(carry, chunk_items, start):
        best_d, best_i = carry
        (pts,) = chunk_items  # (chunk, 3)
        p2 = jnp.sum(pts * pts, axis=-1)  # (chunk,)
        # HIGHEST precision: f32 accumulation on the MXU.  The bf16 default
        # loses ~1e-2 absolute accuracy after the |a|^2+|b|^2-2ab
        # cancellation, which breaks argmin ties and metric parity.
        cross = jnp.dot(
            query_px3, pts.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (P, chunk) — MXU
        d = q2[:, None] + p2[None, :] - 2.0 * cross
        idx_in_chunk = (
            jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + start
        )
        valid = idx_in_chunk < n_valid
        d = jnp.where(valid, d, jnp.inf)
        arg = jnp.argmin(d, axis=1)
        dmin = jnp.take_along_axis(d, arg[:, None], axis=1)[:, 0]
        take = dmin < best_d
        return (
            jnp.where(take, dmin, best_d),
            jnp.where(
                take, jnp.take_along_axis(idx_in_chunk, arg[:, None], 1)[:, 0],
                best_i,
            ),
        )

    best_d, best_i = chunked_scan_reduce(
        (points_pad,), init, body, chunk
    )
    del m_pad
    return jnp.maximum(best_d, 0.0), best_i


def _use_pallas_auto() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def nearest_neighbor(
    query_bxpx3: jnp.ndarray,
    points_bxmx3: jnp.ndarray,
    n_valid=None,
    chunk: int = 2048,
    query_chunk: int = 8192,
    use_pallas=None,
    n_queries=None,
):
    """Index of the nearest reference point per query.

    Returns (squared_distance (B, P), index (B, M) int32).  Both are
    stop-gradient (computed in f32 regardless of input dtype).

    On TPU (use_pallas=None -> auto) dispatches to the fused Pallas
    kernel (ops.nearest_pallas): the (P, M) distance matrix stays in
    VMEM, ~3x faster than the tiled-XLA path.  Otherwise: tiled on both
    axes — reference points by `chunk` (scan), queries by `query_chunk`
    (map) so the live tile stays VMEM-sized at any P.
    """
    q = jax.lax.stop_gradient(query_bxpx3).astype(jnp.float32)
    p = jax.lax.stop_gradient(points_bxmx3).astype(jnp.float32)
    if n_valid is None:
        n_valid = jnp.full(q.shape[0], p.shape[1], dtype=jnp.int32)
    if use_pallas is None:
        use_pallas = _use_pallas_auto()
    if use_pallas:
        from .nearest_pallas import nearest_neighbor_pallas

        d2, idx = nearest_neighbor_pallas(q, p, n_valid, n_queries=n_queries)
    else:
        d2, idx = jax.vmap(
            lambda a, b, n: query_tiled(
                lambda qq: _nn_single(qq, b, n, chunk), a, query_chunk
            )
        )(q, p, n_valid)
    # Named for jax.checkpoint's save_only_these_names policy: saving the
    # (B, P) int32 argmin avoids re-running the O(P x M) scan in the
    # backward pass under remat (the gradient only needs the gather).
    return d2, checkpoint_name(idx, "nn_argmin_idx")


def sided_squared_distance(
    a_bxnx3: jnp.ndarray,
    b_bxmx3: jnp.ndarray,
    n_valid_b=None,
    chunk: int = 2048,
    query_chunk: int = 8192,
    n_valid_a=None,
):
    """Differentiable one-sided squared distance a -> b.

    The argmin runs without AD; the returned distance is recomputed through
    the gather so gradients flow to both clouds (matching the reference's
    NN + gather pattern at mesh_utils.py:360-366).
    """
    _, idx = nearest_neighbor(
        a_bxnx3, b_bxmx3, n_valid_b, chunk, query_chunk,
        n_queries=n_valid_a,
    )
    closest = jnp.take_along_axis(
        b_bxmx3, idx[..., None].astype(jnp.int32), axis=1
    )
    return jnp.sum((a_bxnx3 - closest) ** 2, axis=-1), idx
