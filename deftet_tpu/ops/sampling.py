"""PointNet-style sampling/grouping primitives (TPU-native).

Equivalents of the reference PVCNN CUDA backend ops that the main DefTet
configs never invoke but the framework ships for completeness
(SURVEY.md C3 / P8): furthest point sampling + gather
(layers/pv_module/functional/sampling.py + src/sampling/sampling.cu),
ball query (functional/ball_query.py + src/ball_query/ball_query.cu),
grouping (functional/grouping.py), 3-nearest-neighbor inverse-distance
interpolation (functional/interpolatation.py +
src/interpolate/neighbor_interpolate.cu), and logits_mask
(functional/sampling.py:48-92).

Design: channels-last (B, N, C) layouts, static output shapes, no
atomics — gathers whose autodiff transposes are XLA scatter-adds replace
every hand-written backward kernel.  The O(M·N) distance scans are
batched matmul-shaped reductions that XLA tiles onto the MXU; FPS is the
one inherently sequential op and runs as a ``lax.fori_loop`` with a
vectorized min-distance update (O(M) steps of O(N) work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "gather_points",
    "furthest_point_sample",
    "ball_query",
    "grouping",
    "three_nn_interpolate",
    "logits_mask",
]


def _pairwise_sqdist(a_bxmx3: jnp.ndarray, b_bxnx3: jnp.ndarray) -> jnp.ndarray:
    """(B, M, N) squared L2 distances; ‖a‖²+‖b‖²−2a·b form (MXU-friendly)."""
    d = (
        jnp.sum(a_bxmx3 * a_bxmx3, axis=-1)[:, :, None]
        + jnp.sum(b_bxnx3 * b_bxnx3, axis=-1)[:, None, :]
        - 2.0
        * jnp.einsum(
            "bmc,bnc->bmn",
            a_bxmx3,
            b_bxnx3,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    return jnp.maximum(d, 0.0)


def gather_points(features_bxnxc: jnp.ndarray, idx_bxm: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point features by index (sampling.cu gather_features).

    The reference pairs this with an atomicAdd backward
    (sampling.cu gather_features_grad_kernel); here the scatter-add is
    the autodiff transpose XLA derives for the gather.
    """
    return jnp.take_along_axis(
        features_bxnxc, idx_bxm[:, :, None].astype(jnp.int32), axis=1
    )


def furthest_point_sample(coords_bxnx3: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Iterative farthest-point sampling; returns indices (B, M) int32.

    Matches src/sampling/sampling.cu furthest_point_sampling_kernel:
    seed with point 0, then repeatedly take the point with the largest
    min-distance to the selected set.  Sequential in M by nature —
    expressed as a fori_loop whose body is one fused vectorized pass.
    """
    b, n, _ = coords_bxnx3.shape
    m = int(num_samples)

    def body(i, carry):
        idx_bxm, mind_bxn = carry
        last = jnp.take_along_axis(
            coords_bxnx3, idx_bxm[:, i - 1][:, None, None], axis=1
        )  # (B, 1, 3)
        d = jnp.sum((coords_bxnx3 - last) ** 2, axis=-1)  # (B, N)
        mind_bxn = jnp.minimum(mind_bxn, d)
        nxt = jnp.argmax(mind_bxn, axis=-1).astype(jnp.int32)  # (B,)
        idx_bxm = idx_bxm.at[:, i].set(nxt)
        return idx_bxm, mind_bxn

    idx0 = jnp.zeros((b, m), jnp.int32)
    mind0 = jnp.full((b, n), jnp.inf, jnp.float32)
    idx_bxm, _ = jax.lax.fori_loop(1, m, body, (idx0, mind0))
    return idx_bxm


def ball_query(
    centers_bxmx3: jnp.ndarray,
    points_bxnx3: jnp.ndarray,
    radius: float,
    num_neighbors: int,
) -> jnp.ndarray:
    """Indices (B, M, U) of up to U points within ``radius`` of each center.

    Reproduces ball_query.cu scan-order semantics: the first U in-radius
    points in point order fill the slots; slots past the in-radius count
    repeat the *first* in-radius index; centers with no in-radius point
    get index 0 (the kernel's zero-initialized output).
    """
    u = int(num_neighbors)
    n = points_bxnx3.shape[1]
    d2 = _pairwise_sqdist(centers_bxmx3, points_bxnx3)  # (B, M, N)
    inside = d2 < (radius * radius)
    # Key = point position for in-radius points, pushed past N otherwise:
    # top-k of the negated key returns the first U in-radius indices in
    # scan order (ties impossible — keys are distinct integers).
    pos = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(inside, pos[None, None, :], pos[None, None, :] + n)
    _, idx = jax.lax.top_k(-key, u)  # ascending key order
    idx = idx.astype(jnp.int32)  # (B, M, U)
    cnt = jnp.minimum(jnp.sum(inside, axis=-1), u)  # (B, M)
    first = idx[:, :, :1]  # first in-radius index (or smallest key if none)
    slot = jnp.arange(u, dtype=jnp.int32)[None, None, :]
    idx = jnp.where(slot < cnt[:, :, None], idx, first)
    return jnp.where(cnt[:, :, None] > 0, idx, 0)


def grouping(features_bxnxc: jnp.ndarray, idx_bxmxu: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features → (B, M, U, C) (grouping.cu forward;
    backward is the autodiff scatter-add transpose)."""
    b, m, u = idx_bxmxu.shape
    flat = idx_bxmxu.reshape(b, m * u).astype(jnp.int32)
    out = jnp.take_along_axis(features_bxnxc, flat[:, :, None], axis=1)
    return out.reshape(b, m, u, features_bxnxc.shape[-1])


def three_nn_interpolate(
    points_bxnx3: jnp.ndarray,
    centers_bxmx3: jnp.ndarray,
    centers_feat_bxmxc: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse-distance interpolation from the 3 nearest centers.

    Weight formula matches three_nearest_neighbors_kernel
    (neighbor_interpolate.cu:61-73): with d0≤d1≤d2 the squared
    distances clamped to [1e-10, 1e10], w_i ∝ product of the other two.
    Gradient flows to centers_features only (reference backward returns
    None for both coordinate args) — achieved with stop_gradient on the
    weights' inputs, not hand-written kernels.
    """
    d2 = _pairwise_sqdist(points_bxnx3, centers_bxmx3)  # (B, N, M)
    d2 = jax.lax.stop_gradient(d2)
    neg_top, idx = jax.lax.top_k(-d2, 3)  # (B, N, 3) nearest-first
    d = jnp.clip(-neg_top, 1e-10, 1e10)
    d0, d1, d2_ = d[..., 0], d[..., 1], d[..., 2]
    denom = 1.0 / (d0 * d1 + d0 * d2_ + d1 * d2_)
    w = jnp.stack([d1 * d2_, d0 * d2_, d0 * d1], axis=-1) * denom[..., None]
    feats = grouping(centers_feat_bxmxc, idx.astype(jnp.int32))  # (B, N, 3, C)
    return jnp.sum(feats * w[..., None], axis=2)


def logits_mask(
    coords_bxnx3: jnp.ndarray,
    logits_bxnx2: jnp.ndarray,
    num_points_per_object: int,
    rng: jax.Array,
):
    """Select M points per sample where class-1 logit wins, centered.

    Functional equivalent of functional/sampling.py logits_mask: random
    without-replacement choice among mask candidates when there are ≥M,
    repeat + random fill when 0 < count < M, all-zeros indices when the
    mask is empty; selected coords are mean-centered by the masked mean.
    The reference's per-sample numpy loop becomes one static-shape
    sort-by-random-key pass.

    Returns (selected (B, M, 3), masked_mean (B, 3), mask (B, N) bool).
    """
    b, n, _ = coords_bxnx3.shape
    m = int(num_points_per_object)
    mask = logits_bxnx2[..., 0] < logits_bxnx2[..., 1]  # (B, N)
    cnt = jnp.sum(mask, axis=-1)  # (B,)
    masked = coords_bxnx3 * mask[..., None]
    mean = jnp.sum(masked, axis=1) / jnp.maximum(cnt, 1)[:, None]

    # Random priority for candidates, +inf for non-candidates → the first
    # min(cnt, N) sorted slots are a uniform random permutation of the
    # candidate set.
    pri = jax.random.uniform(rng, (b, n))
    pri = jnp.where(mask, pri, jnp.inf)
    order = jnp.argsort(pri, axis=-1).astype(jnp.int32)  # (B, N)
    # Slot j picks candidate rank j mod cnt: without replacement while
    # j < cnt, then wraps (the reference's repeat-and-fill branch).
    slot = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
    rank = jnp.where(
        cnt[:, None] > 0, slot % jnp.maximum(cnt, 1)[:, None], 0
    )
    sel_idx = jnp.take_along_axis(order, rank, axis=1)  # (B, M)
    sel_idx = jnp.where(cnt[:, None] > 0, sel_idx, 0)
    selected = gather_points(masked - mean[:, None, :], sel_idx)
    return selected, mean, mask
