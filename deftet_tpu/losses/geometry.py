"""Per-tet regularization losses (pure XLA, trivially batched + fused).

Bit-for-intent ports of layers/DefTet/deftet.py:
  * tet_volumes / volume_variance — :239-263 (V = -det/6, pow-4 variance).
  * amips_energy                  — :266-298 (J = offset @ rest_inverse,
    trace(J^T J) * (det^2 + eps)^(-1/3) * [det >= 0], scale 20).
  * edge_length                   — :320-338 (6 edges, elementwise pow,
    normalized by 6 * n_tets).
  * laplacian_loss                — :340-343 (row-normalized neighbor mean
    minus self, squared), with the sparse matmul replaced by a padded
    neighbor gather (see tetgrid.topology.build_vertex_adjacency).
  * delta_loss                    — parallel.py:232 (mean |offset|).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.geometry import det3x3, tet_edge_matrix

EPS = 1e-10


def tet_volumes(tet_bxtx4x3: jnp.ndarray) -> jnp.ndarray:
    """Signed volume per tet, V = -det([A-D, B-D, C-D]) / 6."""
    D = tet_bxtx4x3[..., 3, :]
    m = jnp.stack(
        [
            tet_bxtx4x3[..., 0, :] - D,
            tet_bxtx4x3[..., 1, :] - D,
            tet_bxtx4x3[..., 2, :] - D,
        ],
        axis=-2,
    )
    return -det3x3(m) / 6.0


def volume_variance(tet_bxtx4x3: jnp.ndarray, pow: int = 4) -> jnp.ndarray:
    """Sum over tets of (V - mean V)^pow, per batch element."""
    v = tet_volumes(tet_bxtx4x3)
    mean_v = jnp.mean(v, axis=-1, keepdims=True)
    if pow == 1:
        return jnp.sum(jnp.abs(v - mean_v), axis=-1)
    return jnp.sum((v - mean_v) ** pow, axis=-1)


def amips_energy(
    tet_bxtx4x3: jnp.ndarray,
    rest_inverse_tx3x3: jnp.ndarray,
    scale: float = 20.0,
    square: bool = False,
) -> jnp.ndarray:
    """AMIPS distortion energy averaged over tets, per batch element."""
    offset = tet_edge_matrix(tet_bxtx4x3, scale=scale)  # (B, T, 3, 3)
    jac = jnp.einsum(
        "btij,tjk->btik", offset, rest_inverse_tx3x3
    )
    trace = jnp.sum(jac * jac, axis=(-1, -2))
    det = det3x3(jac)
    pos_det = (det >= 0.0).astype(jac.dtype)
    energy = trace * jnp.power(det * det + EPS, -1.0 / 3.0) * pos_det
    if square:
        energy = energy**2
    return jnp.mean(energy, axis=-1)


def edge_length(
    tet_bxtx4x3: jnp.ndarray, pow: int = 4, scale: float = 20.0
) -> jnp.ndarray:
    """Mean over tets of the summed elementwise-pow of the 6 scaled edges."""
    A = tet_bxtx4x3[..., 0, :] * scale
    B = tet_bxtx4x3[..., 1, :] * scale
    C = tet_bxtx4x3[..., 2, :] * scale
    D = tet_bxtx4x3[..., 3, :] * scale
    total = (
        jnp.sum((A - D) ** pow, axis=(-1, -2))
        + jnp.sum((B - D) ** pow, axis=(-1, -2))
        + jnp.sum((C - D) ** pow, axis=(-1, -2))
        + jnp.sum((A - B) ** pow, axis=(-1, -2))
        + jnp.sum((A - C) ** pow, axis=(-1, -2))
        + jnp.sum((B - C) ** pow, axis=(-1, -2))
    )
    return total / (6 * tet_bxtx4x3.shape[-3])


def neighbor_mean(
    x_bxnxd: jnp.ndarray,
    adj_idx_nxm: jnp.ndarray,
    adj_mask_nxm: jnp.ndarray,
    degree_n: jnp.ndarray,
) -> jnp.ndarray:
    """Row-normalized adjacency matmul as a padded gather:
    out[i] = mean over neighbors j of x[j]."""
    gathered = x_bxnxd[:, adj_idx_nxm]  # (B, N, M, D)
    s = jnp.sum(gathered * adj_mask_nxm[None, :, :, None], axis=2)
    return s / jnp.maximum(degree_n, 1).astype(x_bxnxd.dtype)[None, :, None]


def laplacian_loss(
    offset_bxnx3: jnp.ndarray,
    adj_idx_nxm: jnp.ndarray,
    adj_mask_nxm: jnp.ndarray,
    degree_n: jnp.ndarray,
) -> jnp.ndarray:
    """sum_i || mean_j offset[j] - offset[i] ||^2 per batch element."""
    nei = neighbor_mean(offset_bxnx3, adj_idx_nxm, adj_mask_nxm, degree_n)
    return jnp.sum((nei - offset_bxnx3) ** 2, axis=(-1, -2))


def delta_loss(pos_delta_bxnx3: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute offset per batch element (parallel.py:232)."""
    return jnp.mean(jnp.abs(pos_delta_bxnx3), axis=(-1, -2))
