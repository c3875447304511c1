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

import jax
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
        "btij,tjk->btik",
        offset,
        rest_inverse_tx3x3,
        precision=jax.lax.Precision.HIGHEST,
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


# ---------------------------------------------------------------------------
# Structure-of-arrays variants.
#
# A (B, T, 4, 3) tet-corner tensor puts tiny dims in the TPU lane/sublane
# positions — observed 40x padding expansion (5.7GB for a 144MB gather) at
# production grid sizes.  The SoA forms below keep every array (B, T):
# the big T axis rides the 128-lane dimension, padding is ~1x, and all the
# per-tet math is pure VPU elementwise work.
# ---------------------------------------------------------------------------


def gather_tet_soa(pos_bxnx3: jnp.ndarray, tet_tx4: jnp.ndarray,
                   vert_tet_inc=None):
    """Per-corner, per-coordinate gathers: soa[k][c] is an (B, T) array
    holding coordinate c of corner k.

    With `vert_tet_inc` = (inc_idx, inc_mask) from
    tetgrid.topology.build_vertex_tet_incidence, the backward becomes a
    padded incidence gather instead of 12 duplicate-index scatter-adds.
    """
    if vert_tet_inc is not None:
        from ..ops.geometry import incidence_gather

        inc_idx, inc_mask = vert_tet_inc
        t = tet_tx4.shape[0]
        tet_flat = jnp.swapaxes(tet_tx4, 0, 1).reshape(-1)  # k-major (4T,)
        soa = [[None] * 3 for _ in range(4)]
        for c in range(3):
            vals = incidence_gather(
                pos_bxnx3[..., c], tet_flat, inc_idx, inc_mask
            )  # (B, 4T)
            for k in range(4):
                soa[k][c] = vals[:, k * t:(k + 1) * t]
        return soa
    cols = [pos_bxnx3[..., c] for c in range(3)]  # 3 x (B, N)
    return [
        [jnp.take_along_axis(
            cols[c], tet_tx4[None, :, k].astype(jnp.int32), axis=1
        ) for c in range(3)]
        for k in range(4)
    ]


def gather_tet_soa_lattice(pos_bxnx3: jnp.ndarray, res: int, offsets):
    """gather_tet_soa for the type-major regular grid — zero gathers.

    ``offsets`` is the static ((6, 4, 3)) corner-offset table from
    train.statics.lattice_tet_offsets.  Corner (type, k) of every tet is
    vertex (i+di, j+dj, k+dk), so each of the at-most-8 distinct offsets
    is ONE contiguous slice of the (B, n, n, n) vertex lattice; soa[k][c]
    concatenates 6 type-slices along the tet axis.  The random-access
    corner gathers (and their incidence-gather backward) measured
    ~100 ms/step at res-50 — slices and their pad-transpose are
    sequential HBM traffic, ~bandwidth-speed.
    """
    r = int(res)
    n = r + 1
    b = pos_bxnx3.shape[0]
    slices = {}  # (di,dj,dk) -> [3 x (B, r^3)]
    for ty in range(6):
        for k in range(4):
            off = tuple(offsets[ty][k])
            if off not in slices:
                di, dj, dk = off
                sl = pos_bxnx3.reshape(b, n, n, n, 3)[
                    :, di:di + r, dj:dj + r, dk:dk + r, :
                ].reshape(b, r * r * r, 3)
                slices[off] = [sl[..., c] for c in range(3)]
    return [
        [
            jnp.concatenate(
                [slices[tuple(offsets[ty][k])][c] for ty in range(6)],
                axis=1,
            )
            for c in range(3)
        ]
        for k in range(4)
    ]


def tet_centers_soa(soa):
    """Mean of the 4 corners; returns 3 (B, T) component arrays."""
    return [
        (soa[0][c] + soa[1][c] + soa[2][c] + soa[3][c]) * 0.25
        for c in range(3)
    ]


def _det3_soa(m):
    """Determinant of a 3x3 whose entries m[i][j] are (B, T) arrays."""
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def tet_volumes_soa(soa):
    """Signed volume V = -det([A-D, B-D, C-D]) / 6 as a (B, T) array."""
    rows = [
        [soa[k][c] - soa[3][c] for c in range(3)] for k in range(3)
    ]
    return -_det3_soa(rows) / 6.0


def volume_variance_soa(soa, pow: int = 4) -> jnp.ndarray:
    v = tet_volumes_soa(soa)
    mean_v = jnp.mean(v, axis=-1, keepdims=True)
    if pow == 1:
        return jnp.sum(jnp.abs(v - mean_v), axis=-1)
    return jnp.sum((v - mean_v) ** pow, axis=-1)


def amips_energy_soa(
    soa,
    rest_inverse_tx3x3: jnp.ndarray,
    scale: float = 20.0,
    square: bool = False,
) -> jnp.ndarray:
    """SoA twin of amips_energy: J = edge_matrix @ rest_inverse with all
    nine J entries as (B, T) arrays."""
    edge = [
        [(soa[k + 1][c] - soa[0][c]) * scale for c in range(3)]
        for k in range(3)
    ]  # edge[i][k]: row i, column k
    inv = [
        [rest_inverse_tx3x3[:, k, j][None] for j in range(3)]
        for k in range(3)
    ]
    jac = [
        [
            edge[i][0] * inv[0][j] + edge[i][1] * inv[1][j]
            + edge[i][2] * inv[2][j]
            for j in range(3)
        ]
        for i in range(3)
    ]
    trace = sum(jac[i][j] * jac[i][j] for i in range(3) for j in range(3))
    det = _det3_soa(jac)
    pos_det = (det >= 0.0).astype(trace.dtype)
    energy = trace * jnp.power(det * det + EPS, -1.0 / 3.0) * pos_det
    if square:
        energy = energy**2
    return jnp.mean(energy, axis=-1)


def edge_length_soa(soa, pow: int = 4, scale: float = 20.0) -> jnp.ndarray:
    """SoA twin of edge_length."""
    pairs = [(0, 3), (1, 3), (2, 3), (0, 1), (0, 2), (1, 2)]
    total = 0.0
    for a, b in pairs:
        for c in range(3):
            total = total + jnp.sum(
                (soa[a][c] * scale - soa[b][c] * scale) ** pow, axis=-1
            )
    n_tets = soa[0][0].shape[-1]
    return total / (6 * n_tets)
