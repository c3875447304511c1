"""Small batched 3D geometry primitives (pure XLA).

Replaces the reference's utils/matrix_utils.py (det via scalar triple
product, :42-46) and the chunked singular-guarded inverse
(layers/DefTet/deftet.py:205-233 ``my_inverse``).  No chunking is needed:
XLA fuses the closed-form adjugate inverse over any batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 3, 3) via scalar triple product a . (b x c)."""
    a, b, c = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    return jnp.sum(a * jnp.cross(b, c), axis=-1)


def safe_inverse3x3(m: jnp.ndarray, eps: float = 1e-10):
    """Adjugate-based inverse of (..., 3, 3); near-singular inputs are
    replaced by the identity before inversion.

    Returns (inverse, valid_mask) where valid_mask is 1.0 for well-
    conditioned inputs — the same contract as deftet.py:205-233.
    """
    det = det3x3(m)
    singular = jnp.abs(det) < eps
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    m_safe = jnp.where(singular[..., None, None], eye, m)
    det_safe = det3x3(m_safe)

    a, b, c = m_safe[..., 0, :], m_safe[..., 1, :], m_safe[..., 2, :]
    # rows of the cofactor transpose = columns (b x c, c x a, a x b)
    inv = jnp.stack(
        [jnp.cross(b, c), jnp.cross(c, a), jnp.cross(a, b)], axis=-1
    ) / det_safe[..., None, None]
    return inv, 1.0 - singular.astype(m.dtype)


def gather_tet_vertices(
    verts_bxnx3: jnp.ndarray, tet_fx4: jnp.ndarray
) -> jnp.ndarray:
    """(B, N, 3) vertex positions + (T, 4) indices -> (B, T, 4, 3)."""
    return verts_bxnx3[:, tet_fx4]


def tet_edge_matrix(tet_bxtx4x3: jnp.ndarray, scale: float = 20.0):
    """Rows [B-A; C-A; D-A] * scale per tet — the AMIPS Jacobian frame
    (deftet.py:269-277; scale=20 for numerical stability)."""
    A = tet_bxtx4x3[..., 0, :]
    return (
        jnp.stack(
            [
                tet_bxtx4x3[..., 1, :] - A,
                tet_bxtx4x3[..., 2, :] - A,
                tet_bxtx4x3[..., 3, :] - A,
            ],
            axis=-2,
        )
        * scale
    )


def tet_rest_inverse(
    rest_verts_nx3: jnp.ndarray, tet_fx4: jnp.ndarray, scale: float = 20.0
) -> jnp.ndarray:
    """Per-tet inverse of the rest-pose edge matrix (deftet.py:300-318)."""
    tet = rest_verts_nx3[tet_fx4][None]  # (1, T, 4, 3)
    edge = tet_edge_matrix(tet, scale=scale)[0]
    inv, _ = safe_inverse3x3(edge)
    return inv


@jax.custom_vjp
def incidence_gather(values_bxn, idx_flat_k, inc_idx_nxm, inc_mask_nxm):
    """values[:, idx_flat] with a scatter-free backward.

    Forward: (B, N) gathered by a static index list -> (B, K).
    Backward: instead of the default transpose (scatter-add with
    duplicate indices — measured seconds per step on TPU at K ~ 5M), the
    cotangent is accumulated by a padded gather over the precomputed
    incidence (tetgrid.topology.build_vertex_face_incidence).
    """
    return jnp.take_along_axis(
        values_bxn, idx_flat_k[None].astype(jnp.int32), axis=1
    )


def _incidence_gather_fwd(values, idx_flat, inc_idx, inc_mask):
    out = incidence_gather(values, idx_flat, inc_idx, inc_mask)
    return out, (inc_idx, inc_mask)


def _incidence_gather_bwd(res, g):
    inc_idx, inc_mask = res
    gathered = jnp.take_along_axis(
        g, inc_idx.reshape(-1)[None].astype(jnp.int32), axis=1
    ).reshape(g.shape[0], *inc_idx.shape)  # (B, N, M)
    grad_values = jnp.sum(gathered * inc_mask[None], axis=-1)
    return (grad_values, None, None, None)


incidence_gather.defvjp(_incidence_gather_fwd, _incidence_gather_bwd)


@jax.custom_vjp
def edge_face_sum(x_bxf, edge_face_idx, edge_face_mask, face_edge_ids):
    """Per-edge sums of per-face values — gathers in BOTH directions.

    Forward: out[b, e] = sum_m x[b, edge_face_idx[e, m]] * mask[e, m],
    evaluated as M column gathers of (B, E) (no scatter, no (B, E, M)
    tensor whose tiny M lane pads 20x).  Backward: each face touches
    exactly its 3 edges, so the cotangent is g[:, face_edge_ids].sum(-1) —
    a static (F, 3) gather.  segment_sum/scatter formulations of this
    reduction cost ~2s/step at res-50; this one is ~free.
    """
    out = 0.0
    for m in range(edge_face_idx.shape[1]):
        vals = jnp.take_along_axis(
            x_bxf, edge_face_idx[None, :, m].astype(jnp.int32), axis=1
        )
        out = out + vals * edge_face_mask[None, :, m]
    return out


def _edge_face_sum_fwd(x, efi, efm, fei):
    # residuals must be JAX types: carry the primal dtype in an empty array
    return edge_face_sum(x, efi, efm, fei), (fei, jnp.zeros((0,), x.dtype))


def _edge_face_sum_bwd(res, g):
    fei, dtype_token = res
    x_dtype = dtype_token.dtype
    f = fei.shape[0]
    # gather the cotangent at the primal's precision: for bf16 fields the
    # random-access gather bytes (the whole cost) halve too.  Slot-major
    # flat index list, so the per-slot sum is three (B, F) slices — a
    # (B, F, 3) intermediate would pad its size-3 minor dim ~5x on TPU
    # (measured 3.9GB of padding at res-70).
    flat = jnp.swapaxes(fei, 0, 1).reshape(-1)  # slot-major (3F,)
    g3 = jnp.take_along_axis(
        g.astype(x_dtype), flat[None].astype(jnp.int32), axis=1
    )  # (B, 3F)
    total = (
        g3[:, :f].astype(jnp.float32)
        + g3[:, f:2 * f].astype(jnp.float32)
        + g3[:, 2 * f:].astype(jnp.float32)
    )
    return (total.astype(x_dtype), None, None, None)


edge_face_sum.defvjp(_edge_face_sum_fwd, _edge_face_sum_bwd)


def face_normals(face_bxfx3x3: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit normals of triangles (..., 3 verts, 3) (mesh_utils.py:42-53)."""
    a = face_bxfx3x3[..., 0, :]
    b = face_bxfx3x3[..., 1, :]
    c = face_bxfx3x3[..., 2, :]
    n = jnp.cross(b - a, c - a)
    return n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + eps)
