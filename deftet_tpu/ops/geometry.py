"""Small batched 3D geometry primitives (pure XLA).

Replaces the reference's utils/matrix_utils.py (det via scalar triple
product, :42-46) and the chunked singular-guarded inverse
(layers/DefTet/deftet.py:205-233 ``my_inverse``).  No chunking is needed:
XLA fuses the closed-form adjugate inverse over any batch size.
"""

from __future__ import annotations

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


def face_normals(face_bxfx3x3: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit normals of triangles (..., 3 verts, 3) (mesh_utils.py:42-53)."""
    a = face_bxfx3x3[..., 0, :]
    b = face_bxfx3x3[..., 1, :]
    c = face_bxfx3x3[..., 2, :]
    n = jnp.cross(b - a, c - a)
    return n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + eps)
