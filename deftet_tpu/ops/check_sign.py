"""Watertight point-in-mesh test via +z ray-crossing parity.

TPU-native replacement for kaolin's ``check_sign`` (consumed at
layers/DefTet/deftet.py:46, dataloader.py:92 and eval.py:239 to label tet
centers / SDF samples with ground-truth occupancy).  A point is inside a
watertight mesh iff a ray to +infinity crosses the surface an odd number of
times.  The per-(point, face) crossing test is a 2D barycentric solve in the
xy plane; a scan over face chunks keeps memory bounded.

Queries are deterministically jittered by ~1e-7 so rays avoid exact
edge/vertex hits (the same class of robustness trick as kaolin's hashed
grid).  Output is float {0., 1.} occupancy with no gradient (the reference
computes it under torch.no_grad(), deftet.py:40-48).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .tiling import chunked_scan_reduce, pad_axis, query_tiled

# Plain tuple, NOT a jnp array: a module-level jax op initializes the
# default backend at import time — before any CLI/entry-point platform
# forcing can run — and hangs every import when the TPU terminal is
# unreachable.  Converted to a traced constant inside the jitted fn.
_JITTER = (4.9e-7, 7.3e-7, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _check_sign_single(verts_nx3, faces_fx3, n_valid_faces, query_px3, chunk):
    tri = verts_nx3[faces_fx3]  # (F, 3, 3)
    tri_pad, _ = pad_axis(tri, 0, chunk, 0.0)
    q = query_px3 + jnp.asarray(_JITTER, query_px3.dtype)[None, :]

    init = jnp.zeros(q.shape[0], dtype=jnp.int32)

    def body(carry, chunk_items, start):
        (t,) = chunk_items  # (chunk, 3, 3)
        v0, v1, v2 = t[:, 0], t[:, 1], t[:, 2]
        e1 = v1 - v0  # (chunk, 3)
        e2 = v2 - v0
        denom = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]  # (chunk,)
        safe = jnp.abs(denom) > 1e-12
        denom = jnp.where(safe, denom, 1.0)
        # s = q - v0 broadcast: (P, chunk, 2)
        sx = q[:, None, 0] - v0[None, :, 0]
        sy = q[:, None, 1] - v0[None, :, 1]
        u = (sx * e2[None, :, 1] - sy * e2[None, :, 0]) / denom[None, :]
        v = (e1[None, :, 0] * sy - e1[None, :, 1] * sx) / denom[None, :]
        inside = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        z_hit = v0[None, :, 2] + u * e1[None, :, 2] + v * e2[None, :, 2]
        above = z_hit > q[:, None, 2]
        face_ids = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1) + start
        valid = face_ids < n_valid_faces
        crossings = (inside & above & safe[None, :] & valid).astype(jnp.int32)
        return carry + jnp.sum(crossings, axis=1)

    count = chunked_scan_reduce((tri_pad,), init, body, chunk)
    return (count % 2).astype(jnp.float32)


def check_sign(
    verts_bxnx3: jnp.ndarray,
    faces_bxfx3: jnp.ndarray,
    query_bxpx3: jnp.ndarray,
    n_valid_faces=None,
    chunk: int = 1024,
    query_chunk: int = 16384,
) -> jnp.ndarray:
    """Occupancy (1 inside, 0 outside) of queries w.r.t. watertight meshes.

    Args:
      verts_bxnx3: (B, N, 3) padded vertices.
      faces_bxfx3: (B, F, 3) padded faces; padding rows must index valid
        vertices (e.g. zeros) and be excluded via n_valid_faces.
      query_bxpx3: (B, P, 3).
      n_valid_faces: (B,) int32 count of real faces, default all.
    """
    v = jax.lax.stop_gradient(verts_bxnx3).astype(jnp.float32)
    f = faces_bxfx3.astype(jnp.int32)
    q = jax.lax.stop_gradient(query_bxpx3).astype(jnp.float32)
    if n_valid_faces is None:
        n_valid_faces = jnp.full(v.shape[0], f.shape[1], dtype=jnp.int32)
    return jax.vmap(
        lambda vv, ff, nn, qq: query_tiled(
            lambda qc: _check_sign_single(vv, ff, nn, qc, chunk),
            qq,
            query_chunk,
        )
    )(v, f, n_valid_faces, q)
