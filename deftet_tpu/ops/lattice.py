"""Shifted-slice fast paths over the class-major lattice face layout.

Companions to ``tetgrid.lattice_faces``: when the tet grid is the regular
Kuhn lattice and faces are ordered class-major (``face = class * r^3 +
cell``), the boundary-face test and the per-edge normal-loss reductions
become contiguous shifted slices of ``(B, 6|12, r, r, r)`` arrays —
replacing the random-access gathers of ``losses.surface.
boundary_info_from_occupancy`` (2 gathers of (B, F) from (B, T)) and
``ops.geometry.edge_face_sum`` (6 gathers of (B, E) from (B, F) forward +
a (3F,) gather backward; ~36 ms/step at res-50/bs-4 in the round-2
profile).  Random-access gathers measured ~5 GiB/s on v5e vs near-memcpy
for slices, so these paths are bandwidth-optimal by construction.

Everything here is plain jnp (pad / slice / concatenate / elementwise):
autodiff produces the transposed slice/pad program, which is equally
contiguous — no custom VJPs needed, unlike the gather formulations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _partner_shift(vol_a, vol_b, delta):
    """``out[cell] = vol_b[cell + delta]`` where the partner cell is on the
    grid, else ``vol_a[cell]`` (the self-pair trick: invalid slots read
    their own occupancy, so ``occ_a + occ_b`` is never 1 there).

    ``vol_*``: (..., r, r, r); ``delta`` has at most one nonzero
    component in {-1, +1} (face classes pair cells across one wall).
    """
    nz = [(ax, d) for ax, d in enumerate(delta) if d != 0]
    if not nz:
        return vol_b
    assert len(nz) == 1, delta
    ax, d = nz[0]
    axis = vol_b.ndim - 3 + ax
    if d == 1:
        shifted = jax.lax.slice_in_dim(vol_b, 1, None, axis=axis)
        edge = jax.lax.slice_in_dim(vol_a, -1, None, axis=axis)
        return jnp.concatenate([shifted, edge], axis=axis)
    shifted = jax.lax.slice_in_dim(vol_b, 0, -1, axis=axis)
    edge = jax.lax.slice_in_dim(vol_a, 0, 1, axis=axis)
    return jnp.concatenate([edge, shifted], axis=axis)


def lattice_boundary_info(occ_bxt: jnp.ndarray, face_lattice):
    """(mask (B, 12r^3), sign (B, 12r^3)) — shifted-slice form of
    ``boundary_info_from_occupancy`` on the class-major face layout.

    Semantics parity (deftet.py:186-195): a face is boundary iff its two
    owners' occupancies sum to exactly 1; sign is -1 where the first
    owner is occupied.  Invalid (hull-padded) slots are never boundary.
    """
    r = face_lattice.res
    b = occ_bxt.shape[0]
    occ6 = occ_bxt.reshape(b, 6, r, r, r)
    masks, signs = [], []
    for fc in face_lattice.classes:
        occ_a = occ6[:, fc.first_type]
        occ_b = _partner_shift(occ_a, occ6[:, fc.second_type], fc.delta)
        masks.append((occ_a + occ_b == 1.0).astype(jnp.float32))
        signs.append(1.0 - 2.0 * occ_a)
    mask = jnp.stack(masks, axis=1).reshape(b, -1)
    sign = jnp.stack(signs, axis=1).reshape(b, -1)
    return mask, sign


def lattice_edge_quadratics(
    w_bxf: jnp.ndarray,
    nx_bxf: jnp.ndarray,
    ny_bxf: jnp.ndarray,
    nz_bxf: jnp.ndarray,
    face_lattice,
):
    """Per-batch ``(sum_e s_w^2 - |s_n|^2, sum_e s_w^2 - s_w)`` over all
    lattice edges, from class-major per-face fields.

    The shifted-slice equivalent of the ``edge_face_sum`` closed form in
    ``normal_smoothness_loss_compacted`` for BINARY weights ``w`` (so
    ``s_w2 == s_w``): for each of the 7 edge direction classes the
    per-edge sums ``s_* (B, (r+1)^3)`` are built by summing the incident
    face-class volumes at static offsets (edge_class_table); off-grid
    reads are zero via padding, which also zeroes contributions from
    spurious (non-edge) anchor slots.  Quadratics accumulate in f32; the
    slice traffic stays in the input dtype (bf16 fields halve bytes).
    """
    r = face_lattice.res
    b = w_bxf.shape[0]
    fields = jnp.stack([w_bxf, nx_bxf, ny_bxf, nz_bxf], axis=1).reshape(
        b, 4, 12, r, r, r
    )
    pad = [(0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (1, 1)]
    padded = jnp.pad(fields, pad)
    total = jnp.zeros((b,), jnp.float32)
    count = jnp.zeros((b,), jnp.float32)
    for incidences in face_lattice.edge_incidence:
        s = None
        for fclass, (di, dj, dk) in incidences:
            sl = padded[
                :, :, fclass,
                1 + di: 2 + di + r,
                1 + dj: 2 + dj + r,
                1 + dk: 2 + dk + r,
            ]
            s = sl if s is None else s + sl
        s = s.astype(jnp.float32)
        s_w, s_nx, s_ny, s_nz = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
        total = total + jnp.sum(
            s_w * s_w - (s_nx * s_nx + s_ny * s_ny + s_nz * s_nz),
            axis=(1, 2, 3),
        )
        count = count + jnp.sum(s_w * s_w - s_w, axis=(1, 2, 3))
    return total, count
