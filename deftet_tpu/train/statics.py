"""Per-resolution static arrays shipped into the jitted train step.

The reference rebuilds these once in Engine.__init__ (train_multigpu.py:
58-117): centered init positions, deform mask, faces + owning tets, vertex
adjacency (sparse), rest-pose inverse matrices.  Here they are one pytree of
dense device arrays, replicated across the mesh, so the train step is a pure
function of (params, batch, statics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.geometry import tet_rest_inverse
from ..tetgrid import TetGrid, Topology, build_tet_grid, build_topology


class GridStatics(NamedTuple):
    init_pos_nx3: jnp.ndarray       # (N, 3) float32, centered to [-0.5, 0.5]
    pos_mask_nx3: jnp.ndarray       # (N, 3) float32 interior (deformable) mask
    tet_tx4: jnp.ndarray            # (T, 4) int32
    face_fx3: jnp.ndarray           # (F, 3) int32 interior faces
    face_tet_fx2: jnp.ndarray       # (F, 2) int32
    edge_face_idx: jnp.ndarray      # (E, M) int32 faces incident per edge
    edge_face_mask: jnp.ndarray     # (E, M) float32
    face_edge_ids: jnp.ndarray      # (F, 3) int32
    vert_face_inc_idx: jnp.ndarray  # (N, M) int32
    vert_face_inc_mask: jnp.ndarray  # (N, M) float32
    vert_tet_inc_idx: jnp.ndarray   # (N, Mt) int32
    vert_tet_inc_mask: jnp.ndarray  # (N, Mt) float32
    vert_adj_idx: jnp.ndarray       # (N, M) int32
    vert_adj_mask: jnp.ndarray      # (N, M) float32
    vert_degree: jnp.ndarray        # (N,) int32
    rest_inverse_tx3x3: jnp.ndarray  # (T, 3, 3) float32

    @property
    def n_vertices(self) -> int:
        return self.init_pos_nx3.shape[0]

    @property
    def n_tets(self) -> int:
        return self.tet_tx4.shape[0]


def lattice_offsets(grid: TetGrid) -> tuple | None:
    """Neighbor offsets of the regular lattice, or None if not a lattice.

    Derived from the actual adjacency of a strictly interior vertex of the
    same grid family (the Kuhn split has 14: 6 axis, 6 consistent face
    diagonals, 2 main diagonals).  Static python ints — consumed by
    nn.gcn.LatticeAdjacency as a shift stencil.
    """
    if grid.resolution < 2:
        return None
    from ..tetgrid.topology import TET_EDGES

    # Probe a small grid of the same family — the stencil is
    # translation-invariant, so any strictly interior vertex works.
    probe = build_tet_grid(min(grid.resolution, 4))
    r = probe.resolution
    n = r + 1
    center = (r // 2) * n * n + (r // 2) * n + (r // 2)
    e = probe.tets[:, TET_EDGES].reshape(-1, 2)
    mask = (e[:, 0] == center) | (e[:, 1] == center)
    nbrs = np.unique(e[mask])
    nbrs = nbrs[nbrs != center]

    def coords(i):
        return (i // (n * n), (i // n) % n, i % n)

    c0 = np.array(coords(center))
    offs = sorted(
        tuple(int(x) for x in (np.array(coords(int(i))) - c0))
        for i in nbrs
    )
    assert all(max(abs(x) for x in o) <= 1 for o in offs)
    return tuple(offs)


def lattice_tet_offsets(grid: TetGrid) -> tuple | None:
    """Per-(type, corner) lattice offsets of the type-major Kuhn grid.

    Returns a static ((6, 4, 3)) nested tuple of {0,1} offsets such that
    tet ``type * r^3 + cell`` has corner k at vertex
    ``(i+di, j+dj, k+dk)`` for cell origin (i, j, k) — verified against
    the actual tets array — or None when the grid is not that lattice
    (loaded .tet files, carved/subdivided topologies).
    """
    r = grid.resolution
    if r < 1:
        return None
    n = r + 1
    tets = np.asarray(grid.tets, np.int64)
    if tets.shape[0] != 6 * r**3:
        return None
    ii, jj, kk = np.meshgrid(
        np.arange(r), np.arange(r), np.arange(r), indexing="ij"
    )
    cell_base = (ii * n * n + jj * n + kk).reshape(-1)  # (r^3,)
    offs = []
    for ty in range(6):
        block = tets[ty * r**3:(ty + 1) * r**3]  # (r^3, 4)
        delta = block - cell_base[:, None]
        if (delta != delta[0]).any():
            return None
        enc = delta[0]  # (4,)
        di, dj, dk = enc // (n * n), (enc // n) % n, enc % n
        if not (
            ((di == 0) | (di == 1)).all()
            and ((dj == 0) | (dj == 1)).all()
            and ((dk == 0) | (dk == 1)).all()
        ):
            return None
        offs.append(
            tuple(
                (int(di[k]), int(dj[k]), int(dk[k])) for k in range(4)
            )
        )
    return tuple(offs)


def build_grid_statics(
    resolution: int,
    grid: TetGrid | None = None,
    topology: Topology | None = None,
) -> GridStatics:
    """Build (or adopt) a grid + topology and lift to device arrays.

    Prefers the native C++ builders (deftet_tpu.native) — ~10x faster on
    large grids — with the numpy twins as fallback.
    """
    if grid is None:
        grid = build_tet_grid(resolution)
    if topology is None:
        # Regular Kuhn grid -> class-major padded face layout, enabling
        # the shifted-slice boundary/edge fast paths (tetgrid.
        # lattice_faces); the gather paths stay correct on it too.
        try:
            from ..tetgrid.lattice_faces import build_lattice_topology

            topology = build_lattice_topology(grid)
        except Exception:
            topology = None
    if topology is None:
        try:
            from ..native import build_topology_native, native_available

            if native_available():
                topology = build_topology_native(grid.tets, grid.n_vertices)
        except Exception:
            topology = None
        if topology is None:
            topology = build_topology(grid.tets, grid.n_vertices)
    init_pos = grid.centered_vertices().astype(np.float32)
    init_pos_j = jnp.asarray(init_pos)
    tet_tx4 = jnp.asarray(topology.tet_tx4)
    # Rest-pose inverse of the undeformed grid (deftet.py:300-318).
    rest = tet_rest_inverse(init_pos_j, tet_tx4)
    return GridStatics(
        init_pos_nx3=init_pos_j,
        pos_mask_nx3=jnp.asarray(grid.interior_mask.astype(np.float32)),
        tet_tx4=tet_tx4,
        face_fx3=jnp.asarray(topology.face_fx3),
        face_tet_fx2=jnp.asarray(topology.face_tet_fx2),
        edge_face_idx=jnp.asarray(topology.edge_face_idx),
        edge_face_mask=jnp.asarray(topology.edge_face_mask),
        face_edge_ids=jnp.asarray(topology.face_edge_ids),
        vert_face_inc_idx=jnp.asarray(topology.vert_face_inc_idx),
        vert_face_inc_mask=jnp.asarray(topology.vert_face_inc_mask),
        vert_tet_inc_idx=jnp.asarray(topology.vert_tet_inc_idx),
        vert_tet_inc_mask=jnp.asarray(topology.vert_tet_inc_mask),
        vert_adj_idx=jnp.asarray(topology.vert_adj_idx),
        vert_adj_mask=jnp.asarray(topology.vert_adj_mask),
        vert_degree=jnp.asarray(topology.vert_degree),
        rest_inverse_tx3x3=rest,
    )
