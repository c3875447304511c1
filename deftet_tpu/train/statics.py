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
    edge_pair_fa: jnp.ndarray       # (P,) int32 faces sharing an edge
    edge_pair_fb: jnp.ndarray       # (P,) int32
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


def build_grid_statics(
    resolution: int,
    grid: TetGrid | None = None,
    topology: Topology | None = None,
) -> GridStatics:
    """Build (or adopt) a grid + topology and lift to device arrays."""
    if grid is None:
        grid = build_tet_grid(resolution)
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
        edge_pair_fa=jnp.asarray(topology.edge_pair_fa),
        edge_pair_fb=jnp.asarray(topology.edge_pair_fb),
        vert_adj_idx=jnp.asarray(topology.vert_adj_idx),
        vert_adj_mask=jnp.asarray(topology.vert_adj_mask),
        vert_degree=jnp.asarray(topology.vert_degree),
        rest_inverse_tx3x3=rest,
    )
