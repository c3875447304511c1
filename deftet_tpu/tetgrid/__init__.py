"""Static tetrahedral grid: generation, IO, and host-side topology builders.

The reference (nv-tlabs/DefTet) derives its grid from an external `quartet`
binary and builds adjacency structures with CUDA/C++ helpers
(utils/lib/tet_point_adj, tet_face_adj, tet_adj_share; utils/tet_utils.py).
Here the grid is generated directly (Kuhn/Freudenthal 6-tet cube split, which
is conforming across a uniform lattice) or read from a ``.tet`` file, and all
topology becomes dense index arrays precomputed once on host — the form XLA
gathers/segment-ops want, instead of torch.sparse matrices.
"""

from .grid import (
    TetGrid,
    build_tet_grid,
    read_tet_file,
    save_tet_file,
    boundary_vertex_mask,
)
from .topology import (
    FACE_IDX,
    TET_EDGES,
    build_faces,
    hull_face_owners,
    build_vertex_adjacency,
    build_tet_neighbors,
    build_face_edge_incidence,
    Topology,
    build_topology,
)
from .subdivide import subdivide_tets, delete_tets

__all__ = [
    "TetGrid",
    "build_tet_grid",
    "read_tet_file",
    "save_tet_file",
    "boundary_vertex_mask",
    "FACE_IDX",
    "TET_EDGES",
    "build_faces",
    "hull_face_owners",
    "build_vertex_adjacency",
    "build_tet_neighbors",
    "build_face_edge_incidence",
    "Topology",
    "build_topology",
    "subdivide_tets",
    "delete_tets",
]
