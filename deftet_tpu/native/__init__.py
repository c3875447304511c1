"""Native (C++) runtime components, loaded via ctypes.

The reference ships its topology builders as `g++ -shared` .so's loaded
with ctypes (utils/lib/*/do_all.sh + interface.py); this package does the
same but compiles on first use into a cache directory, and every entry
point has a numpy twin in ``tetgrid.topology`` (used as the golden oracle
in tests and as the fallback when no compiler is available).
"""

from .build import load_library, native_available
from .topology import (
    build_faces_native,
    build_vertex_adjacency_native,
    build_tet_neighbors_native,
    build_edge_face_pairs_native,
    collapse_vertices_native,
    build_topology_native,
)

__all__ = [
    "load_library",
    "native_available",
    "build_faces_native",
    "build_vertex_adjacency_native",
    "build_tet_neighbors_native",
    "build_edge_face_pairs_native",
    "collapse_vertices_native",
    "build_topology_native",
]
