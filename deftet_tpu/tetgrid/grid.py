"""Tetrahedral grid generation and .tet file IO.

Reference behaviour being matched (not copied):
  * utils/dataloder_helper.py:30-69  — reads a quartet-generated ``.tet`` file
    covering [0,1]^3, snaps near-boundary coordinates to {0,1}, and returns an
    interior-vertex mask (vertices strictly inside may deform).
  * utils/tet_utils.py:378-400       — plain ``.tet`` reader.

Instead of shelling out to the external ``quartet`` binary, the default grid
is the Kuhn/Freudenthal split of each lattice cube into 6 tetrahedra around
the main diagonal, which is conforming (shared faces match exactly) across a
uniform grid.  Tetrahedra are re-oriented so the signed volume convention of
the loss stack (V = -det([A-D, B-D, C-D]) / 6 > 0, layers/DefTet/deftet.py:
239-263) holds for every rest tet.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# The 6 tetrahedra of the Kuhn subdivision of the unit cube, as corner
# indices into the (dx, dy, dz) binary corner ordering c = dx*4 + dy*2 + dz.
# All six share the main diagonal c000 -> c111.
_CUBE_TETS = np.array(
    [
        [0b000, 0b100, 0b110, 0b111],
        [0b000, 0b110, 0b010, 0b111],
        [0b000, 0b010, 0b011, 0b111],
        [0b000, 0b011, 0b001, 0b111],
        [0b000, 0b001, 0b101, 0b111],
        [0b000, 0b101, 0b100, 0b111],
    ],
    dtype=np.int64,
)


@dataclasses.dataclass
class TetGrid:
    """A static tetrahedral grid over [0,1]^3.

    Attributes:
      vertices: (N, 3) float64, in [0, 1]^3.
      tets: (T, 4) int32 vertex indices.
      interior_mask: (N, 3) float32; 1 where the coordinate may deform
        (strictly inside the box), 0 on the box boundary.  Mirrors
        utils/dataloder_helper.py:64-68.
      resolution: cells per axis (0 if loaded from file).
    """

    vertices: np.ndarray
    tets: np.ndarray
    interior_mask: np.ndarray
    resolution: int = 0

    @property
    def n_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def n_tets(self) -> int:
        return int(self.tets.shape[0])

    def centered_vertices(self) -> np.ndarray:
        """Vertices shifted to [-0.5, 0.5]^3 (train_multigpu.py:66-67)."""
        return self.vertices - 0.5


def _signed_volume(verts: np.ndarray, tets: np.ndarray) -> np.ndarray:
    """V = -det([A-D, B-D, C-D]) / 6 per tet (deftet.py:247-253 convention)."""
    p = verts[tets]  # (T, 4, 3)
    a = p[:, 0] - p[:, 3]
    b = p[:, 1] - p[:, 3]
    c = p[:, 2] - p[:, 3]
    det = np.einsum("ti,ti->t", a, np.cross(b, c))
    return -det / 6.0


def orient_tets(verts: np.ndarray, tets: np.ndarray) -> np.ndarray:
    """Swap two vertices of any tet with negative convention-volume."""
    tets = np.asarray(tets, dtype=np.int64).copy()
    vol = _signed_volume(verts, tets)
    flip = vol < 0
    tets[flip, 0], tets[flip, 1] = tets[flip, 1].copy(), tets[flip, 0].copy()
    return tets


def boundary_vertex_mask(vertices: np.ndarray, spacing: float) -> np.ndarray:
    """Snap near-boundary coords to {0,1} in-place; return interior mask.

    Mirrors utils/dataloder_helper.py:64-68: coordinates within spacing/4 of
    the box walls are clamped onto the wall and frozen.
    """
    vertices[vertices <= (0 + spacing / 4.0)] = 0.0
    vertices[vertices >= (1 - spacing / 4.0)] = 1.0
    mask = np.logical_and(vertices < 1, vertices > 0)
    return mask.astype(np.float32)


def build_tet_grid(resolution: int) -> TetGrid:
    """Build a conforming 6-tets-per-cube grid with `resolution` cells/axis."""
    r = int(resolution)
    assert r >= 1
    n = r + 1
    # Vertex (i, j, k) -> index i*n*n + j*n + k; coordinates (i, j, k)/r.
    grid = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    vertices = grid.astype(np.float64) / r

    # Cube origins (i, j, k) for i,j,k in [0, r).
    ii, jj, kk = np.meshgrid(
        np.arange(r), np.arange(r), np.arange(r), indexing="ij"
    )
    origins = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)  # (r^3, 3)
    # Corner offsets in (dx, dy, dz) binary order.
    corner_off = np.array(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], dtype=np.int64
    )
    corner_idx = (
        (origins[:, None, 0] + corner_off[None, :, 0]) * n * n
        + (origins[:, None, 1] + corner_off[None, :, 1]) * n
        + (origins[:, None, 2] + corner_off[None, :, 2])
    )  # (r^3, 8)
    # Type-major ordering (tet t = type * r^3 + cell): every tet of a type
    # is the same vertex-offset pattern translated across cells, so device
    # code can read tet corners as shifted slices of the vertex lattice
    # instead of random gathers (losses.geometry.gather_tet_soa_lattice).
    tets = (
        corner_idx[:, _CUBE_TETS]        # (r^3, 6, 4)
        .transpose(1, 0, 2)
        .reshape(-1, 4)
    )
    tets = orient_tets(vertices, tets)

    mask = boundary_vertex_mask(vertices, 1.0 / r)
    return TetGrid(
        vertices=vertices,
        tets=tets.astype(np.int32),
        interior_mask=mask,
        resolution=r,
    )


def read_tet_file(path: str, snap_spacing: float | None = None) -> TetGrid:
    """Read a quartet-format ``.tet`` file (utils/tet_utils.py:378-400).

    Format: header ``tet <n_vert> <n_tet>`` followed by vertex lines
    (3 floats) and tet lines (4 ints).
    """
    with open(path, "r") as f:
        header = f.readline().strip().split()
        n_vert, n_tet = int(header[1]), int(header[2])
        vertices = np.loadtxt(f, max_rows=n_vert, dtype=np.float64)
        tets = np.loadtxt(f, max_rows=n_tet, dtype=np.int64)
    vertices = vertices.reshape(n_vert, 3)
    tets = tets.reshape(n_tet, 4)
    assert tets.shape[0] == n_tet
    tets = orient_tets(vertices, tets)
    if snap_spacing is None:
        # Estimate lattice spacing from the minimum positive coordinate gap.
        uniq = np.unique(vertices[:, 0])
        gaps = np.diff(uniq)
        snap_spacing = float(gaps[gaps > 1e-9].min()) if gaps.size else 1.0
    mask = boundary_vertex_mask(vertices, snap_spacing)
    return TetGrid(
        vertices=vertices, tets=tets.astype(np.int32), interior_mask=mask
    )


def save_tet_file(grid: TetGrid, path: str) -> None:
    with open(path, "w") as f:
        f.write("tet %d %d\n" % (grid.n_vertices, grid.n_tets))
        for v in grid.vertices:
            f.write("%f %f %f\n" % (v[0], v[1], v[2]))
        for t in grid.tets:
            f.write("%d %d %d %d\n" % (t[0], t[1], t[2], t[3]))
