"""deftet_tpu — a TPU-native deformable-tetrahedral-mesh 3D reconstruction framework.

A ground-up JAX / XLA / Pallas re-architecture of the capabilities of
nv-tlabs/DefTet ("Learning Deformable Tetrahedral Meshes for 3D
Reconstruction", NeurIPS 2020):

* ``tetgrid``  — static tetrahedral grid topology (host-side numpy builders
  producing dense index arrays; replaces the reference's CUDA/C++ adjacency
  builders and torch.sparse matrices).
* ``ops``      — TPU compute kernels (XLA + Pallas): point-in-tet queries,
  point-in-mesh sign tests, analytic point-to-mesh distance with custom VJP,
  nearest neighbour, voxelization / trilinear devoxelization, and the
  depth-peeled differentiable tet-face rasterizer.
* ``nn``       — flax modules: PVCNN point-voxel encoder, GCN vertex-offset
  decoder, occupancy MLP decoder, DISN image branch.
* ``losses``   — geometric losses over the tet grid (volume variance, AMIPS,
  edge length, Laplacian, masked surface alignment / Chamfer / normal).
* ``train``    — jit/pjit training engine with orbax checkpointing.
* ``eval``     — metrics (IoU, F-score, Chamfer, Chamfer-L1, Hausdorff) and
  the evaluation harness.
* ``render``   — 2D-supervision stack: camera, differentiable depth-peeling
  renderer, alpha compositing, tet carving and subdivision optimizer.
* ``data``     — offline preprocessing + procedural shape datasets.
* ``parallel`` — SPMD helpers (jax.sharding.Mesh data-parallel training).
"""

__version__ = "0.1.0"
