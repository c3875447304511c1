"""Device mesh + sharding helpers.

The reference's full parallelism story is single-process data parallelism
over NCCL (nn.DataParallel, train_multigpu.py:136-140), with ragged GT
meshes manually list-sharded per device (parallel.py:162-171) and sparse
adjacencies rebuilt per replica (matrix_utils.py:49-59).  The TPU-native
equivalent collapses all of that into one SPMD program: a 1-D ``data`` mesh
over ICI, batches sharded on dim 0, parameters/topology replicated, and the
gradient ``psum`` inserted automatically by XLA when `jax.jit` runs under
sharding constraints (SURVEY.md §2.3).

Because every tensor in the rebuilt pipeline is statically shaped (padded GT
meshes instead of python lists), there is nothing to special-case: the same
jitted train step runs on 1 chip or N chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis: str = DATA_AXIS,
    batch_size: Optional[int] = None,
) -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices.

    When `batch_size` is given, uses the largest device count that divides
    it (a batch of 2 on an 8-chip host trains on 2 chips rather than
    failing — the analogue of DataParallel's device_count clamp).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host batch dict onto the mesh, sharded along dim 0."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / topology arrays) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
