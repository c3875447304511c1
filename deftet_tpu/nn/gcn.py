"""Graph-convolutional vertex-offset decoder (flax).

Re-architecture of layers/gcn_decoder.py.  The reference's row-normalized
torch.sparse adjacency matmul (sparse_batch_matmul, matrix_utils.py:22-33)
becomes a padded neighbor gather + masked mean — static shapes, no sparse
tensors, shards trivially under pjit.

Structure mirrored bit-for-intent:
  GraphConv        — self_filter(x) + filter(adj @ x)          (:31-62)
  GraphConvLayer   — relu applied BEFORE the conv              (:81-85)
  GraphConvBlock   — two layers + linear shortcut residual      (:90-129)
  GCNMLPDecoder    — Linear(in->h0) -> blocks over
                     gcn_hidden [256, 256, 128] -> MLP head
                     [128, drop 0.2, 64] -> Dense(3)            (:244-330,
                     dims from pc_model.py:86-95)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

from ..losses.geometry import neighbor_mean


@dataclasses.dataclass(frozen=True)
class VertexAdjacency:
    """Static row-normalized vertex adjacency (padded form).

    Built from tetgrid.topology.build_vertex_adjacency; hashable by id so it
    can ride on a flax Module as a static field.
    """

    idx: jnp.ndarray   # (N, M) int32
    mask: jnp.ndarray  # (N, M) float32
    degree: jnp.ndarray  # (N,) int32

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def matmul(self, x_bxnxd: jnp.ndarray) -> jnp.ndarray:
        return neighbor_mean(x_bxnxd, self.idx, self.mask, self.degree)


@dataclasses.dataclass(frozen=True)
class LatticeAdjacency:
    """Row-normalized vertex adjacency of a REGULAR tet lattice as a
    shift-stencil — the TPU-native fast path.

    On the standard Kuhn 6-tet grid every interior vertex has the same 14
    neighbor offsets, so `adj @ x` is a fixed stencil over the (n, n, n)
    vertex lattice: 14 shifted adds (pure VPU, zero gather traffic)
    instead of a padded (B, N, M, C) gather that materializes gigabytes at
    production sizes.  Boundary rows are handled by zero padding + the
    true per-vertex degree.
    """

    offsets: tuple      # ((dx, dy, dz), ...) static python ints
    degree: jnp.ndarray  # (N,) int32 true vertex degrees

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def matmul(self, x_bxnxd: jnp.ndarray) -> jnp.ndarray:
        b, n_verts, c = x_bxnxd.shape
        n = round(n_verts ** (1.0 / 3.0))
        while n**3 < n_verts:
            n += 1
        assert n**3 == n_verts, (n, n_verts)
        from ..ops.nearest import _use_pallas_auto
        from ..ops.stencil_pallas import stencil_fits_vmem

        itemsize = jnp.dtype(x_bxnxd.dtype).itemsize
        if (
            c >= 64 and _use_pallas_auto()
            and stencil_fits_vmem(n, itemsize=itemsize)
        ):
            # VMEM-resident masked-shift kernel; the XLA depthwise conv
            # below measured ~40x off the VPU roofline at production
            # sizes.  Storage keeps x's dtype (precision config honored).
            from ..ops.stencil_pallas import lattice_neighbor_mean

            inv_deg = 1.0 / jnp.maximum(self.degree, 1).astype(jnp.float32)
            # Kernel output is already x's dtype with the inv_deg scale
            # applied in-kernel (f32 accumulation) — same activation
            # dtype as the conv fallback.
            return lattice_neighbor_mean(
                x_bxnxd, inv_deg, n,
                tuple(tuple(o) for o in self.offsets),
            )
        xg = x_bxnxd.reshape(b, n, n, n, c)
        # one depthwise 3x3x3 conv (binary stencil kernel) instead of 14
        # pad+shift ops — the step is op-count-bound at production sizes
        kern = np.zeros((3, 3, 3), np.float32)
        for dx, dy, dz in self.offsets:
            # output[i] sums input[i + off] => kernel tap at (1 - off)
            kern[1 - dx, 1 - dy, 1 - dz] = 1.0
        kern = jnp.asarray(kern, x_bxnxd.dtype)
        rhs = jnp.broadcast_to(kern[..., None, None], (3, 3, 3, 1, c))
        out = jax.lax.conv_general_dilated(
            xg, rhs, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )
        out = out.reshape(b, n_verts, c)
        deg = jnp.maximum(self.degree, 1).astype(x_bxnxd.dtype)
        return out / deg[None, :, None]


class GraphConv(nn.Module):
    out_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x_bxnxd, adj: VertexAdjacency):
        self_term = nn.Dense(
            self.out_dim, name="self_filter", dtype=self.dtype
        )(x_bxnxd)
        nbr_term = nn.Dense(
            self.out_dim, name="filter", dtype=self.dtype
        )(adj.matmul(x_bxnxd))
        return self_term + nbr_term


class GraphConvLayer(nn.Module):
    out_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x_bxnxd, adj: VertexAdjacency):
        return GraphConv(self.out_dim, dtype=self.dtype)(
            nn.relu(x_bxnxd), adj
        )


class GraphConvBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x_bxnxd, adj: VertexAdjacency):
        net = GraphConvLayer(self.hidden_dim, dtype=self.dtype)(x_bxnxd, adj)
        dx = GraphConvLayer(self.out_dim, dtype=self.dtype)(net, adj)
        if x_bxnxd.shape[-1] == self.out_dim:
            shortcut = x_bxnxd
        else:
            shortcut = nn.Dense(
                self.out_dim, name="shortcut", dtype=self.dtype
            )(x_bxnxd)
        return shortcut + dx


class GCNMLPDecoder(nn.Module):
    """GCN + conv-MLP head producing per-vertex outputs (e.g. 3D offsets)."""

    gcn_hidden: Sequence[int] = (256, 256, 128)
    mlp_hidden: Sequence[float] = (128, 0.2, 64)
    out_dim: int = 3
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        feat_bxnxd,
        adj: VertexAdjacency,
        train: bool = True,
    ):
        x = nn.Dense(
            self.gcn_hidden[0], name="initial", dtype=self.dtype
        )(feat_bxnxd)
        for i in range(len(self.gcn_hidden) - 1):
            x = GraphConvBlock(
                hidden_dim=self.gcn_hidden[i],
                out_dim=self.gcn_hidden[i + 1],
                dtype=self.dtype,
            )(x, adj)
        for h in self.mlp_hidden:
            if h < 1:  # dropout probability slot (pv_utils.py:36-39)
                x = nn.Dropout(rate=float(h), deterministic=not train)(x)
            else:
                x = nn.Dense(int(h), dtype=self.dtype)(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype,
                )(x)
                x = nn.relu(x)
        out = nn.Dense(self.out_dim, name="head", dtype=self.dtype)(x)
        return out.astype(jnp.float32)
