"""Per-point MLP decoder (occupancy head).

Mirrors create_mlp_components(classifier=True, dim=2) from
layers/pv_utils.py:23-53 as used for the occupancy decoder at
layers/pc_model.py:100-104: SharedMLP(Dense+BN+ReLU) for each integer
entry, Dropout for each fractional entry, then a bare Dense classifier.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLPDecoder(nn.Module):
    # Reference occupancy head: [256, .2, 256, .2, 128, .2, 64] -> 1
    hidden: Sequence[float] = (256, 0.2, 256, 0.2, 128, 0.2, 64)
    out_dim: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x_bxnxd, train: bool = True):
        for h in self.hidden:
            if h < 1:
                x_bxnxd = nn.Dropout(
                    rate=float(h), deterministic=not train
                )(x_bxnxd)
            else:
                x_bxnxd = nn.Dense(int(h), dtype=self.dtype)(x_bxnxd)
                x_bxnxd = nn.BatchNorm(
                    dtype=self.dtype,
                    use_running_average=not train, momentum=0.9, epsilon=1e-5
                )(x_bxnxd)
                x_bxnxd = nn.relu(x_bxnxd)
        out = nn.Dense(
            self.out_dim, name="classifier", dtype=self.dtype
        )(x_bxnxd)
        return out.astype(jnp.float32)
