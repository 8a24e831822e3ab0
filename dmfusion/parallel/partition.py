"""Tensor-parallel parameter partitioning.

The reference has no model parallelism (single device, SURVEY.md §2.3);
this is TPU-native design headroom: with ``mesh.model > 1`` every weight
matrix whose output (minor-most) dimension divides the 'model' axis is
column-sharded Megatron-style, biases/norm scales replicate, and XLA's
SPMD partitioner inserts the activation all-gathers/reduce-scatters over
ICI.  Combined with batch sharding over 'data' this gives dp x tp without
touching model code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_partition_specs(params, mesh: Mesh):
    """Column-shard >=2-D kernels over 'model' when divisible; replicate
    the rest."""
    model_ax = mesh.shape.get("model", 1)

    def spec(leaf):
        if (model_ax > 1 and np.ndim(leaf) >= 2
                and leaf.shape[-1] % model_ax == 0):
            return P(*([None] * (np.ndim(leaf) - 1) + ["model"]))
        return P()

    return jax.tree.map(spec, params)


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to
    :func:`param_partition_specs`."""
    specs = param_partition_specs(params, mesh)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)
