"""Device mesh + sharding rules.

The reference's entire distribution story is NCCL DDP (SURVEY §2.6):
torchrun + DistributedSampler + implicit gradient all-reduce
(ref:scripts/train_unet.py:224, latentsync/utils/util.py:213-223,310-318).
Here the equivalent is one `jax.sharding.Mesh` with a `data` axis —
gradients sync because the loss is a psum over sharded batches, emitted
by XLA over ICI. A `model` axis adds tensor parallelism beyond the
reference (useful for large-batch serving): attention/MLP kernels are
sharded on their output-feature dim and XLA inserts the all-gathers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
    devices: Optional[Sequence] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices and len(devices) < n_devices:
            # the axon bootstrap pins the default backend to the single
            # tunneled TPU; fall back to the (forceable) host platform
            devices = jax.devices("cpu")
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/window) axis across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_tp_sharding(mesh: Mesh, params, model_axis: str = "model"):
    """Tensor-parallel param layout: shard the output-feature (last) dim of
    every kernel that divides the model axis; replicate the rest.

    This covers attention q/k/v/out and MLP projections — the layers that
    dominate parameter bytes — without per-layer annotations. XLA inserts
    the matching collectives when activations cross shardings.
    """
    tp = mesh.shape[model_axis]

    def rule(p):
        if p.ndim >= 2 and p.shape[-1] % tp == 0 and p.shape[-1] >= tp * 8:
            spec = [None] * p.ndim
            spec[-1] = model_axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_tree(tree, shardings):
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
