"""Device mesh helpers.

The reference's only distributed machinery is DDP training
(SURVEY.md §2.3: torch.distributed/NCCL all-reduce in the trainers);
the TPU-native equivalent is a (data, model) mesh with batch sharded
over 'data' and parameters replicated — XLA inserts the gradient
all-reduce over ICI. The 'model' axis exists for optional tensor
sharding of the widest layers when serving large batches.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if data is None:
        data = n // model
    assert data * model == n, f'{data}x{model} != {n} devices'
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-axis sharding.

    Rank-0 leaves (per-batch scalars such as the NK loader's
    'domain' label) have no batch axis to shard — they are placed
    replicated instead; device_put of a rank-0 array with a rank-1
    spec raises.
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh if np.ndim(x) else rep), batch)
