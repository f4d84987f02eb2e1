"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel (Lightning DDPStrategy,
main.py:64-69). The TPU-native equivalent: a 1-D `data` mesh; one scene per
device; gradient/metric reduction via `lax.pmean` over the mesh (XLA emits the
ICI all-reduces). SyncBN == BatchNorm with `axis_name='data'`.

A second `view` axis (sharding the N cameras of one scene) is the natural
scale-out axis for this workload and is exercised by the view-sharded forward
in train/loop.py.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("data",), shape=None):
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh, axis="data"):
    """Shard the leading (scene) axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())
