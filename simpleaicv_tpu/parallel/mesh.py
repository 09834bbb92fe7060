"""Device mesh + sharding helpers: the framework's entire communication layer.

Replaces the reference's NCCL plumbing (init_process_group / DistributedSampler /
DDP bucket allreduce / explicit all_reduce+barrier — reference
tools/train_classification_model.py:51-94, tools/scripts.py:18-25). Under SPMD
there are no explicit collectives in the training code at all: we lay out a
`jax.sharding.Mesh` with axes ``('data', 'fsdp')``, shard the global batch over
``data``, optionally shard parameters over ``fsdp`` (ZeRO-3-style, a capability
the reference lacks), and `jit` inserts the psum/all-gather/reduce-scatter over
ICI. Multi-host: call `jax.distributed.initialize` first and the same code runs
with DCN as the outer mesh dim.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    fsdp: int = 1
    # min number of elements before a param is sharded over fsdp
    fsdp_min_size: int = 2**16


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    fsdp = max(cfg.fsdp, 1)
    data = cfg.data if cfg.data > 0 else n // fsdp
    assert data * fsdp == n, f"mesh {data}x{fsdp} != {n} devices"
    return Mesh(devices.reshape(data, fsdp), ("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over every mesh axis (data*fsdp ways)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def infer_param_sharding(mesh: Mesh, params, min_size: int = 2**16):
    """ZeRO-3-style sharding: shard each large param's largest divisible dim
    over the ``fsdp`` axis; small params stay replicated. Returns a tree of
    NamedSharding matching ``params``."""
    fsdp = mesh.shape["fsdp"]

    def leaf_sharding(x):
        if fsdp == 1 or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % fsdp == 0:
                spec = [None] * x.ndim
                spec[d] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, params)


def shard_batch(mesh: Mesh, batch):
    """Place a host-global batch onto the mesh, sharded on the leading dim."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def num_devices() -> int:
    return jax.device_count()
