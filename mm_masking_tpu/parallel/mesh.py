"""Device mesh + sharding helpers.

The reference has no distributed training at all (SURVEY.md §2.4) — one GPU,
bash-level process fan-out for data generation. The TPU-native equivalent is a
1-D data-parallel mesh: the batch is sharded over the ``data`` axis, parameters
are replicated, and every cross-sample reduction (gradient sums, the policy's
batch-global minmax normalization) becomes an XLA collective over ICI inserted
automatically by GSPMD — the code is written against the *global* batch.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` local devices (-1 = all)."""
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of (B, …) arrays with the batch axis sharded.

    Arrays whose leading dimension doesn't divide the mesh (small validation
    remainders, scalars) are replicated instead — GSPMD still computes the
    correct global result, just without spreading those arrays.
    """
    n = mesh.shape[axis_name]
    sharded = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)

    def put(x):
        shape = getattr(x, "shape", ())
        if len(shape) > 0 and shape[0] % n == 0:
            return jax.device_put(x, sharded)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_axis(tree, mesh: Mesh, axis: int = 1, axis_name: str = "data"):
    """Device-put a pytree with dimension ``axis`` sharded over the mesh.

    The chunked-sequence runners batch frames as (n_chunks, batch, …) and
    run ONE fused program over the chunk axis — sharding the *batch* axis
    (axis=1) lets that single program stay fused while every chip localizes
    its own slice of each chunk. Leaves whose target dimension is missing
    or doesn't divide the mesh are replicated (GSPMD still computes the
    correct global result).
    """
    n = mesh.shape[axis_name]
    repl = replicated(mesh)

    def put(x):
        shape = getattr(x, "shape", ())
        if len(shape) > axis and shape[axis] % n == 0:
            spec = [None] * len(shape)
            spec[axis] = axis_name
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, tree)
