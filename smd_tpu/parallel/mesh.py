"""Device mesh and sharding utilities.

The reference is single-device ``jax.jit`` only (SURVEY.md §2 parallelism
table: no pmap/pjit/collectives anywhere). Here every training/sampling step
is jitted over a ``Mesh`` with two axes:

- ``data``: batch axis (DP). Gradient all-reduce rides ICI automatically via
  XLA SPMD once the batch carries a ``P('data', ...)`` sharding.
- ``model``: tensor-parallel axis (TP). The wide MLP kernels (mlp_dims=2048)
  shard over it; at parity scale (10-40M params) a single chip also holds the
  model, in which case the axis has size 1 and the rules are no-ops.

Collectives are emitted by the compiler from sharding constraints — there is
no hand-written communication here, which *is* the TPU-native equivalent of a
NCCL/MPI backend (SURVEY.md §5).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MeshConfig", "make_mesh", "batch_sharding", "replicated",
    "shard_params", "shard_batch", "shard_chunk", "initialize_distributed",
]


def initialize_distributed():
    """Multi-host bring-up: call once per process before building a mesh.

    On a multi-host TPU slice ``jax.distributed.initialize()`` picks the
    coordinator from the TPU environment automatically; on a single host it
    is a no-op. This (plus the mesh) *is* the TPU-native communication
    backend — XLA emits the ICI/DCN collectives (SURVEY.md §5).

    Explicit ``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` (+
    ``JAX_PROCESS_ID``) env vars start the distributed runtime on any
    backend — the 2-process CPU test in ``tests/test_multihost.py`` uses
    this to validate the full multi-host path without a TPU slice.
    """
    import os
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    elif int(os.environ.get("TPU_WORKER_COUNT", "1")) > 1:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_chunk(batches, mesh: Mesh):
    """Device-put a (K, batch, ...) stack of K step-batches.

    The scan (step) axis is leading and replicated; the per-step batch axis
    (dim 1) shards over 'data' exactly like ``shard_batch`` does for a
    single step's batch. Used by the scan-chunked train loop
    (``training/loop.py``), which fuses K optimizer steps per dispatch.
    """
    def put(x):
        sharding = NamedSharding(mesh, P(None, "data",
                                         *([None] * (x.ndim - 2))))
        if jax.process_count() > 1:
            global_shape = (x.shape[0], x.shape[1] * jax.process_count(),
                            *x.shape[2:])
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batches)


# Parameter partition rules: path-regex -> PartitionSpec. Kernels of the wide
# MLP layers split their output (or input) dim over 'model'; everything else
# replicates. Paths are '/'-joined pytree key paths.
_PARAM_RULES = (
    # FiLM/resblock/transformer-MLP wide kernels: shard the 2048 dim.
    (re.compile(r".*Dense_\d+/kernel$"), P(None, "model")),
    (re.compile(r".*Dense_\d+/bias$"), P("model")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(path, leaf, mesh: Mesh) -> P:
    """Partition spec for one parameter.

    A dim is sharded over 'model' only when divisible by the axis size; with
    model=1 everything replicates (single-chip case).
    """
    axis = mesh.shape["model"]
    if axis == 1:
        return P()
    name = _path_str(path)
    for pat, spec in _PARAM_RULES:
        if pat.match(name):
            # verify divisibility of the sharded dim
            dims = list(spec)
            ok = True
            for d, ax in enumerate(dims):
                if ax == "model" and (d >= leaf.ndim or
                                      leaf.shape[d] % axis != 0):
                    ok = False
            if ok and leaf.ndim == len(dims):
                return spec
    return P()


def shard_params(params, mesh: Mesh):
    """NamedSharding pytree for a parameter pytree under the mesh rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mesh)),
        params)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over 'data'.

    Single process: a plain sharded device_put. Multi-process: each host
    holds ``global_batch / process_count`` rows (the per-host dataset shard,
    ``data/pipeline.py``) and the global array is assembled from the
    process-local data — the standard JAX multi-host input pattern.
    """
    def put(x):
        sharding = batch_sharding(mesh, x.ndim)
        if jax.process_count() > 1:
            global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
