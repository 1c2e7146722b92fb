"""Device mesh and sharding helpers.

The reference (microsoft/SimXNS) trains with NCCL DDP over 8 GPUs — pure data
parallelism plus ad-hoc cross-rank embedding gathers (SURVEY.md §2.2, §2.8).
On TPU all of that collapses into one SPMD program over a ``jax.sharding.Mesh``:

- the ``data`` axis carries the per-step batch (DP) and the corpus shards of
  the MIPS index (the FAISS ``co.shard=True`` equivalent,
  ``SimANS/wiki/co_training_generate_new_train_wiki.py:322-328``);
- a ``model`` axis is laid out up front so tensor parallelism can be enabled
  later without re-plumbing (the reference never needs it at BERT-base scale).

Everything here is plain ``jax.sharding`` — collectives are inserted by XLA
from the sharding annotations and ride ICI.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
REPLICA_AXIS = "replica"     # multi-slice (DCN) outer axis; absent on 1-slice


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    With ``n_data=None`` all devices not consumed by ``n_model`` go to the
    data axis. On a single chip this degenerates to a 1x1 mesh so every code
    path is identical between 1-chip dev runs and v5e-8 production runs.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devs) % n_model != 0:
            raise ValueError(f"{len(devs)} devices not divisible by n_model={n_model}")
        n_data = len(devs) // n_model
    needed = n_data * n_model
    if needed > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs {needed} devices, have {len(devs)}")
    grid = np.asarray(devs[:needed]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def create_multislice_mesh(
    n_slices: int,
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(replica, data, model)`` mesh for multi-slice (DCN) pods.

    ``replica`` spans slices over DCN; ``data``/``model`` stay within a
    slice on ICI. The layout contract (scaling-book recipe): per-step
    gradient ``psum`` crosses DCN once, while everything bandwidth-hungry
    — index shards + search merges, in-batch-negative gathers in
    ``negatives_scope='slice'``, TP collectives — rides ICI, because
    those arrays shard only over the inner axes and are replicated over
    ``replica`` by construction.

    On real multi-slice TPU hardware devices are grouped by
    ``device.slice_index`` so the replica axis aligns with the physical
    DCN boundary; elsewhere (CPU mesh, single slice) any even split is
    used — semantics are identical, only collective cost differs.
    """
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) % n_slices != 0:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"n_slices={n_slices}")
    per_slice = len(devs) // n_slices
    slice_ids = {getattr(d, "slice_index", None) for d in devs}
    if len(slice_ids) == n_slices and None not in slice_ids:
        devs = sorted(devs, key=lambda d: (d.slice_index, d.id))
    if n_data is None:
        if per_slice % n_model != 0:
            raise ValueError(f"{per_slice} per-slice devices not divisible "
                             f"by n_model={n_model}")
        n_data = per_slice // n_model
    if n_data * n_model != per_slice:
        raise ValueError(f"per-slice mesh {n_data}x{n_model} != {per_slice} "
                         "devices per slice")
    grid = np.asarray(devs).reshape(n_slices, n_data, n_model)
    return Mesh(grid, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def dp_axes(mesh: Mesh):
    """The axis-name(s) the per-step batch is sharded over.

    ``('replica', 'data')`` on a multi-slice mesh, ``'data'`` otherwise.
    Valid both as a ``PartitionSpec`` entry and as a collective
    ``axis_name`` argument.
    """
    if REPLICA_AXIS in mesh.axis_names:
        return (REPLICA_AXIS, DATA_AXIS)
    return DATA_AXIS


def dp_size(mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if REPLICA_AXIS in mesh.axis_names:
        n *= mesh.shape[REPLICA_AXIS]
    return n


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over data parallelism (incl. the
    ``replica`` axis on multi-slice meshes); replicate the rest."""
    return NamedSharding(mesh, P(dp_axes(mesh), *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = dp_size(mesh)
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by dp={n}")
    return global_batch // n


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch dim sharded over ``data``.

    Accepts numpy or jax arrays; every leaf must share the same leading dim.
    """

    # single-device meshes use plain placement: a NamedSharding-carrying
    # arg flips jit into its sharded-executable path, which one relay
    # backend runs at host-stream speed for large-state programs (same
    # pathology as explicit in/out shardings — see steps._sharding_kwargs)
    if mesh.size == 1:
        dev = mesh.devices.reshape(-1)[0]

        def put(x):
            return jax.device_put(np.asarray(x), dev)
    else:
        def put(x):
            x = np.asarray(x)
            if x.ndim == 0:
                # scalars can't shard over a batch axis — replicate them
                return jax.device_put(x, replicated_sharding(mesh))
            return jax.device_put(x, batch_sharding(mesh, ndim=x.ndim))

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
