"""Tensor-parallel parameter sharding over the mesh ``model`` axis.

The reference never needs TP at BERT-base scale (SURVEY.md §2.2), but the
mesh carries a ``model`` axis so larger towers (ERNIE-large rerankers and
beyond) can shard. This module assigns Megatron-style PartitionSpecs by
parameter path — XLA then inserts the TP collectives from the shardings
alone (no model-code changes):

- attention q/k/v kernels [H, H]           -> shard output dim  (column)
- attention output kernel [H, H]           -> shard input dim   (row)
- FFN intermediate kernel [H, 4H] (+bias)  -> shard output dim  (column)
- FFN output kernel [4H, H]                -> shard input dim   (row)
- MLM decoder / vocab projections [H, V]   -> shard vocab dim
- embeddings, LayerNorms, heads            -> replicated

Column-parallel biases are sharded with their kernels; row-parallel biases
stay replicated (added after the psum XLA inserts).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simxns_tpu.parallel.mesh import MODEL_AXIS

_COLUMN_KERNELS = ("query", "key", "value", "intermediate")
_ROW_KERNELS = ("output",)          # attention output + FFN output


def _spec_for(path, leaf) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    if leaf.ndim < 1:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    last = names[-1]
    # embeddings and layer norms replicate
    if "embedding" in last or "layer_norm" in parent or "layer_norm" in last:
        return P()
    if last == "kernel" and leaf.ndim == 2:
        if parent in _COLUMN_KERNELS:
            return P(None, MODEL_AXIS)
        if parent in _ROW_KERNELS:
            return P(MODEL_AXIS, None)
        if parent == "decoder":          # MLM vocab projection
            return P(None, MODEL_AXIS)
        return P()
    if last == "bias" and leaf.ndim == 1 and (
            parent in _COLUMN_KERNELS or parent == "decoder"):
        # column-parallel biases shard with their kernels — incl. the MLM
        # decoder's [V] bias (a replicated bias added to vocab-sharded
        # logits would force a reshard on the pretrain hot path)
        return P(MODEL_AXIS)
    return P()


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a param tree (use as jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)),
        params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put a param tree with TP shardings applied."""
    return jax.device_put(params, tp_param_shardings(params, mesh))
