"""Cross-device embedding gathers for global in-batch negatives.

The reference shares embeddings across ranks so the contrastive softmax sees
``world_size x`` negatives, with a specific *gradient contract*: remote shards
are detached and the local slot is replaced by the live local tensor, so the
denominator is global but gradients flow only through local examples
(``MASTER/pretrain/modeling.py:402-410``, ``LEAD/util.py:200-204``,
``PROD/ProD_KD/run_progressive_distill_marco.py:373-425``, SURVEY.md §2.8).

TPU-native version: one ``jax.lax.all_gather`` over the ICI ``data`` axis,
with ``stop_gradient`` on the gathered copy and the local (grad-carrying)
shard spliced back in. These helpers must run under an axis binding —
``jax.shard_map`` over the mesh, which is how the training steps use them.

Two modes:

- ``local`` — reproduces the reference contract exactly (grad through the
  local shard only). Under SPMD each device computes grads for its own shard
  and the optimizer's ``psum`` over data-parallel grads recovers the reference
  DDP semantics bit-for-bit.
- ``full``  — gradients flow through remote shards too (mathematically the
  "true" global contrastive gradient). Strictly more signal; on TPU it costs
  one extra ``psum_scatter`` in the backward pass. This is the recommended
  default for new training runs; ``local`` exists for parity reproduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_full_grad(x: jax.Array, axis_name: str) -> jax.Array:
    """All-gather along ``axis_name`` with gradients to every shard.

    [B, ...] per device -> [D*B, ...] with the device-major order the
    reference produces (rank 0's batch first).
    """
    g = jax.lax.all_gather(x, axis_name, axis=0, tiled=False)
    return g.reshape((-1,) + x.shape[1:])


def all_gather_local_grad(x: jax.Array, axis_name: str) -> jax.Array:
    """All-gather along ``axis_name``; gradients flow only into the local shard.

    Reproduces the detach-remote / splice-local pattern of the reference
    (``MASTER/pretrain/modeling.py:402-410``). The gathered copy is
    stop-gradiented and the caller's live ``x`` is written into its own slot,
    so d(out)/d(x) is an identity on the local block and zero elsewhere.
    """
    g = jax.lax.stop_gradient(jax.lax.all_gather(x, axis_name, axis=0, tiled=False))
    idx = jax.lax.axis_index(axis_name)
    g = jax.lax.dynamic_update_index_in_dim(g, x, idx, 0)
    return g.reshape((-1,) + x.shape[1:])


def gather_in_batch_negatives(
    x: jax.Array, axis_name: str, grad_mode: str = "full"
) -> jax.Array:
    if grad_mode == "full":
        return all_gather_full_grad(x, axis_name)
    if grad_mode == "local":
        return all_gather_local_grad(x, axis_name)
    raise ValueError(f"grad_mode must be 'full' or 'local', got {grad_mode!r}")


def gather_positive_offsets(
    local_positions: jax.Array, local_batch: int, axis_name: str
) -> jax.Array:
    """Shift local positive indices into the gathered (global) index space.

    The reference builds ``positive_idx_per_question`` by offsetting each
    rank's indices by the number of contexts gathered before it
    (``PROD/ProD_KD/run_progressive_distill_marco.py:387-425``). Under SPMD
    the same thing is one ``axis_index`` multiply.
    """
    rank = jax.lax.axis_index(axis_name)
    return local_positions + rank * local_batch
