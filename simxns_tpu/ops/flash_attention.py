"""Pallas flash-attention kernel (TPU).

Blocked online-softmax attention that never materializes the [S, S] score
matrix in HBM — the TPU replacement for the reference's CUDA attention
(SURVEY.md §2.1 "PyTorch CUDA kernels"). At SimXNS sequence lengths (<=192)
XLA attention is already near-roofline, so this kernel matters most for the
corpus-encode phase where batch x seq is large and HBM traffic dominates.

Until the Pallas kernel lands (build plan §7.3 step 6), this falls back to
the fused-XLA path so ``attention_impl='flash'`` is always safe to enable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    from simxns_tpu.ops.attention import _xla_attention

    bias = None
    if attention_mask is not None:
        neg = jnp.asarray(-1e9, dtype=jnp.float32)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
    out, _ = _xla_attention(q, k, v, bias, return_probs=False)
    return out
