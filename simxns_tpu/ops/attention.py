"""Multi-head attention compute op.

Replaces the reference's PyTorch/CUDA attention (HF ``BertSelfAttention``,
invoked from every model in SimXNS — SURVEY.md §2.1). Two implementations
behind one interface:

- ``impl='xla'``   — plain jnp einsum softmax attention. XLA already fuses the
  bias-add/softmax chain into the matmuls; at the reference's sequence lengths
  (32-192, SURVEY.md §5.7) this is close to the roofline on the MXU.
- ``impl='flash'`` — Pallas blocked flash-attention kernel
  (:mod:`simxns_tpu.ops.flash_attention`) for longer sequences / lower HBM
  traffic; numerically identical up to fp accumulation order.

The op also optionally returns the post-softmax attention probabilities,
which LEAD's attention-map distillation losses consume
(``LEAD/util.py:467-537``). When probabilities are requested we always take
the XLA path (flash attention never materializes them by design).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    *,
    return_probs: bool,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    # q, k, v: [B, H, S, D]; bias broadcastable to [B, H, S, S]
    depth = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(depth).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return out, (probs if return_probs else None)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    impl: str = "xla",
    return_probs: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scaled dot-product attention over [B, H, S, D] tensors.

    ``attention_mask`` is the BERT-style [B, S] 1/0 key mask; it is converted
    to an additive bias exactly as HF does (0 -> -1e9 pre-softmax).
    Returns ``(context [B,H,S,D], probs [B,H,S,S] or None)``.
    """
    bias = None
    if attention_mask is not None:
        neg = jnp.asarray(-1e9, dtype=jnp.float32)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

    if impl == "flash" and not return_probs:
        from simxns_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, attention_mask), None
    return _xla_attention(q, k, v, bias, return_probs=return_probs)
