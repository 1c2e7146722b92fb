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
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    # q, k, v: [B, H, S, D]; bias broadcastable to [B, H, S, S]
    depth = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(depth).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx_probs = probs
    if dropout_rng is not None and dropout_rate > 0.0:
        # HF-style probs dropout (modeling_bert BertSelfAttention): applied
        # AFTER softmax, inverted scaling; returned probs stay pre-dropout
        # (matches HF's output_attentions contract)
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        ctx_probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", ctx_probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32
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
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    small_s_impl: Optional[str] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scaled dot-product attention over [B, H, S, D] tensors.

    ``attention_mask`` is the BERT-style [B, S] 1/0 key mask; it is converted
    to an additive bias exactly as HF does (0 -> -1e9 pre-softmax).
    With ``dropout_rng`` set, attention probs get inverted dropout at
    ``dropout_rate`` before the value matmul (HF BertSelfAttention's
    ``attention_probs_dropout_prob`` — train-mode only; callers pass None
    in eval). Probs dropout needs materialized probs, so it forces the XLA
    path (flash never materializes them).
    Returns ``(context [B,H,S,D], probs [B,H,S,S] or None)``.
    """
    bias = None
    if attention_mask is not None:
        neg = jnp.asarray(-1e9, dtype=jnp.float32)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

    drop = dropout_rng is not None and dropout_rate > 0.0
    if impl == "flash" and not return_probs and not drop:
        from simxns_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, attention_mask,
                               small_s_impl=small_s_impl), None
    return _xla_attention(q, k, v, bias, return_probs=return_probs,
                          dropout_rate=dropout_rate if drop else 0.0,
                          dropout_rng=dropout_rng if drop else None)
