"""Contrastive retrieval losses.

Replaces the reference's duplicated NLL classes with two functions:

- :func:`in_batch_nll` — full in-batch dot-product NLL over (questions x all
  contexts), the ``BiEncoderNllLoss`` of ``SimANS/model/models.py:468-514``
  (and its ``_daya`` variant whose only difference is ``scores * 20``,
  ``models.py:531`` — expressed here as ``score_scale``).
- :func:`grouped_nll` — cross-entropy over a (N, M) score group with the
  positive at a fixed column, the reranker CE loss
  (``SimANS/wiki/co_training_wiki_train.py:236-256``) and the hard-negative
  grouped DE loss of PROD/MASTER.

All softmax math is f32 regardless of activation dtype (bf16 logits get
upcast) — the TPU replacement for apex AMP's autocast rules.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def similarity_scores(q_emb: jax.Array, ctx_emb: jax.Array,
                      score_scale: float = 1.0) -> jax.Array:
    """Dot-product score matrix [Q, C] in f32."""
    return score_scale * jnp.einsum(
        "qh,ch->qc", q_emb, ctx_emb, preferred_element_type=jnp.float32)


def in_batch_nll(
    q_emb: jax.Array,             # [Q, H]
    ctx_emb: jax.Array,           # [C, H] — all contexts (pos + negs, maybe gathered)
    positive_idx: jax.Array,      # [Q] int — index of each question's positive in ctx
    score_scale: float = 1.0,
    reduction: str = "mean",
) -> Tuple[jax.Array, jax.Array]:
    """In-batch negative NLL. Returns ``(loss, correct_count)``.

    ``correct_count`` mirrors the reference's ``is_correct`` bookkeeping
    (``models.py:497-505``): how many questions rank their positive first.
    """
    scores = similarity_scores(q_emb, ctx_emb, score_scale)
    logp = jax.nn.log_softmax(scores, axis=1)
    nll = -jnp.take_along_axis(logp, positive_idx[:, None], axis=1)[:, 0]
    preds = jnp.argmax(scores, axis=1)
    correct = jnp.sum((preds == positive_idx).astype(jnp.int32))
    if reduction == "mean":
        return jnp.mean(nll), correct
    if reduction == "sum":
        return jnp.sum(nll), correct
    return nll, correct


def grouped_nll(
    logits: jax.Array,            # [N, M] relevance scores per question group
    positive_col: int | jax.Array = 0,
    reduction: str = "mean",
) -> jax.Array:
    """CE over each group of (1 positive + M-1 negatives).

    The reference always places the positive at column 0
    (``co_training_wiki_train.py:246-252`` builds targets of zeros).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    if isinstance(positive_col, int):
        nll = -logp[:, positive_col]
    else:
        nll = -jnp.take_along_axis(logp, positive_col[:, None], axis=1)[:, 0]
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
