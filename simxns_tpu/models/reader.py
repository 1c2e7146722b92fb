"""DPR span reader.

Re-implements ``Reader`` and its span loss (``SimANS/model/models.py:
575-603, 662-703``): encoder over (N questions x M passages) joint inputs,
per-token start/end logits (``qa_outputs``), per-passage relevance logit
(``qa_classifier`` on CLS), trained with:

- switch loss — CE over the M passages per question, positive at column 0
  (summed over questions, not averaged — ``compute_loss`` :677);
- span loss — per answer-occurrence CE for start and end with
  ``ignore_index = L`` (clamped out-of-range positions contribute 0), max
  over passages (only the positive passage carries live spans), then
  marginal max-likelihood over the answer occurrences
  (``_calc_mml`` :693-698: ``-log sum exp(-loss)`` with zero-loss slots
  masked).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simxns_tpu.models.bert import BertConfig, BertEncoder


@dataclasses.dataclass(frozen=True)
class ReaderConfig:
    bert: BertConfig


class Reader(nn.Module):
    cfg: ReaderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 *, deterministic: bool = True):
        """input_ids [N, M, L] -> (start [N,M,L], end [N,M,L], rank [N,M])."""
        n, m, l = input_ids.shape
        out = BertEncoder(self.cfg.bert, name="encoder")(
            input_ids.reshape(n * m, l), attention_mask.reshape(n * m, l),
            deterministic=deterministic)
        span = nn.Dense(2, dtype=self.cfg.bert.dtype,
                        param_dtype=self.cfg.bert.param_dtype,
                        name="qa_outputs")(out.last_hidden_state)
        start = span[..., 0].astype(jnp.float32).reshape(n, m, l)
        end = span[..., 1].astype(jnp.float32).reshape(n, m, l)
        rank = nn.Dense(1, dtype=self.cfg.bert.dtype,
                        param_dtype=self.cfg.bert.param_dtype,
                        name="qa_classifier")(out.pooled)
        return start, end, rank[..., 0].astype(jnp.float32).reshape(n, m)


def _ce_no_reduce(logits: jax.Array, positions: jax.Array,
                  ignored_index: int) -> jax.Array:
    """Per-row CE with ignore_index semantics: [R, L] x [R] -> [R]."""
    valid = positions != ignored_index
    safe = jnp.where(valid, positions, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], 1)[:, 0]
    return jnp.where(valid, nll, 0.0)


def reader_loss(
    start_logits: jax.Array,      # [N, M, L]
    end_logits: jax.Array,        # [N, M, L]
    relevance_logits: jax.Array,  # [N, M]
    start_positions: jax.Array,   # [N, M, A] (A answer occurrences; pad >= L)
    end_positions: jax.Array,     # [N, M, A]
    answer_mask: jax.Array,       # [N, M, A] 1 for live occurrences
) -> Tuple[jax.Array, dict]:
    n, m, l = start_logits.shape
    a = start_positions.shape[-1]
    ignored = l

    # switch loss: sum of per-question CE with positive at col 0
    logp = jax.nn.log_softmax(relevance_logits, axis=1)
    switch_loss = -logp[:, 0].sum()

    sl = start_logits.reshape(n * m, l)
    el = end_logits.reshape(n * m, l)
    sp = jnp.clip(start_positions.reshape(n * m, a), 0, ignored)
    ep = jnp.clip(end_positions.reshape(n * m, a), 0, ignored)
    am = answer_mask.reshape(n * m, a).astype(jnp.float32)

    # one softmax per logit matrix + a [R, A] gather (the per-occurrence
    # loop re-emitted log_softmax A times and leaned on XLA CSE)
    def _ce_all(logits, positions):
        valid = positions != ignored                     # [R, A]
        safe = jnp.where(valid, positions, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)       # [R, L]
        nll = -jnp.take_along_axis(logp, safe, axis=1)   # [R, A]
        return jnp.where(valid, nll, 0.0)

    start_losses = _ce_all(sl, sp) * am
    end_losses = _ce_all(el, ep) * am
    loss_tensor = (start_losses + end_losses).reshape(n, m, a).max(axis=1)

    # marginal max-likelihood over answer occurrences (_calc_mml)
    marginal = jnp.sum(
        jnp.exp(-loss_tensor - 1e10 * (loss_tensor == 0)), axis=1)
    span_loss = -jnp.sum(jnp.log(marginal + (marginal == 0)))
    total = span_loss + switch_loss
    return total, {"span_loss": span_loss, "switch_loss": switch_loss}
