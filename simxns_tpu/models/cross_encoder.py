"""Cross-encoder reranker.

Replaces the reference's ``Reranker`` family:

- ``Reranker`` — encoder over joint (query, passage) pairs + 1-dim
  ``qa_classifier`` over CLS, scores viewed as (N, M)
  (``SimANS/model/models.py:638-659``).
- ``Reranker_2`` — extra binary relevance head alongside the rank head
  (``SimANS/model/models.py``).
- LEAD per-layer reranker — ``qa_classifier`` applied to *every* layer's CLS
  so layer-selection distillation can align per-layer score distributions
  (``LEAD/models.py:256-267``).

Input convention: the collator packs (N questions x M passages) joint
sequences as [N*M, L]; the model returns [N, M] relevance logits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simxns_tpu.models.bert import BertConfig, BertEncoder


@dataclasses.dataclass(frozen=True)
class CrossEncoderConfig:
    bert: BertConfig
    binary_head: bool = False         # Reranker_2's extra 2-way head
    per_layer_logits: bool = False    # LEAD: rank logit from every layer's CLS


class CrossEncoder(nn.Module):
    cfg: CrossEncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,         # [N*M, L] joint q+passage sequences
        attention_mask: jax.Array,    # [N*M, L]
        token_type_ids: Optional[jax.Array] = None,
        group_size: Optional[int] = None,   # M; if set, reshape logits to [N, M]
        *,
        deterministic: bool = True,
        output_attentions: bool = False,
    ):
        cfg = self.cfg
        out = BertEncoder(cfg.bert, name="encoder")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
            output_hidden_states=cfg.per_layer_logits,
            output_attentions=output_attentions)

        qa_classifier = nn.Dense(1, dtype=cfg.bert.dtype,
                                 param_dtype=cfg.bert.param_dtype,
                                 name="qa_classifier")
        logits = qa_classifier(out.pooled)[..., 0]          # [N*M]

        def group(x):
            return x.reshape(-1, group_size) if group_size else x

        results = {"logits": group(logits)}

        if cfg.per_layer_logits:
            # Same classifier over each layer's CLS (LEAD/models.py:262-267
            # applies the single qa_classifier to all_layer_hidden CLS).
            per_layer = jnp.stack(
                [qa_classifier(h[:, 0])[..., 0] for h in out.hidden_states[1:]],
                axis=0,
            )                                                # [L, N*M]
            if group_size:
                per_layer = per_layer.reshape(per_layer.shape[0], -1, group_size)
            results["per_layer_logits"] = per_layer

        if cfg.binary_head:
            binary = nn.Dense(2, dtype=cfg.bert.dtype,
                              param_dtype=cfg.bert.param_dtype,
                              name="binary_classifier")(out.pooled)  # [N*M, 2]
            if group_size:
                # grouped like the rank logits — Reranker_2 returns
                # binary_logits.view(N, M, 2) (SimANS models.py:623,633)
                binary = binary.reshape(-1, group_size, 2)
            results["binary_logits"] = binary

        if output_attentions:
            results["attentions"] = out.attentions
        if cfg.per_layer_logits:
            results["hidden_states"] = out.hidden_states
        return results
