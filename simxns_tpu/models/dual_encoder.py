"""Dual-encoder (bi-encoder) retriever tower pair.

Covers the reference's dual-encoder zoo with one configurable module:

- ``BiBertEncoder`` — separate question/context towers, CLS pooling, optional
  weight sharing (``SimANS/model/models.py:85-118``, ``share_weight`` flag).
- ``BiBertEncoder_daya`` — mean pooling over valid tokens
  (``SimANS/model/models.py`` mean-pool variant).
- ``RobertaDot`` — projection head ``Dense(H->H)`` + LayerNorm over CLS
  (``SimANS/model/models.py:340-359``), used for MS-Doc/STAR runs.
- PROD students (6/12-layer) — depth comes from ``BertConfig.num_layers`` plus
  :func:`simxns_tpu.models.bert.truncate_layers` init.

The SimANS ``+ 0 * pooler.sum()`` gradient hack (``models.py:80``) exists only
to keep DDP happy about unused params; flax has no such constraint so there is
deliberately no analog.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simxns_tpu.models.bert import BertConfig, BertEncoder


@dataclasses.dataclass(frozen=True)
class BiEncoderConfig:
    bert: BertConfig
    share_weight: bool = False        # one tower for q and ctx
    pooling: str = "cls"              # "cls" | "mean"
    projection_dim: Optional[int] = None   # RobertaDot-style head if set
    project_layer_norm: bool = True


def _pool(output, attention_mask, pooling: str) -> jax.Array:
    if pooling == "cls":
        return output.pooled
    if pooling == "mean":
        mask = attention_mask[..., None].astype(output.last_hidden_state.dtype)
        summed = jnp.sum(output.last_hidden_state * mask, axis=1)
        count = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return summed / count
    raise ValueError(f"unknown pooling {pooling!r}")


class _Tower(nn.Module):
    cfg: BiEncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, *,
                 deterministic=True, output_hidden_states=False):
        out = BertEncoder(self.cfg.bert, name="encoder")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
            output_hidden_states=output_hidden_states)
        emb = _pool(out, attention_mask, self.cfg.pooling)
        if self.cfg.projection_dim is not None:
            emb = nn.Dense(self.cfg.projection_dim,
                           dtype=self.cfg.bert.dtype,
                           param_dtype=self.cfg.bert.param_dtype,
                           name="project")(emb)
            if self.cfg.project_layer_norm:
                emb = nn.LayerNorm(epsilon=self.cfg.bert.layer_norm_eps,
                                   dtype=self.cfg.bert.dtype,
                                   param_dtype=self.cfg.bert.param_dtype,
                                   name="project_layer_norm")(emb)
        return emb, out


class BiEncoder(nn.Module):
    """Question/context tower pair producing dense embeddings.

    ``apply(..., method="encode_query")`` / ``"encode_passage"`` give the
    single-tower paths used by corpus encoding and query-time search; calling
    the module itself returns ``(q_emb, ctx_emb)`` for training.
    """

    cfg: BiEncoderConfig

    def setup(self):
        self.question_model = _Tower(self.cfg, name="question_model")
        if self.cfg.share_weight:
            self.ctx_model = self.question_model
        else:
            self.ctx_model = _Tower(self.cfg, name="ctx_model")

    def encode_query(self, input_ids, attention_mask=None, token_type_ids=None,
                     *, deterministic=True, output_hidden_states=False):
        emb, out = self.question_model(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
            output_hidden_states=output_hidden_states)
        return emb if not output_hidden_states else (emb, out)

    def encode_passage(self, input_ids, attention_mask=None, token_type_ids=None,
                       *, deterministic=True, output_hidden_states=False):
        emb, out = self.ctx_model(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
            output_hidden_states=output_hidden_states)
        return emb if not output_hidden_states else (emb, out)

    def __call__(self, q_ids, q_mask, ctx_ids, ctx_mask,
                 q_type_ids=None, ctx_type_ids=None, *,
                 deterministic=True) -> Tuple[jax.Array, jax.Array]:
        q_emb = self.encode_query(q_ids, q_mask, q_type_ids,
                                  deterministic=deterministic)
        ctx_emb = self.encode_passage(ctx_ids, ctx_mask, ctx_type_ids,
                                      deterministic=deterministic)
        return q_emb, ctx_emb
