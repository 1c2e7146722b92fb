"""ColBERT late-interaction model.

Replaces ``PROD/ProD_KD/model/models.py:141-196`` (``ColBERT``) and
``LEAD/models.py:79-143`` (``HFColBertEncoder``): a shared BERT tower with a
128-dim linear head over every token, queries and documents scored by MaxSim
late interaction. Similarity metric is cosine (L2-normalized tokens) or
squared-L2, matching the reference's ``similarity_metric`` switch.

Punctuation masking (LEAD zeroes embeddings of punctuation tokens,
``models.py:110-121``) is supported via an explicit ``doc_token_mask`` — the
host-side tokenizer knows which ids are punctuation; keeping the mask in the
batch keeps the device code shape-static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from simxns_tpu.models.bert import BertConfig, BertEncoder


@dataclasses.dataclass(frozen=True)
class ColBERTConfig:
    bert: BertConfig
    dim: int = 128
    similarity: str = "cosine"        # "cosine" | "l2"
    share_weight: bool = True         # reference uses one tower for q and d


class ColBERT(nn.Module):
    cfg: ColBERTConfig

    def setup(self):
        self.encoder = BertEncoder(self.cfg.bert, name="encoder")
        self.proj = nn.Dense(self.cfg.dim, use_bias=False,
                             dtype=self.cfg.bert.dtype,
                             param_dtype=self.cfg.bert.param_dtype,
                             name="linear")
        if not self.cfg.share_weight:
            self.doc_encoder = BertEncoder(self.cfg.bert, name="doc_encoder")
            self.doc_proj = nn.Dense(self.cfg.dim, use_bias=False,
                                     dtype=self.cfg.bert.dtype,
                                     param_dtype=self.cfg.bert.param_dtype,
                                     name="doc_linear")

    def _embed(self, encoder, proj, input_ids, attention_mask, token_type_ids,
               deterministic, token_mask):
        out = encoder(input_ids, attention_mask, token_type_ids,
                      deterministic=deterministic)
        tok = proj(out.last_hidden_state)                    # [B, S, dim]
        if self.cfg.similarity == "cosine":
            tok = tok / jnp.maximum(
                jnp.linalg.norm(tok.astype(jnp.float32), axis=-1, keepdims=True),
                1e-9).astype(tok.dtype)
        mask = attention_mask if token_mask is None else attention_mask * token_mask
        return tok * mask[..., None].astype(tok.dtype)

    def encode_query(self, input_ids, attention_mask, token_type_ids=None, *,
                     deterministic=True):
        return self._embed(self.encoder, self.proj, input_ids, attention_mask,
                           token_type_ids, deterministic, None)

    def encode_doc(self, input_ids, attention_mask, token_type_ids=None,
                   doc_token_mask=None, *, deterministic=True):
        enc = self.encoder if self.cfg.share_weight else self.doc_encoder
        proj = self.proj if self.cfg.share_weight else self.doc_proj
        return self._embed(enc, proj, input_ids, attention_mask,
                           token_type_ids, deterministic, doc_token_mask)

    def __call__(self, q_ids, q_mask, d_ids, d_mask, q_type_ids=None,
                 d_type_ids=None, doc_token_mask=None, *, deterministic=True):
        q = self.encode_query(q_ids, q_mask, q_type_ids,
                              deterministic=deterministic)
        d = self.encode_doc(d_ids, d_mask, d_type_ids, doc_token_mask,
                            deterministic=deterministic)
        return q, d


def maxsim_score(q_tokens: jax.Array, d_tokens: jax.Array,
                 similarity: str = "cosine") -> jax.Array:
    """MaxSim late interaction: [Q,Sq,D] x [N,Sd,D] -> [Q,N] scores.

    score(q, d) = sum over query tokens of max over doc tokens of token
    similarity (``PROD/ProD_KD/model/models.py:168-196``). Masked tokens are
    zero vectors so their cosine sims are 0 and never win the max for real
    tokens; for L2 mode masked doc tokens must be pre-masked to -inf by the
    caller if exact parity matters.
    """
    if similarity == "cosine":
        sims = jnp.einsum("qsd,ntd->qnst", q_tokens, d_tokens,
                          preferred_element_type=jnp.float32)
    elif similarity == "l2":
        diff = q_tokens[:, None, :, None, :] - d_tokens[None, :, None, :, :]
        sims = -jnp.sum(diff.astype(jnp.float32) ** 2, axis=-1)
    else:
        raise ValueError(similarity)
    return jnp.sum(jnp.max(sims, axis=-1), axis=-1)         # [Q, N]


def maxsim_score_paired(q_tokens: jax.Array, d_tokens: jax.Array,
                        similarity: str = "cosine") -> jax.Array:
    """Paired MaxSim: [B,Sq,D] x [B,Sd,D] -> [B] (grouped reranking path)."""
    if similarity == "cosine":
        sims = jnp.einsum("bsd,btd->bst", q_tokens, d_tokens,
                          preferred_element_type=jnp.float32)
    elif similarity == "l2":
        diff = q_tokens[:, :, None, :] - d_tokens[:, None, :, :]
        sims = -jnp.sum(diff.astype(jnp.float32) ** 2, axis=-1)
    else:
        raise ValueError(similarity)
    return jnp.sum(jnp.max(sims, axis=-1), axis=-1)
