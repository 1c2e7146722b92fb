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
        # the reference ALWAYS keeps two projection heads (q_linear and
        # ctx_linear, PROD models.py:160-161) — share_weight shares only
        # the BERT towers (models.py:151-155)
        self.proj = nn.Dense(self.cfg.dim, use_bias=False,
                             dtype=self.cfg.bert.dtype,
                             param_dtype=self.cfg.bert.param_dtype,
                             name="linear")
        self.doc_proj = nn.Dense(self.cfg.dim, use_bias=False,
                                 dtype=self.cfg.bert.dtype,
                                 param_dtype=self.cfg.bert.param_dtype,
                                 name="doc_linear")
        if not self.cfg.share_weight:
            self.doc_encoder = BertEncoder(self.cfg.bert, name="doc_encoder")

    def _embed(self, encoder, proj, input_ids, attention_mask, token_type_ids,
               deterministic, token_mask):
        out = encoder(input_ids, attention_mask, token_type_ids,
                      deterministic=deterministic)
        tok = proj(out.last_hidden_state)                    # [B, S, dim]
        if token_mask is not None:
            tok = tok * token_mask[..., None].astype(tok.dtype)
        if self.cfg.similarity == "cosine":
            tok = tok / jnp.maximum(
                jnp.linalg.norm(tok.astype(jnp.float32), axis=-1, keepdims=True),
                1e-9).astype(tok.dtype)
        return tok

    def encode_query(self, input_ids, attention_mask, token_type_ids=None, *,
                     deterministic=True):
        # REFERENCE QUIRK, replicated deliberately: query-side padding
        # tokens are NOT masked — query_emb normalizes Q_output with no
        # mask (PROD models.py:169-173), so padded positions contribute
        # live MaxSim terms. Only the doc side is masked (:180).
        return self._embed(self.encoder, self.proj, input_ids, attention_mask,
                           token_type_ids, deterministic, None)

    def encode_doc(self, input_ids, attention_mask, token_type_ids=None,
                   doc_token_mask=None, *, deterministic=True):
        enc = self.encoder if self.cfg.share_weight else self.doc_encoder
        mask = (attention_mask if doc_token_mask is None
                else attention_mask * doc_token_mask)
        return self._embed(enc, self.doc_proj, input_ids, attention_mask,
                           token_type_ids, deterministic, mask)

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
        # expanded form: -||q-d||^2 = 2 q.d - ||q||^2 - ||d||^2 — the
        # naive difference tensor is [Q,N,Sq,Sd,D] (tens of GB at
        # retrieval batches); this needs only the [Q,N,Sq,Sd] dot matrix
        qd = jnp.einsum("qsd,ntd->qnst", q_tokens, d_tokens,
                        preferred_element_type=jnp.float32)
        qn = jnp.sum(q_tokens.astype(jnp.float32) ** 2, axis=-1)  # [Q,Sq]
        dn = jnp.sum(d_tokens.astype(jnp.float32) ** 2, axis=-1)  # [N,Sd]
        sims = 2.0 * qd - qn[:, None, :, None] - dn[None, :, None, :]
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
        qd = jnp.einsum("bsd,btd->bst", q_tokens, d_tokens,
                        preferred_element_type=jnp.float32)
        qn = jnp.sum(q_tokens.astype(jnp.float32) ** 2, axis=-1)
        dn = jnp.sum(d_tokens.astype(jnp.float32) ** 2, axis=-1)
        sims = 2.0 * qd - qn[:, :, None] - dn[:, None, :]
    else:
        raise ValueError(similarity)
    return jnp.sum(jnp.max(sims, axis=-1), axis=-1)
