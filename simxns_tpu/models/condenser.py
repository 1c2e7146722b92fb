"""MASTER bottlenecked masked-autoencoder pretraining model.

Re-implements ``CondenserForPretraining`` (``MASTER/pretrain/modeling.py:
21-207``): a deep BERT MLM encoder plus five shallow decoder heads that see
the corpus only through the encoder's CLS vector (the information
bottleneck):

- ``c_head``       — corrupted-passage recovery (keyword-weighted masks)
- ``query_head``   — docT5 query recovery
- ``gpt_head``     — GPT-2 continuation recovery
- ``next_head``    — second-half recovery from the first half's CLS
- ``overlap_head`` — complement-mask recovery

Decoder input = ``[enc CLS || fresh embeddings of decoder tokens[1:]]``
(``modeling.py:64-65``); each head is ``n_head_layers`` BertLayers; all heads
share the encoder's MLM classifier (``lm.cls``, ``mlm_loss`` :163-169).
Final loss = 5 decoder MLMs + 3 encoder MLMs (text, next-first-half,
overlap) (``modeling.py:158``).

The CoCondenser contrastive variant adds an in-batch NLL over gathered span
CLS vectors (``modeling.py:385-466``); on TPU the GradCache chunking is
unnecessary (remat covers the memory), so :func:`cocondenser_span_loss` is a
plain gathered contrastive loss.

Export: ``save_pretrained`` drops decoder-head weights so the released
artifact is a plain BERT (``modeling.py:199-207``) — see
:func:`simxns_tpu.io.checkpoint.export_encoder_only`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simxns_tpu.models.bert import BertConfig, BertEncoder, BertLayer, MLMHead

HEAD_NAMES = ("c_head", "query_head", "gpt_head", "next_head", "overlap_head")
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class CondenserConfig:
    bert: BertConfig
    n_head_layers: int = 2
    tie_embeddings: bool = True


def mlm_loss_from_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over positions with labels != -100 (torch CrossEntropyLoss
    ignore_index semantics)."""
    vocab = logits.shape[-1]
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count


class Condenser(nn.Module):
    cfg: CondenserConfig

    def setup(self):
        self.encoder = BertEncoder(self.cfg.bert)
        self.mlm = MLMHead(self.cfg.bert)
        for name in HEAD_NAMES:
            setattr(self, name, [
                BertLayer(self.cfg.bert, name=f"{name}_{i}")
                for i in range(self.cfg.n_head_layers)
            ])

    def _embedding_table(self) -> Optional[jax.Array]:
        if not self.cfg.tie_embeddings:
            return None
        return self.encoder.embeddings.word_embeddings.embedding

    def _encode_mlm(self, input_ids, attention_mask, labels, *, deterministic):
        """Encoder pass: (mlm_loss, cls_hidden [B,1,H])."""
        out = self.encoder(input_ids, attention_mask,
                           deterministic=deterministic)
        logits = self.mlm(out.last_hidden_state, self._embedding_table())
        loss = mlm_loss_from_logits(logits, labels)
        return loss, out.last_hidden_state[:, :1]

    def _decode_mlm(self, head_name, cls_hiddens, decoder_input_ids,
                    attention_mask, labels, *, deterministic):
        """Decoder head pass over [CLS || fresh embeddings[1:]]."""
        skip = self.encoder.embed(decoder_input_ids,
                                  deterministic=deterministic)
        hiddens = jnp.concatenate([cls_hiddens, skip[:, 1:]], axis=1)
        for layer in getattr(self, head_name):
            hiddens, _ = layer(hiddens, attention_mask,
                               deterministic=deterministic)
        logits = self.mlm(hiddens, self._embedding_table())
        return mlm_loss_from_logits(logits, labels)

    def __call__(self, batch: Dict[str, jax.Array], *,
                 deterministic: bool = True) -> Tuple[jax.Array, Dict]:
        """Full 8-loss MASTER objective (``modeling.py:53-160``).

        Batch keys follow the reference collator output (SURVEY.md §3.4):
        input_ids/labels/attention_mask, decoder_*, query_*, gpt_*,
        next_encoder_*/next_decoder_*, overlap_encoder_*/overlap_decoder_*.
        """
        det = deterministic
        enc_loss, cls = self._encode_mlm(
            batch["input_ids"], batch["attention_mask"], batch["labels"],
            deterministic=det)

        c_loss = self._decode_mlm(
            "c_head", cls, batch["decoder_input_ids"],
            batch["attention_mask"], batch["decoder_labels"],
            deterministic=det)
        query_loss = self._decode_mlm(
            "query_head", cls, batch["query_input_ids"],
            batch["query_attention_mask"], batch["query_labels"],
            deterministic=det)
        gpt_loss = self._decode_mlm(
            "gpt_head", cls, batch["gpt_input_ids"],
            batch["gpt_attention_mask"], batch["gpt_labels"],
            deterministic=det)

        next_enc_loss, next_cls = self._encode_mlm(
            batch["next_encoder_input_ids"],
            batch["next_encoder_attention_mask"],
            batch["next_encoder_labels"], deterministic=det)
        next_loss = self._decode_mlm(
            "next_head", next_cls, batch["next_decoder_input_ids"],
            batch["next_decoder_attention_mask"],
            batch["next_decoder_labels"], deterministic=det)

        overlap_enc_loss, overlap_cls = self._encode_mlm(
            batch["overlap_encoder_input_ids"], batch["attention_mask"],
            batch["overlap_encoder_labels"], deterministic=det)
        # overlap decoder reuses the text attention mask (modeling.py:146-155)
        overlap_loss = self._decode_mlm(
            "overlap_head", overlap_cls, batch["overlap_decoder_input_ids"],
            batch["attention_mask"], batch["overlap_decoder_labels"],
            deterministic=det)

        parts = {
            "mlm": enc_loss, "c_head": c_loss, "query": query_loss,
            "gpt": gpt_loss, "next_encoder": next_enc_loss,
            "next": next_loss, "overlap_encoder": overlap_enc_loss,
            "overlap": overlap_loss,
        }
        total = sum(parts.values())
        return total, parts

    def encode_cls(self, input_ids, attention_mask, *, deterministic=True):
        """CLS vectors for the CoCondenser contrastive span loss."""
        out = self.encoder(input_ids, attention_mask,
                           deterministic=deterministic)
        return out.pooled

    def decode_logits(self, head_name, cls_hiddens, decoder_input_ids,
                      attention_mask, *, deterministic=True):
        """MLM logits of a decoder head over [CLS || fresh embeddings]."""
        skip = self.encoder.embed(decoder_input_ids,
                                  deterministic=deterministic)
        hiddens = jnp.concatenate([cls_hiddens, skip[:, 1:]], axis=1)
        for layer in getattr(self, head_name):
            hiddens, _ = layer(hiddens, attention_mask,
                               deterministic=deterministic)
        return self.mlm(hiddens, self._embedding_table())

    def electra_forward(self, batch: Dict[str, jax.Array], *,
                        deterministic: bool = True):
        """ELECTRA variant: 3 decoder heads, all fed by the *text* CLS
        (``ELECTRACondenserForPretraining.forward``,
        ``MASTER/pretrain/modeling.py:235-286``): c_head on the corrupted
        text, next_head on the continuation, overlap_head on the complement
        mask — plus the encoder MLM loss. 4-loss sum.
        """
        det = deterministic
        enc_loss, cls = self._encode_mlm(
            batch["input_ids"], batch["attention_mask"], batch["labels"],
            deterministic=det)
        c_loss = self._decode_mlm(
            "c_head", cls, batch["decoder_input_ids"],
            batch["attention_mask"], batch["decoder_labels"],
            deterministic=det)
        next_loss = self._decode_mlm(
            "next_head", cls, batch["next_decoder_input_ids"],
            batch["next_decoder_attention_mask"],
            batch["next_decoder_labels"], deterministic=det)
        overlap_loss = self._decode_mlm(
            "overlap_head", cls, batch["overlap_decoder_input_ids"],
            batch["attention_mask"], batch["overlap_decoder_labels"],
            deterministic=det)
        parts = {"mlm": enc_loss, "c_head": c_loss, "next": next_loss,
                 "overlap": overlap_loss}
        return sum(parts.values()), parts


def in_batch_nearest(cls_hiddens: jax.Array) -> jax.Array:
    """Each row's nearest row by dot product with the diagonal ZEROED —
    not -inf-masked (``trainer.py:30`` multiplies by ``1 - eye``).

    REFERENCE QUIRK, replicated deliberately: when every off-diagonal dot
    is negative the argmax returns the row itself (no CLS swap for that
    example), and exact zero ties resolve to the lowest index. An
    -inf mask would always force a real other row — different corruption
    stream than the reference's."""
    sims = jnp.einsum("bh,ch->bc", cls_hiddens, cls_hiddens,
                      preferred_element_type=jnp.float32)
    n = sims.shape[0]
    sims = sims * (1.0 - jnp.eye(n, dtype=sims.dtype))
    return cls_hiddens[jnp.argmax(sims, axis=1)]


def generate_replaced_ids(model: Condenser, params, batch: Dict[str, jax.Array],
                          mask_id: int):
    """ELECTRA-style realistic corruption (``MASTER/pretrain/trainer.py:
    35-93``): decode masked positions with the c_head conditioned on the
    in-batch-*nearest* example's CLS (not the own CLS), splice argmax
    predictions at [MASK] positions. Returns
    ``(replaced_decoder_input_ids, replaced_input_ids)``; run under
    ``stop_gradient``/outside the train step like the reference's no_grad.
    """

    def swap_decode(src_ids, src_mask, tgt_ids, tgt_mask):
        cls = model.apply(params, src_ids, src_mask, method="encode_cls")
        swapped = in_batch_nearest(cls)[:, None, :]
        logits = model.apply(params, "c_head", swapped, tgt_ids, tgt_mask,
                             method="decode_logits")
        pred = jnp.argmax(logits, axis=-1).astype(tgt_ids.dtype)
        return jnp.where(tgt_ids != mask_id, tgt_ids, pred)

    replaced_decoder = swap_decode(
        batch["input_ids"], batch["attention_mask"],
        batch["decoder_input_ids"], batch["attention_mask"])
    replaced_input = swap_decode(
        batch["decoder_input_ids"], batch["attention_mask"],
        batch["input_ids"], batch["attention_mask"])
    return (jax.lax.stop_gradient(replaced_decoder),
            jax.lax.stop_gradient(replaced_input))


def cocondenser_span_loss(span_cls: jax.Array) -> jax.Array:
    """CoCondenser contrastive loss over span CLS vectors.

    ``span_cls`` is [2*B, H] with spans (2 per passage) interleaved as the
    reference's flattened batch (``CoCondenserDataset.__getitem__`` samples 2
    spans; the loss treats each span's partner as its positive,
    ``modeling.py:427-453``). Gathering across devices happens in the caller
    (train step) via the standard in-batch-negative collective.
    """
    scores = jnp.einsum("qh,ch->qc", span_cls, span_cls,
                        preferred_element_type=jnp.float32)
    n = scores.shape[0]
    scores = jnp.where(jnp.eye(n, dtype=bool), -1e9, scores)  # mask self
    partner = jnp.arange(n) ^ 1     # 0<->1, 2<->3, ...
    logp = jax.nn.log_softmax(scores, axis=1)
    return -jnp.take_along_axis(logp, partner[:, None], 1).mean()
