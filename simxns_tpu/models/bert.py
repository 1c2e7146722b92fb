"""BERT-family transformer encoder in flax.linen, TPU-first.

One encoder replaces every HF wrapper the reference vendors:

- ``HFBertEncoder`` CLS pooling, ``SimANS/model/models.py:58-82`` (the
  ``pooled = sequence[:, 0]`` contract, including the fact that the HF pooler
  head is never used for retrieval);
- LEAD's vendored ``modeling_bert.py``/``modeling_distilbert.py`` whose only
  purpose is returning per-layer hidden states and attention maps
  (``LEAD/models.py:184-196`` — here that's just ``output_hidden_states=True``);
- PROD's truncated-depth student init (first n layers of a deeper teacher,
  ``PROD/ProD_KD/model/models.py:52-60``) via :func:`truncate_layers`;
- MASTER's Condenser decoder stacks (2-layer ``BertLayer`` heads,
  ``MASTER/pretrain/modeling.py:31-45``) reuse :class:`BertLayer` directly.

TPU-first choices: bf16 activations by default (the reference needs apex AMP
loss-scaling; bf16 needs none — SURVEY.md §2.1), static shapes everywhere,
``jax.checkpoint`` per layer for the reference's ``--gradient_checkpointing``,
and attention routed through :mod:`simxns_tpu.ops.attention` (XLA or Pallas
flash kernel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simxns_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    # TPU knobs
    dtype: Any = jnp.bfloat16          # activation/compute dtype
    param_dtype: Any = jnp.float32     # master params stay f32
    attention_impl: str = "xla"        # "xla" | "flash"
    remat: bool = False                # gradient checkpointing per layer

    @staticmethod
    def tiny(**kw) -> "BertConfig":
        """A 2-layer config for tests (CPU mesh, golden values)."""
        base = dict(
            vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position_embeddings=128,
            hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
        )
        base.update(kw)
        return BertConfig(**base)

    def replace(self, **kw) -> "BertConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass
class EncoderOutput:
    last_hidden_state: jax.Array                      # [B, S, H]
    pooled: jax.Array                                 # [B, H] == CLS token
    hidden_states: Optional[Tuple[jax.Array, ...]] = None  # (L+1) x [B, S, H]
    attentions: Optional[Tuple[jax.Array, ...]] = None     # L x [B, heads, S, S]


def _dense(cfg: BertConfig, features: int, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
    )


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, input_ids, token_type_ids, position_ids):
        cfg = self.cfg
        emb_init = nn.initializers.normal(cfg.initializer_range)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=emb_init,
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=emb_init, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype,
                       name="position_embeddings")(position_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=emb_init,
                       dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="layer_norm")(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=self.deterministic)


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    deterministic: bool = True
    output_attention: bool = False

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.cfg
        b, s, h = hidden.shape
        d = h // cfg.num_heads

        def split(x):
            return x.reshape(b, s, cfg.num_heads, d).transpose(0, 2, 1, 3)

        q = split(_dense(cfg, h, "query")(hidden))
        k = split(_dense(cfg, h, "key")(hidden))
        v = split(_dense(cfg, h, "value")(hidden))
        ctx, probs = multi_head_attention(
            q, k, v, attention_mask,
            impl=cfg.attention_impl, return_probs=self.output_attention,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
        out = _dense(cfg, h, "output")(ctx)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=self.deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="output_layer_norm")(
            out + hidden)
        return out, probs


class BertLayer(nn.Module):
    """Post-LN transformer block (attention + GELU FFN), HF-BERT layout."""

    cfg: BertConfig
    deterministic: bool = True
    output_attention: bool = False

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.cfg
        attn_out, probs = BertSelfAttention(
            cfg, deterministic=self.deterministic,
            output_attention=self.output_attention, name="attention")(
            hidden, attention_mask)
        inter = _dense(cfg, cfg.intermediate_size, "intermediate")(attn_out)
        inter = nn.gelu(inter, approximate=False)
        out = _dense(cfg, cfg.hidden_size, "output")(inter)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=self.deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="output_layer_norm")(
            out + attn_out)
        return out, probs


class BertEncoder(nn.Module):
    """Token ids -> contextual hiddens + CLS pooled vector.

    ``output_hidden_states``/``output_attentions`` expose what LEAD's vendored
    BERT exposes (per-layer CLS scores + attention maps, ``LEAD/models.py``).
    """

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                  # [B, S] int32
        attention_mask: Optional[jax.Array] = None,   # [B, S] 1/0
        token_type_ids: Optional[jax.Array] = None,   # [B, S]
        *,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ) -> EncoderOutput:
        cfg = self.cfg
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), dtype=jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), dtype=jnp.int32)
        position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

        x = BertEmbeddings(cfg, deterministic=deterministic, name="embeddings")(
            input_ids, token_type_ids, position_ids)

        all_hidden = [x] if output_hidden_states else None
        all_attn = [] if output_attentions else None

        layer_cls = BertLayer
        if cfg.remat and not output_attentions:
            layer_cls = nn.remat(BertLayer)

        for i in range(cfg.num_layers):
            x, probs = layer_cls(
                cfg, deterministic=deterministic,
                output_attention=output_attentions, name=f"layer_{i}")(
                x, attention_mask)
            if output_hidden_states:
                all_hidden.append(x)
            if output_attentions:
                all_attn.append(probs)

        return EncoderOutput(
            last_hidden_state=x,
            pooled=x[:, 0],
            hidden_states=tuple(all_hidden) if output_hidden_states else None,
            attentions=tuple(all_attn) if output_attentions else None,
        )


def truncate_layers(params: dict, num_layers: int) -> dict:
    """Keep embeddings + the first ``num_layers`` transformer layers.

    The PROD student-init recipe: a 6-layer student starts from the first 6
    layers of a 12/24-layer teacher checkpoint
    (``PROD/ProD_KD/model/models.py:52-60`` sets ``cfg.num_hidden_layers``).
    Works on a raw encoder param dict (``{"embeddings":…, "layer_i":…}``).
    """
    out = {}
    for key, val in params.items():
        if key.startswith("layer_"):
            if int(key.split("_")[1]) < num_layers:
                out[key] = val
        else:
            out[key] = val
    return out
