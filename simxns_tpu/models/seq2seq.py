"""Encoder-decoder seq2seq for doc2query generation, TPU-first.

The reference's CAPSTONE pipeline generates expansion queries with
``castorini/doc2query-t5-base-msmarco``:
``model.generate(max_length=64, do_sample=True, top_k=10,
num_return_sequences=num_query)`` per passage, then writes
``query.tsv`` rows ``psg_id\\tq1\\t...\\tqN``
(``CAPSTONE/models/generate_query.py:115-235``). This module provides that
capability natively: a transformer encoder-decoder built from the same
dense/attention primitives as :mod:`simxns_tpu.models.bert` (shared word
table, causal self-attention + cross-attention decoder, post-LN residuals)
plus a static-shape top-k sampling decode under ``lax.scan`` — no Python
control flow, one XLA compilation for any corpus size.

The TSV this emits is exactly what
:class:`simxns_tpu.data.curriculum.QueryExpander.from_tsv` consumes, closing
the generate->curriculum loop in-process.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simxns_tpu.models.bert import BertConfig, BertLayer, _dense
from simxns_tpu.ops.attention import _xla_attention

NEG = -1e9

# jitted decode loops keyed by (cfg repr, batch, length, sampling knobs)
_GEN_CACHE: dict = {}


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    bert: BertConfig                       # shared shape for enc + dec
    num_decoder_layers: Optional[int] = None   # default: bert.num_layers
    max_target_length: int = 64            # generate() default in reference
    bos_id: int = 1
    eos_id: int = 2
    pad_id: int = 0

    @property
    def n_dec(self) -> int:
        return self.num_decoder_layers or self.bert.num_layers


def _split_heads(x, num_heads):
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, nh, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, nh * d)


class _Attention(nn.Module):
    """Projection + attention with an arbitrary additive bias.

    Used for both causal self-attention (bias = causal + key mask) and
    cross-attention (bias = encoder key mask).
    """

    cfg: BertConfig

    @nn.compact
    def __call__(self, q_in, kv_in, bias, *, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.hidden_size
        q = _split_heads(_dense(cfg, h, "query")(q_in), cfg.num_heads)
        k = _split_heads(_dense(cfg, h, "key")(kv_in), cfg.num_heads)
        v = _split_heads(_dense(cfg, h, "value")(kv_in), cfg.num_heads)
        ctx, _ = _xla_attention(q, k, v, bias, return_probs=False)
        out = _dense(cfg, h, "output")(_merge_heads(ctx))
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name="output_layer_norm")(out + q_in)


class DecoderLayer(nn.Module):
    """Causal self-attn -> cross-attn -> GELU FFN (post-LN, BERT layout)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, enc_hidden, self_bias, cross_bias, *,
                 deterministic: bool = True):
        cfg = self.cfg
        x = _Attention(cfg, name="self_attention")(
            hidden, hidden, self_bias, deterministic=deterministic)
        x = _Attention(cfg, name="cross_attention")(
            x, enc_hidden, cross_bias, deterministic=deterministic)
        inter = _dense(cfg, cfg.intermediate_size, "intermediate")(x)
        inter = nn.gelu(inter, approximate=cfg.gelu == "tanh")
        out = _dense(cfg, cfg.hidden_size, "output")(inter)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name="output_layer_norm")(out + x)


class Seq2Seq(nn.Module):
    """T5-capability encoder-decoder with a shared word table.

    ``__call__`` is the teacher-forcing forward (training); generation goes
    through :func:`generate` which re-applies the decoder per position with
    static shapes (the doc2query target is 64 tokens — the O(T^2) re-run is
    a few tiny MXU matmuls per step and keeps the whole sampler one fused
    ``lax.scan`` program).
    """

    cfg: Seq2SeqConfig

    def setup(self):
        bc = self.cfg.bert
        emb_init = nn.initializers.normal(bc.initializer_range)
        self.shared_embed = nn.Embed(
            bc.vocab_size, bc.hidden_size, embedding_init=emb_init,
            dtype=bc.dtype, param_dtype=bc.param_dtype)
        self.enc_pos = nn.Embed(bc.max_position_embeddings, bc.hidden_size,
                                embedding_init=emb_init, dtype=bc.dtype,
                                param_dtype=bc.param_dtype)
        self.dec_pos = nn.Embed(bc.max_position_embeddings, bc.hidden_size,
                                embedding_init=emb_init, dtype=bc.dtype,
                                param_dtype=bc.param_dtype)
        self.enc_norm = nn.LayerNorm(epsilon=bc.layer_norm_eps, dtype=bc.dtype,
                                     param_dtype=bc.param_dtype)
        self.dec_norm = nn.LayerNorm(epsilon=bc.layer_norm_eps, dtype=bc.dtype,
                                     param_dtype=bc.param_dtype)
        self.enc_layers = [BertLayer(bc, name=f"enc_layer_{i}")
                           for i in range(bc.num_layers)]
        self.dec_layers = [DecoderLayer(bc, name=f"dec_layer_{i}")
                           for i in range(self.cfg.n_dec)]

    def _embed(self, ids, pos_table, norm):
        s = ids.shape[1]
        pos = jnp.arange(s, dtype=jnp.int32)[None]
        return norm(self.shared_embed(ids) + pos_table(pos))

    def encode(self, enc_ids, enc_mask, *, deterministic: bool = True):
        x = self._embed(enc_ids, self.enc_pos, self.enc_norm)
        for layer in self.enc_layers:
            x, _ = layer(x, enc_mask, deterministic=deterministic)
        return x

    def decode(self, dec_ids, dec_mask, enc_hidden, enc_mask, *,
               deterministic: bool = True):
        """Teacher-forcing decoder -> logits [B, T, V] (f32)."""
        b, t = dec_ids.shape
        x = self._embed(dec_ids, self.dec_pos, self.dec_norm)
        causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
        self_bias = jnp.where(
            causal[None, None] & (dec_mask[:, None, None, :] > 0), 0.0, NEG)
        cross_bias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, NEG)
        for layer in self.dec_layers:
            x = layer(x, enc_hidden, self_bias, cross_bias,
                      deterministic=deterministic)
        table = self.shared_embed.embedding
        return jnp.einsum("bth,vh->btv", x, table.astype(x.dtype),
                          preferred_element_type=jnp.float32)

    def __call__(self, enc_ids, enc_mask, dec_ids, dec_mask, *,
                 deterministic: bool = True):
        enc = self.encode(enc_ids, enc_mask, deterministic=deterministic)
        return self.decode(dec_ids, dec_mask, enc, enc_mask,
                           deterministic=deterministic)


def seq2seq_lm_loss(logits: jax.Array, labels: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """Mean CE over ``mask==1`` target positions (pad-ignoring LM loss)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def generate(model: Seq2Seq, params, enc_ids, enc_mask, rng_key, *,
             max_length: Optional[int] = None, top_k: int = 10,
             temperature: float = 1.0,
             num_return_sequences: int = 1) -> jax.Array:
    """Top-k sampling decode (the reference's ``do_sample=True, top_k=10``).

    Returns ``[B, num_return_sequences, max_length] int32`` including BOS;
    positions after EOS are pad. ``top_k=1`` is greedy. Static shapes: one
    compilation per (B*num_return, max_length).
    """
    cfg = model.cfg
    t_max = max_length or cfg.max_target_length
    b = enc_ids.shape[0]
    n = num_return_sequences

    # The whole decode loop runs inside ONE jitted function with params and
    # encoder arrays as ARGUMENTS — a scan body that closed over them would
    # bake the full parameter pytree into the jaxpr as constants (CLAUDE.md:
    # GB-scale captures hang this backend's remote compile). Cached per
    # (model cfg, shapes, sampling knobs) so repeated generation calls
    # reuse one executable.
    key = (repr(cfg), b * n, t_max, top_k, float(temperature))
    fn = _GEN_CACHE.get(key)
    if fn is None:
        def decode_all(params, enc_ids_r, enc_mask_r, rng_key):
            enc_hidden = model.apply(params, enc_ids_r, enc_mask_r,
                                     method="encode")
            tokens0 = jnp.full((b * n, t_max), cfg.pad_id, jnp.int32)
            tokens0 = tokens0.at[:, 0].set(cfg.bos_id)
            done0 = jnp.zeros((b * n,), jnp.bool_)

            def step(carry, t):
                tokens, done, key = carry
                key, sub = jax.random.split(key)
                dec_mask = (jnp.arange(t_max, dtype=jnp.int32)[None] <= t)
                dec_mask = jnp.broadcast_to(
                    dec_mask, tokens.shape).astype(jnp.int32)
                logits = model.apply(params, tokens, dec_mask, enc_hidden,
                                     enc_mask_r, method="decode")
                step_logits = jax.lax.dynamic_slice_in_dim(
                    logits, t, 1, axis=1)[:, 0]            # [B*n, V]
                kth = jax.lax.top_k(step_logits, top_k)[0][:, -1:]
                filtered = jnp.where(step_logits >= kth, step_logits, NEG)
                nxt = jax.random.categorical(sub, filtered / temperature,
                                             axis=-1)
                nxt = jnp.where(done, cfg.pad_id, nxt.astype(jnp.int32))
                tokens = jax.lax.dynamic_update_slice_in_dim(
                    tokens, nxt[:, None], t + 1, axis=1)
                done = done | (nxt == cfg.eos_id)
                return (tokens, done, key), None

            (tokens, _, _), _ = jax.lax.scan(
                step, (tokens0, done0, rng_key),
                jnp.arange(t_max - 1, dtype=jnp.int32))
            return tokens

        fn = jax.jit(decode_all)
        _GEN_CACHE[key] = fn

    enc_ids_r = jnp.repeat(enc_ids, n, axis=0)
    enc_mask_r = jnp.repeat(enc_mask, n, axis=0)
    tokens = fn(params, enc_ids_r, enc_mask_r, rng_key)
    return tokens.reshape(b, n, t_max)


def queries_to_tsv(path: str, passage_ids, query_lists) -> None:
    """Write the reference's ``query.tsv`` contract
    (``generate_query.py:208-214``): one row per passage,
    ``psg_id\\tq1\\t...\\tqN`` — the input of
    :meth:`simxns_tpu.data.curriculum.QueryExpander.from_tsv`."""
    with open(path, "w", encoding="utf-8") as f:
        for pid, qs in zip(passage_ids, query_lists):
            clean = [" ".join(str(q).split()) for q in qs]
            f.write("\t".join([str(pid)] + clean) + "\n")
