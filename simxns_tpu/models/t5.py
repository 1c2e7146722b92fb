"""T5 encoder-decoder, architecture-faithful for checkpoint import.

The reference's CAPSTONE pipeline warm-starts doc2query generation from
``castorini/doc2query-t5-base-msmarco`` (``CAPSTONE/models/generate_query.py:
115-235``). :class:`simxns_tpu.models.seq2seq.Seq2Seq` provides the
*capability* with BERT-family primitives, but its architecture (post-LN,
learned absolute positions, biased dense, GELU) cannot carry T5 weights.
This module is the T5 v1.0 architecture itself — RMS layer norm, pre-LN
blocks, bucketed relative position bias in the first block of each stack,
bias-free dense, ReLU FFN, unscaled attention scores, tied LM head with the
``d_model**-0.5`` output scaling — so
:func:`simxns_tpu.models.hf_import.convert_hf_t5` round-trips real
checkpoints token-for-token (tests/test_hf_import.py parity vs the torch
module on random init, the same method as BERT/RoBERTa/ELECTRA/DistilBERT).

Generation mirrors :func:`simxns_tpu.models.seq2seq.generate`: the whole
top-k sampling loop is ONE jitted ``lax.scan`` with params as arguments
(CLAUDE.md: closures over large arrays hang this backend's remote compile),
re-running the teacher-forcing decoder per position — static shapes, one
compilation per (batch*returns, max_length).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG = -1e9

_GEN_CACHE: dict = {}


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64                       # per-head dim (inner = heads*d_kv)
    d_ff: int = 3072
    num_layers: int = 12
    num_decoder_layers: Optional[int] = None
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dropout_rate: float = 0.1
    tie_word_embeddings: bool = True     # v1.0 ties; scales output by
                                         # d_model**-0.5 (HF T5ForCondGen)
    initializer_factor: float = 1.0
    pad_id: int = 0                      # T5 decoder starts from PAD
    eos_id: int = 1
    max_target_length: int = 64          # generate() default in reference
    dtype: object = jnp.float32
    param_dtype: object = jnp.float32

    @property
    def n_dec(self) -> int:
        return self.num_decoder_layers or self.num_layers

    def replace(self, **kw) -> "T5Config":
        return dataclasses.replace(self, **kw)


class RMSNorm(nn.Module):
    """T5LayerNorm: no mean subtraction, no bias; norm in f32 like HF
    (hidden states are cast to f32 for the variance), scale in param dtype."""

    eps: float
    dtype: object
    param_dtype: object

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (w * y.astype(self.dtype)).astype(self.dtype)


def relative_position_bucket(relative_position, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF ``T5Attention._relative_position_bucket`` semantics, vectorized.

    ``relative_position = key_pos - query_pos``. Bidirectional (encoder)
    splits buckets between past/future; unidirectional (decoder) buckets
    only the past. Near positions get exact buckets, far ones log-spaced.
    """
    rp = relative_position
    buckets = 0
    if bidirectional:
        num_buckets //= 2
        buckets = (rp > 0).astype(jnp.int32) * num_buckets
        rp = jnp.abs(rp)
    else:
        rp = -jnp.minimum(rp, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_f = jnp.maximum(rp.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(rp_f / max_exact) / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return buckets + jnp.where(is_small, rp, large)


class T5Attention(nn.Module):
    """q/k/v/o without bias, UNSCALED scores (T5 folds the 1/sqrt(d) into
    its initializer), additive ``bias`` carrying relative-position bias and
    masks."""

    cfg: T5Config

    @nn.compact
    def __call__(self, q_in, kv_in, bias, *, deterministic: bool = True):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        init = nn.initializers.normal(cfg.initializer_factor
                                      * (cfg.d_model * cfg.d_kv) ** -0.5)

        def dense(n_out, name, kernel_init=init):
            return nn.Dense(n_out, use_bias=False, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            kernel_init=kernel_init, name=name)

        def heads(x):
            b, s, _ = x.shape
            return x.reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(
                0, 2, 1, 3)

        q = heads(dense(inner, "q")(q_in))
        k = heads(dense(inner, "k",
                        nn.initializers.normal(
                            cfg.initializer_factor * cfg.d_model ** -0.5))(
                                kv_in))
        v = heads(dense(inner, "v",
                        nn.initializers.normal(
                            cfg.initializer_factor * cfg.d_model ** -0.5))(
                                kv_in))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        probs = nn.Dropout(cfg.dropout_rate)(probs,
                                             deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, s, d = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return dense(cfg.d_model, "o",
                     nn.initializers.normal(
                         cfg.initializer_factor * inner ** -0.5))(ctx)


class T5Block(nn.Module):
    """Pre-LN: x += dropout(attn(norm(x))); optional cross-attn; ReLU FFN."""

    cfg: T5Config
    is_decoder: bool

    @nn.compact
    def __call__(self, x, self_bias, enc_hidden=None, cross_bias=None, *,
                 deterministic: bool = True):
        cfg = self.cfg
        drop = nn.Dropout(cfg.dropout_rate)

        def norm(name):
            return RMSNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype,
                           name=name)

        normed = norm("self_norm")(x)
        y = T5Attention(cfg, name="self_attention")(
            normed, normed, self_bias, deterministic=deterministic)
        x = x + drop(y, deterministic=deterministic)
        if self.is_decoder:
            normed = norm("cross_norm")(x)
            y = T5Attention(cfg, name="cross_attention")(
                normed, enc_hidden, cross_bias, deterministic=deterministic)
            x = x + drop(y, deterministic=deterministic)
        normed = norm("ffn_norm")(x)
        init_wi = nn.initializers.normal(
            cfg.initializer_factor * cfg.d_model ** -0.5)
        init_wo = nn.initializers.normal(
            cfg.initializer_factor * cfg.d_ff ** -0.5)
        h = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, kernel_init=init_wi,
                     name="wi")(normed)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        y = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, kernel_init=init_wo,
                     name="wo")(h)
        return x + drop(y, deterministic=deterministic)


class T5(nn.Module):
    """T5ForConditionalGeneration-faithful encoder-decoder.

    Relative position bias lives in the FIRST block of each stack (HF
    layout: ``block.0.layer.0.SelfAttention.relative_attention_bias``) and
    is shared by all blocks of that stack; cross-attention bias is zero.
    """

    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        emb_init = nn.initializers.normal(cfg.initializer_factor)
        self.shared_embed = nn.Embed(cfg.vocab_size, cfg.d_model,
                                     embedding_init=emb_init,
                                     dtype=cfg.dtype,
                                     param_dtype=cfg.param_dtype)
        self.enc_rel_bias = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads,
            embedding_init=emb_init, dtype=jnp.float32,
            param_dtype=cfg.param_dtype)
        self.dec_rel_bias = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads,
            embedding_init=emb_init, dtype=jnp.float32,
            param_dtype=cfg.param_dtype)
        # flax forbids explicit name= on setup-assigned submodules; list
        # entries auto-name as enc_blocks_<i> (hf_import matches that)
        self.enc_blocks = [T5Block(cfg, is_decoder=False)
                           for i in range(cfg.num_layers)]
        self.dec_blocks = [T5Block(cfg, is_decoder=True)
                           for i in range(cfg.n_dec)]
        self.enc_final_norm = RMSNorm(cfg.layer_norm_eps, cfg.dtype,
                                      cfg.param_dtype)
        self.dec_final_norm = RMSNorm(cfg.layer_norm_eps, cfg.dtype,
                                      cfg.param_dtype)
        # parameterless; shared across encode/decode (non-compact methods
        # cannot construct submodules inline)
        self.dropout = nn.Dropout(cfg.dropout_rate)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)

    def _pos_bias(self, table, qlen, klen, bidirectional):
        cfg = self.cfg
        q_pos = jnp.arange(qlen, dtype=jnp.int32)[:, None]
        k_pos = jnp.arange(klen, dtype=jnp.int32)[None, :]
        buckets = relative_position_bucket(
            k_pos - q_pos, bidirectional,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        vals = table(buckets)                       # [q, k, heads]
        return vals.transpose(2, 0, 1)[None]        # [1, heads, q, k]

    def encode(self, enc_ids, enc_mask, *, deterministic: bool = True):
        cfg = self.cfg
        x = self.shared_embed(enc_ids)
        x = self.dropout(x, deterministic=deterministic)
        s = enc_ids.shape[1]
        bias = (self._pos_bias(self.enc_rel_bias, s, s, True)
                + jnp.where(enc_mask[:, None, None, :] > 0, 0.0, NEG))
        for blk in self.enc_blocks:
            x = blk(x, bias, deterministic=deterministic)
        x = self.enc_final_norm(x)
        return self.dropout(x, deterministic=deterministic)

    def decode(self, dec_ids, dec_mask, enc_hidden, enc_mask, *,
               deterministic: bool = True):
        """Teacher-forcing decoder -> LM logits [B, T, V] (f32)."""
        cfg = self.cfg
        b, t = dec_ids.shape
        x = self.shared_embed(dec_ids)
        x = self.dropout(x, deterministic=deterministic)
        causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
        self_bias = (self._pos_bias(self.dec_rel_bias, t, t, False)
                     + jnp.where(causal[None, None]
                                 & (dec_mask[:, None, None, :] > 0),
                                 0.0, NEG))
        cross_bias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, NEG)
        for blk in self.dec_blocks:
            x = blk(x, self_bias, enc_hidden, cross_bias,
                    deterministic=deterministic)
        x = self.dec_final_norm(x)
        x = self.dropout(x, deterministic=deterministic)
        if cfg.tie_word_embeddings:
            x = x * (cfg.d_model ** -0.5)           # HF T5ForCondGen scaling
            table = self.shared_embed.embedding
            return jnp.einsum("bth,vh->btv", x, table.astype(x.dtype),
                              preferred_element_type=jnp.float32)
        return self.lm_head(x).astype(jnp.float32)

    def __call__(self, enc_ids, enc_mask, dec_ids, dec_mask, *,
                 deterministic: bool = True):
        enc = self.encode(enc_ids, enc_mask, deterministic=deterministic)
        return self.decode(dec_ids, dec_mask, enc, enc_mask,
                           deterministic=deterministic)


def generate(model: T5, params, enc_ids, enc_mask, rng_key, *,
             max_length: Optional[int] = None, top_k: int = 10,
             temperature: float = 1.0,
             num_return_sequences: int = 1) -> jax.Array:
    """Top-k sampling decode (``generate_query.py:115-235``:
    ``do_sample=True, top_k=10, num_return_sequences=N``). T5 decoding
    starts from PAD (HF ``decoder_start_token_id = pad``); EOS is 1.
    Returns ``[B, N, max_length] int32``; post-EOS positions are PAD."""
    cfg = model.cfg
    t_max = max_length or cfg.max_target_length
    b = enc_ids.shape[0]
    n = num_return_sequences

    key = (repr(cfg), b * n, t_max, top_k, float(temperature))
    fn = _GEN_CACHE.get(key)
    if fn is None:
        def decode_all(params, enc_ids_r, enc_mask_r, rng_key):
            enc_hidden = model.apply(params, enc_ids_r, enc_mask_r,
                                     method="encode")
            tokens0 = jnp.full((b * n, t_max), cfg.pad_id, jnp.int32)
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
                    logits, t, 1, axis=1)[:, 0]
                # HF warper order: temperature BEFORE top-k (for T != 1
                # the kept set differs otherwise; no-op at the doc2query
                # default T=1.0)
                step_logits = step_logits / temperature
                kth = jax.lax.top_k(step_logits, top_k)[0][:, -1:]
                filtered = jnp.where(step_logits >= kth, step_logits, NEG)
                nxt = jax.random.categorical(sub, filtered, axis=-1)
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
    return fn(params, enc_ids_r, enc_mask_r, rng_key).reshape(b, n, t_max)


def doc2query_tsv(model: T5, params, tokenizer, passages, out_path: str, *,
                  num_queries: int = 5, max_src_length: int = 512,
                  max_length: int = 64, top_k: int = 10,
                  batch_size: int = 32, seed: int = 0) -> None:
    """Generate docT5query expansion queries for every passage and write
    the ``psg_id\\tq1\\tq2...`` TSV that CAPSTONE's ``--query-tsv`` /
    :meth:`data.curriculum.QueryExpander.from_tsv` consume.

    The reference's generation stage (``CAPSTONE/models/generate_query.py:
    115-235``): encode each passage, sample ``num_return_sequences``
    queries with ``do_sample=True, top_k=10``, decode, one TSV row per
    passage. ``passages`` is an iterable of ``(psg_id, text)``;
    ``tokenizer`` must round-trip text (a HF T5 tokenizer — the hashing
    synthetic tokenizer cannot decode). Batches are padded to one static
    shape so the whole run is a single XLA compilation.
    """
    import numpy as np

    from .seq2seq import queries_to_tsv

    items = list(passages)
    ids_out, q_out = [], []
    key = jax.random.PRNGKey(seed)
    for lo in range(0, len(items), batch_size):
        chunk = items[lo:lo + batch_size]
        enc = np.zeros((batch_size, max_src_length), np.int32)
        msk = np.zeros((batch_size, max_src_length), np.int32)
        for r, (_, text) in enumerate(chunk):
            try:                        # HF tokenizers need truncation=True
                toks = tokenizer.encode(text, max_length=max_src_length,
                                        truncation=True)
            except TypeError:
                toks = tokenizer.encode(text,
                                        max_length=max_src_length)
            toks = toks[:max_src_length]
            enc[r, :len(toks)] = toks
            msk[r, :len(toks)] = 1
        key, sub = jax.random.split(key)
        toks = generate(model, params, enc, msk, sub,
                        max_length=max_length, top_k=top_k,
                        num_return_sequences=num_queries)
        toks = np.asarray(toks)
        for r, (pid, _) in enumerate(chunk):
            qs = []
            for s in range(num_queries):
                row = toks[r, s]
                end = np.nonzero(row == model.cfg.eos_id)[0]
                row = row[1:int(end[0])] if len(end) else row[1:]
                qs.append(tokenizer.decode(row.tolist()).strip())
            ids_out.append(pid)
            q_out.append(qs)
    queries_to_tsv(out_path, ids_out, q_out)
