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
- MASTER's Condenser decoder stacks (2-layer ``BertLayer`` heads over
  ``[CLS || fresh embeddings]``, ``MASTER/pretrain/modeling.py:31-45,63-77``)
  reuse :class:`BertLayer` and the encoder's ``embed()`` method directly.

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
    type_vocab_size: int = 2           # 0 = no token-type embeddings
                                       # (DistilBERT, LEAD/modeling_distilbert.py)
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    # family knobs for the reference's non-BERT warm starts
    position_style: str = "bert"       # "bert": positions = arange(S);
                                       # "roberta": positions derived from
                                       # non-pad tokens + pad offset (HF
                                       # create_position_ids_from_input_ids —
                                       # the RobertaDot/MS-Doc path,
                                       # SimANS/model/models.py:340-359)
    pad_token_id: int = 0              # roberta position derivation uses 1
    embedding_size: Optional[int] = None  # ELECTRA-style factorized
                                       # embeddings: tables of this width +
                                       # a Dense projection to hidden_size
                                       # (MASTER/finetune/model/models_ele.py)
    # TPU knobs
    dtype: Any = jnp.bfloat16          # activation/compute dtype
    param_dtype: Any = jnp.float32     # master params stay f32
    attention_impl: str = "flash"      # "flash" auto-picks pallas/xla by seq len
    small_s_attn: Optional[str] = None # S < 256 flash sub-policy per model:
                                       # None = ops/flash_attention.SMALL_S_IMPL
                                       # (measured default "xla"); "group" =
                                       # the grouped VMEM-resident kernel
                                       # (custom VJP — the CE S=160 joint-
                                       # shape candidate, bench_r5 ce_attack)
    ffn_impl: str = "xla"              # "fused" = weight-stationary Pallas FFN
                                       # (fwd kernel, XLA bwd — encode);
                                       # "fused_vjp" = full-Pallas fwd+bwd
                                       # (the train path, ops/fused_ffn.py);
                                       # "int8" = quantized encode-only variant
    proj_impl: str = "xla"             # "int8" = q/k/v/output projections on
                                       # the int8 MXU (encode-only, like
                                       # ffn_impl="int8"; zero-grad round())
    layer_impl: str = "xla"            # "fused_int8" = whole layer as ONE
                                       # Pallas program (encode-only; see
                                       # ops/fused_layer.py)
    gelu: str = "exact"                # "exact" = erf GELU (HF BERT parity);
                                       # "tanh" = GPT-2-style approximation —
                                       # measured training-speed knob: the
                                       # erf transcendental costs ~20% of
                                       # tower fwd / ~9% of fwd+bwd on v5e
                                       # (bench_r3_results.jsonl
                                       # ablate_tower: gelutanh). Opt-in;
                                       # changes activations by ~1e-3.
    remat: bool = False                # gradient checkpointing per layer
    remat_policy: Optional[str] = None # None = recompute everything;
                                       # "dots" = save MXU (matmul) outputs,
                                       # recompute only elementwise/softmax —
                                       # the bwd pass then re-pays VPU work
                                       # but zero MXU FLOPs (middle ground
                                       # between remat and no-remat)

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

    def __post_init__(self):
        if self.gelu not in ("exact", "tanh"):
            raise ValueError(f"BertConfig.gelu must be 'exact' or 'tanh', "
                             f"got {self.gelu!r}")
        if self.position_style not in ("bert", "roberta"):
            raise ValueError(f"BertConfig.position_style must be 'bert' or "
                             f"'roberta', got {self.position_style!r}")
        for field, allowed in (
                ("attention_impl", ("xla", "flash")),
                ("small_s_attn", (None, "xla", "group")),
                ("ffn_impl", ("xla", "fused", "fused_vjp", "int8")),
                ("proj_impl", ("xla", "int8")),
                ("layer_impl", ("xla", "fused_int8"))):
            v = getattr(self, field)
            if v not in allowed:
                raise ValueError(f"BertConfig.{field} must be one of "
                                 f"{allowed}, got {v!r}")
        # every fused FFN/layer kernel computes exact erf GELU in-kernel;
        # silently running a different activation than cfg.gelu asks for
        # would drift from the trained params — refuse the combination
        if self.gelu == "tanh" and (
                self.ffn_impl != "xla" or self.layer_impl != "xla"):
            raise ValueError(
                "gelu='tanh' is only implemented by the XLA composition; "
                f"ffn_impl={self.ffn_impl!r}/layer_impl={self.layer_impl!r} "
                "hardcode exact erf GELU — use gelu='exact' with fused "
                "kernels, or the XLA path with tanh")


@dataclasses.dataclass
class EncoderOutput:
    last_hidden_state: jax.Array                      # [B, S, H]
    pooled: jax.Array                                 # [B, H] == CLS token
    hidden_states: Optional[Tuple[jax.Array, ...]] = None  # (L+1) x [B, S, H]
    attentions: Optional[Tuple[jax.Array, ...]] = None     # L x [B, heads, S, S]


def _guard_quantized_under_grad(x, impl: str) -> None:
    """Refuse to *train* through an encode-only quantized path.

    ``round()`` has zero gradient, so differentiating an int8 impl yields
    silently-zero weight gradients (or a pallas_call autodiff error). The
    quantized impls (``ffn_impl='int8'``, ``proj_impl='int8'``,
    ``layer_impl='fused_int8'``) are encode/serving-only; a training model
    must use a differentiable composition. Detection: under ``jax.grad`` /
    ``jax.vjp`` the activations carry a JVP/Linearize tracer even inside
    jit (grad re-traces the function body on top of the jit trace).
    """
    under_grad = False
    t = x
    while isinstance(t, jax.core.Tracer):
        if type(t).__name__ in ("JVPTracer", "LinearizeTracer"):
            under_grad = True
            break
        t = getattr(t, "primal", None)
    if under_grad:
        raise ValueError(
            f"BertConfig {impl} is an encode-only quantized path but is "
            "being differentiated: round() has zero gradient, so training "
            "through it produces zero/failing gradients. Build the training "
            "model with the default (differentiable) impls and reserve the "
            "quantized impls for a separate encode-only model view (the "
            "param trees interchange — see run.py --fast-encode).")


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

    def setup(self):
        cfg = self.cfg
        width = cfg.embedding_size or cfg.hidden_size
        emb_init = nn.initializers.normal(cfg.initializer_range)
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, width, embedding_init=emb_init,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, width,
            embedding_init=emb_init, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype)
        if cfg.type_vocab_size > 0:
            self.token_type_embeddings = nn.Embed(
                cfg.type_vocab_size, width, embedding_init=emb_init,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype)
        self.dropout = nn.Dropout(cfg.hidden_dropout)
        if width != cfg.hidden_size:
            # ELECTRA's factorized-embedding projection
            # (HF ElectraModel.embeddings_project)
            self.embeddings_project = _dense(cfg, cfg.hidden_size,
                                             "embeddings_project")

    def __call__(self, input_ids, token_type_ids=None, position_ids=None, *,
                 deterministic: bool = True):
        cfg = self.cfg
        b, s = input_ids.shape
        if position_ids is None:
            if cfg.position_style == "roberta":
                # HF create_position_ids_from_input_ids: non-pad tokens get
                # cumulative positions offset by pad_token_id (first real
                # token sits at pad_token_id + 1 = 2 for RoBERTa)
                not_pad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
                position_ids = jnp.cumsum(not_pad, axis=1) * not_pad \
                    + cfg.pad_token_id
            else:
                position_ids = jnp.broadcast_to(
                    jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids))
        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros((b, s), dtype=jnp.int32)
            x = x + self.token_type_embeddings(token_type_ids)
        x = self.layer_norm(x)
        x = self.dropout(x, deterministic=deterministic)
        if cfg.embedding_size and cfg.embedding_size != cfg.hidden_size:
            x = self.embeddings_project(x)
        return x


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, *, deterministic: bool = True,
                 output_attention: bool = False):
        cfg = self.cfg
        b, s, h = hidden.shape
        d = h // cfg.num_heads

        def split(x):
            return x.reshape(b, s, cfg.num_heads, d).transpose(0, 2, 1, 3)

        if cfg.proj_impl == "int8":
            # encode-only int8-MXU projections; _KernelBias declares the
            # same query/key/value/output {kernel, bias} param paths
            # nn.Dense would, so checkpoints interchange across proj_impl.
            _guard_quantized_under_grad(hidden, "proj_impl='int8'")
            from simxns_tpu.ops.fused_ffn import int8_dense

            x8 = hidden.astype(cfg.dtype)
            proj = {name: _KernelBias(cfg, h, h, name=name)()
                    for name in ("query", "key", "value", "output")}
            q = split(int8_dense(x8, *proj["query"]))
            k = split(int8_dense(x8, *proj["key"]))
            v = split(int8_dense(x8, *proj["value"]))
        else:
            q = split(_dense(cfg, h, "query")(hidden))
            k = split(_dense(cfg, h, "key")(hidden))
            v = split(_dense(cfg, h, "value")(hidden))
        # HF BERT applies dropout to attention probs in train mode
        # (attention_probs_dropout_prob); probs dropout forces the XLA
        # attention path (flash never materializes probs)
        attn_rng = None
        if not deterministic and cfg.attention_dropout > 0.0:
            attn_rng = self.make_rng("dropout")
        ctx, probs = multi_head_attention(
            q, k, v, attention_mask,
            impl=cfg.attention_impl, return_probs=output_attention,
            dropout_rate=cfg.attention_dropout, dropout_rng=attn_rng,
            small_s_impl=cfg.small_s_attn,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
        if cfg.proj_impl == "int8":
            out = int8_dense(ctx, *proj["output"])
        else:
            out = _dense(cfg, h, "output")(ctx)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="output_layer_norm")(
            out + hidden)
        return out, probs


class _KernelBias(nn.Module):
    """Declare Dense-compatible ``{kernel, bias}`` params without the matmul.

    The fused FFN kernel consumes raw weight matrices; declaring them under
    the same child names nn.Dense would use ("intermediate"/"output" ->
    kernel/bias) keeps checkpoints interchangeable across ``ffn_impl``.
    """

    cfg: BertConfig
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel",
                       nn.initializers.normal(self.cfg.initializer_range),
                       (self.features_in, self.features_out),
                       self.cfg.param_dtype)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features_out,), self.cfg.param_dtype)
        return k, b


class _LNParams(nn.Module):
    """Declare LayerNorm-compatible ``{scale, bias}`` without the math
    (same trick as _KernelBias: the fused layer kernel consumes raw
    arrays under the param paths nn.LayerNorm would create)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self):
        h = self.cfg.hidden_size
        return (self.param("scale", nn.initializers.ones, (h,),
                           self.cfg.param_dtype),
                self.param("bias", nn.initializers.zeros, (h,),
                           self.cfg.param_dtype))


class _AttnParams(nn.Module):
    """The param subtree BertSelfAttention would declare, math-free."""

    cfg: BertConfig

    @nn.compact
    def __call__(self):
        h = self.cfg.hidden_size
        out = {}
        for name in ("query", "key", "value", "output"):
            out[name] = _KernelBias(self.cfg, h, h, name=name)()
        out["ln"] = _LNParams(self.cfg, name="output_layer_norm")()
        return out


class BertLayer(nn.Module):
    """Post-LN transformer block (attention + GELU FFN), HF-BERT layout.

    Reused standalone by MASTER's Condenser decoder heads
    (``MASTER/pretrain/modeling.py:31-45``).
    """

    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, *, deterministic: bool = True,
                 output_attention: bool = False):
        cfg = self.cfg
        if (cfg.layer_impl == "fused_int8" and not output_attention
                and deterministic):
            # one Pallas program for the whole layer (encode-only: falls
            # back to the standard composition under train-mode dropout,
            # and round() has zero grad so it must never train);
            # param paths match the standard composition exactly, so
            # checkpoints interchange across layer_impl.
            _guard_quantized_under_grad(hidden, "layer_impl='fused_int8'")
            from simxns_tpu.ops.fused_layer import fused_encoder_layer_int8

            att = _AttnParams(cfg, name="attention")()
            w1, b1 = _KernelBias(cfg, cfg.hidden_size,
                                 cfg.intermediate_size, name="intermediate")()
            w2, b2 = _KernelBias(cfg, cfg.intermediate_size,
                                 cfg.hidden_size, name="output")()
            g2, be2 = _LNParams(cfg, name="output_layer_norm")()
            params = {
                "wq": att["query"][0], "bq": att["query"][1],
                "wk": att["key"][0], "bk": att["key"][1],
                "wv": att["value"][0], "bv": att["value"][1],
                "wo": att["output"][0], "bo": att["output"][1],
                "ln1_scale": att["ln"][0], "ln1_bias": att["ln"][1],
                "w1": w1, "b1": b1, "w2": w2, "b2": b2,
                "ln2_scale": g2, "ln2_bias": be2,
            }
            out = fused_encoder_layer_int8(
                hidden.astype(cfg.dtype), attention_mask, params,
                num_heads=cfg.num_heads, layer_norm_eps=cfg.layer_norm_eps)
            return out, None
        attn_out, probs = BertSelfAttention(cfg, name="attention")(
            hidden, attention_mask, deterministic=deterministic,
            output_attention=output_attention)
        if cfg.ffn_impl in ("fused", "fused_vjp", "int8"):
            from simxns_tpu.ops.fused_ffn import (
                fused_ffn, fused_ffn_vjp, int8_ffn)

            w1, b1 = _KernelBias(cfg, cfg.hidden_size,
                                 cfg.intermediate_size, name="intermediate")()
            w2, b2 = _KernelBias(cfg, cfg.intermediate_size,
                                 cfg.hidden_size, name="output")()
            # "int8" is the encode/serving path (2x MXU peak); round() has
            # zero gradient, so it must not be used for training.
            # "fused_vjp" is the TRAIN path: full-Pallas fwd+bwd.
            if cfg.ffn_impl == "int8":
                _guard_quantized_under_grad(attn_out, "ffn_impl='int8'")
            impl = {"int8": int8_ffn, "fused": fused_ffn,
                    "fused_vjp": fused_ffn_vjp}[cfg.ffn_impl]
            out = impl(attn_out.astype(cfg.dtype), w1, b1, w2, b2)
        else:
            inter = _dense(cfg, cfg.intermediate_size, "intermediate")(attn_out)
            inter = nn.gelu(inter, approximate=cfg.gelu == "tanh")
            out = _dense(cfg, cfg.hidden_size, "output")(inter)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="output_layer_norm")(
            out + attn_out)
        return out, probs


class BertEncoder(nn.Module):
    """Token ids -> contextual hiddens + CLS pooled vector.

    ``output_hidden_states``/``output_attentions`` expose what LEAD's vendored
    BERT exposes (per-layer CLS scores + attention maps, ``LEAD/models.py``).
    ``embed()`` exposes the embedding sublayer for Condenser decoder inputs
    (``MASTER/pretrain/modeling.py:64`` uses ``lm.bert.embeddings`` directly).
    """

    cfg: BertConfig

    def setup(self):
        cfg = self.cfg
        self.embeddings = BertEmbeddings(cfg)
        self.layers = [BertLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.num_layers)]

    def embed(self, input_ids, token_type_ids=None, *,
              deterministic: bool = True):
        """Fresh (position-aware) embeddings of a token sequence."""
        return self.embeddings(input_ids, token_type_ids,
                               deterministic=deterministic)

    def run_layers(self, hidden, attention_mask, *, deterministic: bool = True,
                   output_hidden_states: bool = False,
                   output_attentions: bool = False):
        all_hidden = [hidden] if output_hidden_states else None
        all_attn = [] if output_attentions else None
        x = hidden
        for layer in self.layers:
            if self.cfg.remat and not output_attentions:
                # the layer must be the remat-traced module itself:
                # closing over `layer` while passing `self` leaks tracers
                # through the submodule's scope under value_and_grad.
                # prevent_cse must stay True under plain jit: with False,
                # XLA CSEs the recompute back into the saved forward and
                # the activation memory saving vanishes (measured: B=512
                # fwd+bwd held the same 13.5G HLO temp either way).
                def body(mdl, h, m):
                    return mdl(h, m, deterministic=deterministic)[0]

                policy = None
                if self.cfg.remat_policy == "dots":
                    policy = (jax.checkpoint_policies
                              .dots_with_no_batch_dims_saveable)
                elif self.cfg.remat_policy is not None:
                    raise ValueError(
                        f"unknown remat_policy {self.cfg.remat_policy!r}")
                x = nn.remat(body, policy=policy)(layer, x, attention_mask)
                probs = None
            else:
                x, probs = layer(x, attention_mask,
                                 deterministic=deterministic,
                                 output_attention=output_attentions)
            if output_hidden_states:
                all_hidden.append(x)
            if output_attentions:
                all_attn.append(probs)
        return x, all_hidden, all_attn

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
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), dtype=jnp.int32)
        x = self.embeddings(input_ids, token_type_ids,
                            deterministic=deterministic)
        x, all_hidden, all_attn = self.run_layers(
            x, attention_mask, deterministic=deterministic,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions)
        return EncoderOutput(
            last_hidden_state=x,
            pooled=x[:, 0],
            hidden_states=tuple(all_hidden) if output_hidden_states else None,
            attentions=tuple(all_attn) if output_attentions else None,
        )


class MLMHead(nn.Module):
    """BERT MLM classifier (``BertOnlyMLMHead``): transform + vocab proj.

    Pass ``shared_embedding`` (the word-embedding table [V, H]) to tie the
    output projection to the input embeddings as HF does; otherwise an
    untied projection matrix is learned.
    """

    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, shared_embedding: Optional[jax.Array] = None):
        cfg = self.cfg
        x = _dense(cfg, cfg.hidden_size, "transform")(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="transform_layer_norm")(x)
        if shared_embedding is not None:
            logits = jnp.einsum("bsh,vh->bsv", x,
                                shared_embedding.astype(x.dtype),
                                preferred_element_type=jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,),
                              cfg.param_dtype)
            return logits + bias
        return _dense(cfg, cfg.vocab_size, "decoder")(x).astype(jnp.float32)


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
