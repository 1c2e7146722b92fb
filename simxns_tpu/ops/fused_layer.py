"""Whole-transformer-layer fused Pallas kernel (int8 encode path).

The encode/mine phase is the headline workload (the reference's
"Evaluation 3h" envelope, ``MASTER/finetune/ft_MS_MASTER.sh:23``) and is
GEMM-bound. Measured attribution at B=1024/S=128/BERT-base (ROADMAP,
bench_r2_results.jsonl): the int8 FFN kernel lifted the FFN pair to ~70% of
bf16-peak-equivalent, but the q/k/v/output projections still run as four
separate XLA GEMMs at ~48% — and quantizing them as four separate Pallas
calls measured NEGATIVE (3154 vs 4469 p/s: per-call boundaries break XLA's
fusion of the surrounding bias/transpose/softmax chain).

This kernel is the logical endpoint: ONE Pallas program per layer covering
q/k/v projections (int8 MXU), the attention core (bf16 MXU, f32 softmax),
output projection (int8), residual + LayerNorm (f32), and the int8 FFN with
exact GELU — so there are no XLA<->Pallas boundaries inside the layer and
every GEMM runs on the MXU from VMEM-stationary weights (int8 weights for
BERT-base total ~7 MB, well inside the ~16 MB VMEM budget; bf16 could not
fit all six matrices plus scratch).

Encode-only: quantization round() has zero gradient — the training path
keeps the standard composition. Post-LN (HF BERT) semantics; replaces
``BertSelfAttention`` + FFN for ``BertConfig.layer_impl="fused_int8"``
(reference: HF BertLayer used throughout SimXNS, SURVEY.md §2.1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simxns_tpu.ops.fused_ffn import _gelu_exact, _quant_rows, quantize_weight

# Flip in tests to run under the Pallas interpreter on CPU.
INTERPRET = False


#: Mosaic scoped-VMEM (stack) budget the tile selector targets. The
#: pallas_call raises the compile limit to 64M (v5e VMEM is 128M);
#: targeting 48M of estimated stack leaves room for the double-buffered
#: x/bias/out blocks (~3M at CE-large tiles) under that limit.
_STACK_BUDGET_BYTES = 48_000_000


def _pick_seqs_per_tile(b: int, s: int, h: int, f: int,
                        seqs_per_tile: int) -> int:
    """Sequences per Pallas program, bounded by the scoped-VMEM stack.

    Mosaic stack-allocates the VMEM-resident int8 weights (4H^2 + 2HF
    bytes — their index maps are constant, so they are not re-streamed)
    plus the per-program intermediates (q/k/v accumulators, f32 ctx/y1,
    the [TM, F] GELU pair), ~TM*(4H + 6F) bytes. The model matches two
    compile-time measurements at H=1024/F=4096: 20.94M at TM=320 and
    17.22M at TM=160 — the BERT-large S=160 teacher shapes that blew
    Mosaic's default 16M scoped limit before the kernel raised it to
    64M. Returns 0 when even a single sequence cannot fit the budget
    (caller falls back to the XLA expression).
    """
    n_seq = max(1, seqs_per_tile)
    while b % n_seq:
        n_seq //= 2
    weight_bytes = 4 * h * h + 2 * h * f
    per_row_bytes = 4 * h + 6 * f

    def est(rows):
        return weight_bytes + rows * per_row_bytes

    while n_seq > 1 and est(n_seq * s) > _STACK_BUDGET_BYTES:
        n_seq //= 2
    if est(s) > _STACK_BUDGET_BYTES:
        return 0
    return n_seq


def _layer_norm(x, g_ref, b_ref, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * g_ref[...] + b_ref[...]


def _layer_kernel(x_ref, bias_ref,
                  wq_ref, sq_ref, bq_ref,
                  wk_ref, sk_ref, bk_ref,
                  wv_ref, sv_ref, bv_ref,
                  wo_ref, so_ref, bo_ref,
                  g1_ref, be1_ref,
                  w1_ref, s1_ref, b1_ref,
                  w2_ref, s2_ref, b2_ref,
                  g2_ref, be2_ref,
                  o_ref, *, n_seq: int, s_len: int, heads: int, eps: float):
    h = x_ref.shape[-1]
    d = h // heads
    x = x_ref[...]                                    # [TM, H] bf16
    xq, xs = _quant_rows(x)

    def proj(w_ref, s_ref, b_ref, rows_q, rows_s):
        acc = jnp.dot(rows_q, w_ref[...], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * rows_s * s_ref[...] + b_ref[...]

    q = proj(wq_ref, sq_ref, bq_ref, xq, xs).astype(jnp.bfloat16)
    k = proj(wk_ref, sk_ref, bk_ref, xq, xs).astype(jnp.bfloat16)
    v = proj(wv_ref, sv_ref, bv_ref, xq, xs).astype(jnp.bfloat16)

    # Attention core as statically-unrolled 2D matmuls per (sequence,
    # head): Mosaic has no lowering for the [TM,H]->[n,S,heads,D]
    # reshape/transpose ("unsupported shape cast"), and 2D slices of 2D
    # values lower cleanly. bias_ref is [TM, S]: every row carries its
    # own sequence's additive key-bias (pre-broadcast in XLA).
    bias = bias_ref[...]
    inv_sqrt_d = 1.0 / (d ** 0.5)
    rows = []
    for si in range(n_seq):
        r0 = si * s_len
        brow = bias[r0: r0 + 1, :]                    # [1, S]
        head_outs = []
        for hd in range(heads):
            c0 = hd * d
            qs = q[r0: r0 + s_len, c0: c0 + d]
            ks = k[r0: r0 + s_len, c0: c0 + d]
            vs = v[r0: r0 + s_len, c0: c0 + d]
            sc = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt_d
            sc = sc + brow
            sc = sc - jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            head_outs.append(jax.lax.dot_general(
                p, vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        rows.append(jnp.concatenate(head_outs, axis=1))
    ctx = jnp.concatenate(rows, axis=0) if n_seq > 1 else rows[0]

    cq, cs = _quant_rows(ctx)
    attn = proj(wo_ref, so_ref, bo_ref, cq, cs)       # [TM, H] f32
    y1 = _layer_norm(attn + x.astype(jnp.float32), g1_ref, be1_ref, eps)

    yq, ys = _quant_rows(y1)
    mid = _gelu_exact(proj(w1_ref, s1_ref, b1_ref, yq, ys))   # [TM, F]
    mq, ms = _quant_rows(mid)
    ffn = proj(w2_ref, s2_ref, b2_ref, mq, ms)
    o_ref[...] = _layer_norm(ffn + y1, g2_ref, be2_ref, eps
                             ).astype(o_ref.dtype)


def fused_encoder_layer_int8(
    x: jax.Array,                 # [B, S, H] activations
    attention_mask: jax.Array,    # [B, S] 1/0 key mask (or None)
    params: dict,                 # see below
    *,
    num_heads: int,
    layer_norm_eps: float = 1e-12,
    seqs_per_tile: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """One post-LN BERT layer as a single Pallas program (encode only).

    ``params`` keys: wq/bq, wk/bk, wv/bv, wo/bo (attention, [H,H]/[H]),
    ln1_scale/ln1_bias, w1/b1 ([H,F]/[F]), w2/b2 ([F,H]/[H]),
    ln2_scale/ln2_bias — raw f32 weight matrices (quantized per call, cost
    trivial next to the batch work).
    """
    if interpret is None:
        interpret = INTERPRET or jax.devices()[0].platform != "tpu"
    b, s, h = x.shape
    f = params["w1"].shape[1]
    # same tiling guard as int8_ffn/int8_dense (ops/fused_ffn.py): Mosaic
    # blocks must tile the lane dim — fall back to the XLA expression for
    # shapes the kernel can't block instead of failing at lowering
    # (interpret mode has no tiling constraint; tests run tiny dims there)
    if not interpret and (h % 128 or f % 128):
        return layer_reference(x, attention_mask, params,
                               num_heads=num_heads,
                               layer_norm_eps=layer_norm_eps
                               ).astype(x.dtype)
    n_seq = _pick_seqs_per_tile(b, s, h, f, seqs_per_tile)
    if not interpret and n_seq == 0:
        # a single sequence's stack exceeds the scoped-VMEM budget — this
        # shape can't run fused
        return layer_reference(x, attention_mask, params,
                               num_heads=num_heads,
                               layer_norm_eps=layer_norm_eps
                               ).astype(x.dtype)
    n_seq = max(1, n_seq)
    tm = n_seq * s

    if attention_mask is None:
        bias = jnp.zeros((b * s, s), jnp.float32)
    else:
        row = jnp.where(attention_mask > 0, 0.0, -1e9).astype(jnp.float32)
        bias = jnp.broadcast_to(row[:, None, :], (b, s, s)).reshape(b * s, s)

    quant = {k: quantize_weight(params[k]) for k in
             ("wq", "wk", "wv", "wo", "w1", "w2")}

    def w_args(name):
        wq8, sc = quant[name]
        return wq8, sc

    def vec(name, width):
        return params[name].astype(jnp.float32).reshape(1, width)

    kernel = functools.partial(
        _layer_kernel, n_seq=n_seq, s_len=s, heads=num_heads,
        eps=layer_norm_eps)

    def w_specs(i, o):
        return [pl.BlockSpec((i, o), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, o), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, o), lambda g: (0, 0),
                             memory_space=pltpu.VMEM)]

    ln_spec = pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tm, h), lambda g: (g, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, s), lambda g: (g, 0), memory_space=pltpu.VMEM),
        *w_specs(h, h), *w_specs(h, h), *w_specs(h, h), *w_specs(h, h),
        ln_spec, ln_spec,
        *w_specs(h, f), *w_specs(f, h),
        ln_spec, ln_spec,
    ]
    flops = 2 * b * s * h * (4 * h + 4 * f) + 4 * b * num_heads * s * s * (
        h // num_heads)
    y = pl.pallas_call(
        kernel,
        grid=(b * s // tm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, h), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * s, h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * s * h * 2 + 4 * h * h + 2 * h * f,
            transcendentals=b * s * (f + num_heads * s)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(b * s, h), bias,
      *w_args("wq"), vec("bq", h),
      *w_args("wk"), vec("bk", h),
      *w_args("wv"), vec("bv", h),
      *w_args("wo"), vec("bo", h),
      vec("ln1_scale", h), vec("ln1_bias", h),
      *w_args("w1"), vec("b1", f),
      *w_args("w2"), vec("b2", h),
      vec("ln2_scale", h), vec("ln2_bias", h))
    return y.reshape(b, s, h)


def layer_reference(x, attention_mask, params, *, num_heads: int,
                    layer_norm_eps: float = 1e-12) -> jax.Array:
    """The unquantized XLA expression the kernel approximates (test oracle).

    Mirrors BertSelfAttention + FFN post-LN composition (models/bert.py)
    with f32 math.
    """
    b, s, h = x.shape
    d = h // num_heads
    xf = x.astype(jnp.float32)

    def dense(name_w, name_b, t):
        return t @ params[name_w].astype(jnp.float32) + params[
            name_b].astype(jnp.float32)

    q = dense("wq", "bq", xf).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    k = dense("wk", "bk", xf).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    v = dense("wv", "bv", xf).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
    if attention_mask is not None:
        scores = scores + jnp.where(attention_mask > 0, 0.0, -1e9
                                    )[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v
                     ).transpose(0, 2, 1, 3).reshape(b, s, h)
    attn = dense("wo", "bo", ctx)

    def ln(t, gname, bname):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return ((t - mu) * jax.lax.rsqrt(var + layer_norm_eps)
                * params[gname].astype(jnp.float32)
                + params[bname].astype(jnp.float32))

    y1 = ln(attn + xf, "ln1_scale", "ln1_bias")
    mid = jax.nn.gelu(dense("w1", "b1", y1), approximate=False)
    out = ln(dense("w2", "b2", mid) + y1, "ln2_scale", "ln2_bias")
    return out.astype(x.dtype)
