"""Weight-stationary fused FFN Pallas kernel (gelu(x@W1+b1)@W2+b2).

The encode-phase MXU attribution (ROADMAP item 2) showed the BERT FFN chain
is the binder: XLA tops out ~53% MXU at SimXNS shapes because the [M, 4H]
intermediate round-trips HBM between the two GEMMs (at B=1024, S=128, H=768
that is 805 MB each way per layer). This kernel keeps W1/W2 stationary in
VMEM across the whole batch (their BlockSpec index never changes, so Mosaic
DMAs them once), tiles the token dim, and materializes the intermediate only
as a [tile_m, 4H] VMEM scratch — HBM traffic drops to x once in, y once out.

Both GEMMs run on the MXU (bf16 in, f32 accumulate); bias-add and exact
(erf) GELU run on the VPU between them, in f32. Backward falls back to the
XLA expression via ``jax.vjp`` — training grads are plain large GEMMs that
XLA already schedules well; the mine/encode phase (forward-only, the
reference's "Evaluation 3h" envelope) is where the fusion pays.

Replaces: HF ``BertIntermediate``+``BertOutput`` torch GEMMs (SURVEY.md
§2.1; ``SimANS/model/models.py`` via HF BertLayer).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flip in tests to run under the Pallas interpreter on CPU.
INTERPRET = False


def _interp() -> bool:
    return INTERPRET or jax.devices()[0].platform != "tpu"



_TILE_M = 256


def ffn_reference(x: jax.Array, w1, b1, w2, b2) -> jax.Array:
    """The XLA expression the kernel must match (and the VJP source).

    Mirrors two ``nn.Dense(dtype=bf16)`` + exact gelu: weights cast to the
    activation dtype, f32 MXU accumulation, bias added post-cast.
    """
    dt = x.dtype
    h = jnp.dot(x, w1.astype(dt), preferred_element_type=jnp.float32)
    h = (h.astype(dt) + b1.astype(dt)).astype(jnp.float32)
    g = jax.nn.gelu(h, approximate=False).astype(dt)
    y = jnp.dot(g, w2.astype(dt), preferred_element_type=jnp.float32)
    return (y.astype(dt) + b2.astype(dt))


def _erf(z):
    """f32 erf via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7).

    Mosaic has no erf/erfc lowering (NotImplementedError on TPU), so exact
    GELU inside the kernel uses this rational approximation — well under
    bf16 resolution of the surrounding activations.
    """
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(z < 0, -e, e)


def _gelu_exact(h):
    return 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    dt = o_ref.dtype
    x = x_ref[...]                                    # [TM, H] bf16
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = (h.astype(dt) + b1_ref[0].astype(dt)).astype(jnp.float32)
    g = _gelu_exact(h).astype(dt)                     # [TM, F]
    y = jnp.dot(g, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (y.astype(dt) + b2_ref[0].astype(dt))


def _ffn_call(x2d: jax.Array, w1, b1, w2, b2, *, tile_m: int,
              interpret: bool) -> jax.Array:
    m, h = x2d.shape
    f = w1.shape[1]
    dt = x2d.dtype
    grid = (m // tile_m,)
    flops = 2 * m * h * f * 2
    return pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * m * h * 2 + (2 * h * f) * 2,
            transcendentals=m * f),
        interpret=interpret,
    )(x2d, w1.astype(dt), b1.reshape(1, -1), w2.astype(dt),
      b2.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(tile_m, x2d, w1, b1, w2, b2):
    return _ffn_call(x2d, w1, b1, w2, b2, tile_m=tile_m,
                     interpret=_interp())


def _fused_fwd(tile_m, x2d, w1, b1, w2, b2):
    return _fused(tile_m, x2d, w1, b1, w2, b2), (x2d, w1, b1, w2, b2)


def _fused_bwd(tile_m, res, g):
    _, vjp = jax.vjp(ffn_reference, *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


# --- int8 variant ------------------------------------------------------------
#
# v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 TOPS).
# For the forward-only encode/mine phase (VERDICT r1 item 4's second lever)
# we quantize weights per OUTPUT CHANNEL and activations per TOKEN (absmax
# symmetric), dequantize in f32 between the two GEMMs, and keep bias + GELU
# exact. Retrieval embeddings tolerate this easily (the index already stores
# bf16); the training path never uses it.

def _quant_rows(x):
    """Per-row symmetric int8 quantization: -> (q int8, scale f32 [M,1])."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quantize_weight(w):
    """Per-output-channel symmetric int8: [I, O] -> (int8 [I, O], f32 [1, O])."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _ffn_int8_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     o_ref):
    xq, xs = _quant_rows(x_ref[...])                  # [TM, H] i8, [TM, 1]
    acc = jnp.dot(xq, w1_ref[...],
                  preferred_element_type=jnp.int32)   # [TM, F] i32
    h = acc.astype(jnp.float32) * xs * s1_ref[...] + b1_ref[...].astype(
        jnp.float32)
    g = _gelu_exact(h)
    gq, gs = _quant_rows(g)
    acc2 = jnp.dot(gq, w2_ref[...], preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * gs * s2_ref[...] + b2_ref[...].astype(
        jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def int8_ffn(x: jax.Array, w1: jax.Array, b1: jax.Array,
             w2: jax.Array, b2: jax.Array, *,
             tile_m: int = 256) -> jax.Array:
    """Int8-MXU BERT FFN over [..., H] (forward/encode path only).

    Same interface as :func:`fused_ffn`; weights are quantized per call in
    XLA (trivial next to the tile work). Falls back to the f32/bf16 XLA
    expression when shapes don't tile.
    """
    h = x.shape[-1]
    f = w1.shape[1]
    lead = x.shape[:-1]
    m = 1
    for dim in lead:
        m *= dim
    tile = min(tile_m, max(32, -(-m // 32) * 32))  # int8 sublane tile is 32
    if h % 128 or f % 128 or m % tile:
        return ffn_reference(x, w1, b1, w2, b2)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    x2d = x.reshape(m, h)
    interpret = _interp()
    y = pl.pallas_call(
        _ffn_int8_kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * h * f,
            bytes_accessed=2 * m * h * 2 + 2 * h * f,
            transcendentals=m * f),
        interpret=interpret,
    )(x2d, w1q, s1, b1.reshape(1, -1), w2q, s2, b2.reshape(1, -1))
    return y.reshape(*lead, h)


def _dense_int8_kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
    xq, xs = _quant_rows(x_ref[...])                  # [TM, I] i8, [TM, 1]
    acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * s_ref[...] + b_ref[...].astype(
        jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def int8_dense(x: jax.Array, w: jax.Array, b: jax.Array, *,
               tile_m: int = 512) -> jax.Array:
    """Int8-MXU dense ``x @ w + b`` over [..., I] (forward/encode only).

    The attention-projection analog of :func:`int8_ffn` (per-token
    activation + per-output-channel weight symmetric quant, int8 MXU
    matmul, f32 dequant + bias). Used by ``BertConfig.proj_impl="int8"``
    for the q/k/v/output projections on the encode path; ``round()`` has
    zero gradient, so never for training. Falls back to the bf16 XLA
    expression when shapes don't tile.
    """
    i = x.shape[-1]
    o = w.shape[1]
    lead = x.shape[:-1]
    m = 1
    for dim in lead:
        m *= dim
    tile = min(tile_m, max(32, -(-m // 32) * 32))  # int8 sublane tile is 32
    if i % 128 or o % 128 or m % tile:
        dt = x.dtype
        y = jnp.dot(x, w.astype(dt), preferred_element_type=jnp.float32)
        return y.astype(dt) + b.astype(dt)
    wq, s = quantize_weight(w)
    interpret = _interp()
    y = pl.pallas_call(
        _dense_int8_kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, i), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((i, o), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, o), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, o), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * i * o,
            bytes_accessed=m * i * 2 + i * o + m * o * 2,
            transcendentals=0),
        interpret=interpret,
    )(x.reshape(m, i), wq, s, b.reshape(1, -1))
    return y.reshape(*lead, o)


# --- custom-VJP (train) variant ---------------------------------------------
#
# Round-3 measured the fwd-only fused kernel NEUTRAL under grad (618-625 ms
# vs 603 XLA at batch 512): ``_fused_bwd`` falls back to ``jax.vjp`` of the
# XLA expression, which re-runs BOTH forward GEMMs before the four backward
# GEMMs (residuals are only the inputs), so the fwd kernel's HBM saving is
# repaid with interest in the bwd. This variant closes candidate (c)
# (ROADMAP "next-round" 6c): the forward kernel additionally writes the ONE
# residual the backward needs — h, the bf16 pre-activation (lossless: the
# reference expression computes it in bf16 before the f32 GELU) — and the
# backward runs as two Pallas kernels that never materialize dg = dY@W2^T
# in HBM and recompute gelu(h)/gelu'(h) on the VPU from h:
#
#   dx kernel  (grid m x f, f inner):  dg_j = dY @ W2_j^T
#                                      dh_j = dg_j * gelu'(h_j)
#                                      dx  += dh_j @ W1_j^T   (f32 scratch)
#                                      dh_j -> HBM (the dW kernel's input)
#   dW kernel  (grid f x m, m inner):  dW1_j += x^T dh_j
#                                      dW2_j += gelu(h_j)^T dY
#                                      db1_j += sum dh_j     (accumulated
#                                      directly in the f32 output block,
#                                      which stays VMEM-resident while the
#                                      m index varies)
#
# db2 = sum(dY) stays in XLA. All GEMMs tile the F dim in FB-wide blocks so
# every kernel fits VMEM with headroom (weights are the only near-MB blocks).
#
# Why ONE residual matters: custom-call outputs are opaque to XLA's
# rematerializer. A first cut saved (g, gelu') — two [M, F] bf16 tensors
# per layer — and a batch-512 BERT-base no-remat step OOMed HBM by 10.3 GB
# (26.05G used of 15.75G, exactly the 24 x 402 MB of residuals XLA could
# not remat away). Saving h alone is the memory shape XLA's own schedule
# has, at the price of two VPU gelu recomputes that overlap the MXU work.

_TILE_TRAIN_M = 256
_F_BLOCK = 768


def _gelu_and_deriv(h):
    """f32 (gelu(h), gelu'(h)) with the same in-kernel erf as the fwd.

    gelu'(h) = Phi(h) + h * phi(h), Phi the normal CDF, phi its density.
    """
    cdf = 0.5 * (1.0 + _erf(h * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * h * h)
    return h * cdf, cdf + h * pdf


def _ffn_train_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          o_ref, h_ref, acc):
    j = pl.program_id(1)
    dt = o_ref.dtype
    h = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32)
    hb = h.astype(dt) + b1_ref[0].astype(dt)          # bf16: the residual
    h_ref[...] = hb
    g = _gelu_exact(hb.astype(jnp.float32)).astype(dt)
    part = jnp.dot(g, w2_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc[...] = part

    @pl.when(j > 0)
    def _():
        acc[...] += part

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(dt) + b2_ref[0].astype(dt)


def _ffn_bwd_dx_kernel(dy_ref, w1_ref, w2_ref, h_ref, dx_ref, dh_ref, acc):
    j = pl.program_id(1)
    dt = dh_ref.dtype
    dg = jax.lax.dot_general(
        dy_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TM, FB]
    _, dgelu = _gelu_and_deriv(h_ref[...].astype(jnp.float32))
    dh = (dg * dgelu).astype(dt)
    dh_ref[...] = dh
    part = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TM, H]

    @pl.when(j == 0)
    def _():
        acc[...] = part

    @pl.when(j > 0)
    def _():
        acc[...] += part

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dx_ref[...] = acc[...].astype(dx_ref.dtype)


def _ffn_bwd_dw_kernel(x_ref, dy_ref, h_ref, dh_ref,
                       dw1_ref, db1_ref, dw2_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
        db1_ref[...] = jnp.zeros(db1_ref.shape, db1_ref.dtype)
        dw2_ref[...] = jnp.zeros(dw2_ref.shape, dw2_ref.dtype)

    dh = dh_ref[...]                                   # [TM, FB] bf16
    g = _gelu_exact(h_ref[...].astype(jnp.float32)).astype(dh.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        x_ref[...], dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [H, FB]
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        g, dy_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [FB, H]


def _train_tiles(m: int, h: int, f: int):
    """(tile_m, f_block) for the train kernels, or None -> XLA fallback.

    The f-block must DIVIDE F (the grid is dense): pick the largest
    lane-aligned divisor <= _F_BLOCK, so e.g. F=3072 -> 768 and the
    CE-large F=4096 -> 512.
    """
    tile = min(_TILE_TRAIN_M, max(16, -(-m // 16) * 16))
    if h % 128 or f % 128 or m % tile:
        return None
    fb = next((c for c in range(min(_F_BLOCK, f), 127, -128)
               if c % 128 == 0 and f % c == 0), None)
    if fb is None:
        return None
    return tile, fb



@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_train(tile_m, fb, x2d, w1, b1, w2, b2):
    y, _ = _fused_train_call(tile_m, fb, x2d, w1, b1, w2, b2)
    return y


def _fused_train_call(tile_m, fb, x2d, w1, b1, w2, b2):
    m, h = x2d.shape
    f = w1.shape[1]
    dt = x2d.dtype
    flops = 2 * m * h * f * 2
    return pl.pallas_call(
        _ffn_train_fwd_kernel,
        grid=(m // tile_m, f // fb),
        in_specs=[
            pl.BlockSpec((tile_m, h), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, fb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, h), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, fb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, h), dt),
            jax.ShapeDtypeStruct((m, f), dt),
        ],
        scratch_shapes=[pltpu.VMEM((tile_m, h), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m * h * 4 + m * f * 2 + (2 * h * f) * 2,
            transcendentals=m * f),
        interpret=_interp(),
    )(x2d, w1.astype(dt), b1.reshape(1, -1), w2.astype(dt),
      b2.reshape(1, -1))


def _fused_train_fwd(tile_m, fb, x2d, w1, b1, w2, b2):
    y, hres = _fused_train_call(tile_m, fb, x2d, w1, b1, w2, b2)
    return y, (x2d, w1, w2, hres)


def _fused_train_bwd(tile_m, fb, res, dy):
    x2d, w1, w2, hres = res
    m, h = x2d.shape
    f = w1.shape[1]
    dt = x2d.dtype
    dy = dy.astype(dt)
    interpret = _interp()
    dx, dh = pl.pallas_call(
        _ffn_bwd_dx_kernel,
        grid=(m // tile_m, f // fb),
        in_specs=[
            pl.BlockSpec((tile_m, h), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, fb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, fb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, h), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, fb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, h), dt),
            jax.ShapeDtypeStruct((m, f), dt),
        ],
        scratch_shapes=[pltpu.VMEM((tile_m, h), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * h * f * 2,
            bytes_accessed=m * h * 4 + 2 * m * f * 2 + (2 * h * f) * 2,
            transcendentals=m * f),
        interpret=interpret,
    )(dy, w1.astype(dt), w2.astype(dt), hres)
    dw1, db1, dw2 = pl.pallas_call(
        _ffn_bwd_dw_kernel,
        grid=(f // fb, m // tile_m),
        in_specs=[
            pl.BlockSpec((tile_m, h), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, fb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, fb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h, fb), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, h), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * h * f * 2,
            bytes_accessed=2 * m * h * 2 + 2 * m * f * 2
            + (2 * h * f) * 4,
            transcendentals=m * f),
        interpret=interpret,
    )(x2d, dy, hres, dh)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0)
    return (dx, dw1.astype(w1.dtype), db1.reshape(-1).astype(w1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype))


_fused_train.defvjp(_fused_train_fwd, _fused_train_bwd)


def fused_ffn_vjp(x: jax.Array, w1: jax.Array, b1: jax.Array,
                  w2: jax.Array, b2: jax.Array) -> jax.Array:
    """Fused BERT FFN with a full-Pallas custom VJP (the TRAIN path).

    Forward emits the one residual the backward needs (h, bf16); backward
    is the two kernels described above, recomputing gelu/gelu' from h on
    the VPU. Falls back to the XLA expression when shapes don't tile.
    Numerics match :func:`ffn_reference`'s ``jax.vjp`` to bf16 tolerance
    (tests/test_fused_ffn.py).
    """
    h = x.shape[-1]
    f = w1.shape[1]
    lead = x.shape[:-1]
    m = 1
    for dim in lead:
        m *= dim
    tiles = _train_tiles(m, h, f)
    if tiles is None:
        return ffn_reference(x, w1, b1, w2, b2)
    y = _fused_train(tiles[0], tiles[1], x.reshape(m, h), w1, b1, w2, b2)
    return y.reshape(*lead, h)


def fused_ffn(x: jax.Array, w1: jax.Array, b1: jax.Array,
              w2: jax.Array, b2: jax.Array) -> jax.Array:
    """Fused BERT FFN over [..., H] activations.

    Falls back to the identical XLA expression when shapes don't satisfy the
    kernel's lane constraints (H, F multiples of 128) or the leading dims
    are too small to tile.
    """
    h = x.shape[-1]
    f = w1.shape[1]
    lead = x.shape[:-1]
    m = 1
    for dim in lead:
        m *= dim
    tile = min(_TILE_M, max(16, -(-m // 16) * 16))
    if h % 128 or f % 128 or m % tile:
        return ffn_reference(x, w1, b1, w2, b2)
    y = _fused(tile, x.reshape(m, h), w1, b1, w2, b2)
    return y.reshape(*lead, h)
