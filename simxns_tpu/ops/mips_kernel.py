"""Pallas fused MIPS top-k kernel (the FAISS GPU brute-force scan, TPU-native).

The reference shards a flat fp16 FAISS index over 8 GPUs and brute-force
scans it (``SimANS/wiki/co_training_generate_new_train_wiki.py:307-332``).
SURVEY.md §2.1/§7.1 calls the TPU replacement — a blocked q·Cᵀ matmul with
on-device k-selection — the single biggest new native component. The XLA
composition (``ops.topk.blocked_mips_topk``) is exact but selection-bound:
``lax.approx_max_k`` per block measured only ~14% MXU on v5e because the
PartialReduce runs *after* each einsum instead of overlapping it.

This kernel fuses selection INTO the matmul program so the VPU reduction
hides under the MXU. Measured (v5e-1, bf16, k=100, 256-query batches,
bench_r2_results.jsonl): at 8.8M x 768 the kernel runs 6.9k qps vs approx's
7.7k — BOTH at ~50% of peak FLOP/s, which is this chip's effective matmul
ceiling (pure GEMM chains measure 58%), i.e. brute-force search is compute-
roofline-bound at mining scale and XLA's approx_max_k is already within 10%
of attainable; the engine default therefore stays ``mode='approx'``, with
this kernel as the fused alternative. A corpus-transposed ([H, N]) variant
was tried and REJECTED: column-block DMA strides thrash HBM (2.0k qps at
8.8M — 3.4x worse; see ROADMAP).

- grid ``(num_corpus_blocks, num_query_tiles)`` — corpus blocks on the
  OUTER axis, so each ``[block_n, H]`` corpus tile is DMA'd into VMEM once
  per full pass regardless of the query count (the corpus is read from HBM
  exactly once; queries, which are tiny, are re-streamed per block).
- each program computes ``scores = q_tile @ blockᵀ`` on the MXU
  (``[block_q, H] x [H, block_n]``, bf16 in / f32 accumulate) and
  immediately reduces every aligned group of ``bucket`` (=128) columns to
  its (max, argmax) on the VPU — a 128x candidate reduction fused in VMEM,
  so the ``[Q, N]`` score matrix never exists anywhere.
- the surviving ``[Q, N/bucket]`` candidates get ONE exact ``lax.top_k``
  outside the kernel.

Semantics: identical to FAISS-style exact search except that two true
top-k hits landing in the same 128-column bucket return only the better
one. For k=100 on an 8.8M corpus the expected loss is ~100·99/2 / (N/128)
≈ 0.07 of 100 hits (recall@100 ≈ 0.9993) — tighter than the bf16-storage
noise floor both this engine and FAISS-fp16 already sit on.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30  # plain float: jnp scalars would be captured consts in-kernel
NEG_INF = _NEG           # python float (module-level jnp scalars init the
                         # backend at import -- see ops/topk.py)

# Flip in tests to run under the Pallas interpreter (CPU, exact semantics).
INTERPRET = False


def _use_interpret() -> bool:
    return INTERPRET or jax.devices()[0].platform != "tpu"


def _fit_bucket(bucket: int, block_n: int, total_n: int, k: int) -> int:
    """Shrink the candidate bucket for small corpora/blocks.

    At scale the defaults hold (128-wide buckets); on smaller corpora the
    reduction must leave a comfortable candidate margin over ``k`` (4x —
    a bare >=k list keeps mostly bucket maxima and loses most of the true
    top-k) and divide ``block_n``.
    """
    bucket = min(bucket, block_n)
    while block_n % bucket:
        bucket //= 2
    while (bucket > 8 and total_n // bucket < 4 * k
           and block_n % (bucket // 2) == 0):
        bucket //= 2
    return max(bucket, 1)


def _pad_candidates(flat_s: jax.Array, flat_i: jax.Array, k: int):
    """Guarantee >= k candidate columns (pad scores with -inf, ids -> -1)."""
    if flat_s.shape[1] < k:
        pad = k - flat_s.shape[1]
        flat_s = jnp.pad(flat_s, ((0, 0), (0, pad)), constant_values=_NEG)
        flat_i = jnp.pad(flat_i, ((0, 0), (0, pad)))
    return flat_s, flat_i


def _bucket_reduce(scores, valid_n, n_idx, s_out_ref, i_out_ref, *,
                   block_n: int, block_q: int, bucket: int):
    """Shared kernel epilogue: mask rows past ``valid_n``, reduce each
    ``bucket``-wide lane group to (max score, first-argmax global id), and
    write the program's ``(1, block_q, nb)`` output tile. Used by BOTH the
    bf16 and int8 kernels so the (>=max -> min index) tie-break and the
    _NEG masking can never diverge between the two engines."""
    nb = block_n // bucket
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_n), 1)
    valid = n_idx * block_n + col < valid_n
    scores = jnp.where(valid, scores, jnp.float32(_NEG))

    s3 = scores.reshape(block_q, nb, bucket)
    best = jnp.max(s3, axis=-1)                       # [block_q, nb]
    # argmax-in-bucket via the (==max -> min index) trick; ties -> first.
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_q, nb, bucket), 2)
    in_bucket = jnp.min(
        jnp.where(s3 >= best[..., None], lane, bucket), axis=-1)
    bucket_base = jax.lax.broadcasted_iota(jnp.int32, (block_q, nb), 1)
    ids = n_idx * block_n + bucket_base * bucket + in_bucket

    s_out_ref[0] = best
    i_out_ref[0] = ids


def _mips_kernel(valid_n_ref, q_ref, c_ref, s_out_ref, i_out_ref, *,
                 block_n: int, block_q: int, bucket: int):
    """One (corpus-block, query-tile) program: matmul + fused bucket-argmax.

    Outputs are laid out ``[num_blocks, Q, block_n/bucket]`` so each program
    writes a full-minor-dim ``(1, block_q, nb)`` tile (lane dim == array
    minor dim, which Mosaic accepts for nb < 128).
    """
    n_idx = pl.program_id(0)
    q = q_ref[...]                                    # [block_q, H] bf16
    c = c_ref[...]                                    # [block_n, H] bf16
    scores = jax.lax.dot_general(
        q, c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [block_q, block_n]
    _bucket_reduce(scores, valid_n_ref[0], n_idx, s_out_ref, i_out_ref,
                   block_n=block_n, block_q=block_q, bucket=bucket)


try:  # import at module scope so interpret mode works without TPU deps
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None


def _candidates(queries: jax.Array, corpus: jax.Array, valid_n,
                *, block_n: int, block_q: int, bucket: int,
                interpret: bool) -> Tuple[jax.Array, jax.Array]:
    """Run the fused kernel: -> (scores, ids) each [num_blocks, Qp, nb]."""
    n, h = corpus.shape
    qp = queries.shape[0]
    num_n = n // block_n
    num_q = qp // block_q
    nb = block_n // bucket

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_n, num_q),
        in_specs=[
            pl.BlockSpec((block_q, h), lambda ni, qi, s: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, h), lambda ni, qi, s: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, nb), lambda ni, qi, s: (ni, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, nb), lambda ni, qi, s: (ni, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(
        _mips_kernel, block_n=block_n, block_q=block_q, bucket=bucket)
    flops = 2 * qp * n * h
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_n, qp, nb), jnp.float32),
            jax.ShapeDtypeStruct((num_n, qp, nb), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n * h * 2 + qp * h * 2 * num_n,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(valid_n, jnp.int32).reshape(1), queries, corpus)


def _mips_kernel_int8(valid_n_ref, q_ref, qs_ref, c_ref, cs_ref,
                      s_out_ref, i_out_ref, *,
                      block_n: int, block_q: int, bucket: int):
    """Int8 variant: codes x codes on the MXU at 2x the bf16 rate.

    ``q_ref`` [block_q, H] int8 with per-query scales ``qs_ref``
    [block_q, 1]; ``c_ref`` [block_n, H] int8 with per-row scales
    ``cs_ref`` [1, block_n]. The FAISS-SQ8 analog: scores =
    (q8 @ c8^T) * qs * cs, then the same fused bucket-argmax reduction.
    """
    n_idx = pl.program_id(0)
    acc = jax.lax.dot_general(
        q_ref[...], c_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)             # [block_q, block_n]
    scores = acc.astype(jnp.float32) * qs_ref[...] * cs_ref[...]
    _bucket_reduce(scores, valid_n_ref[0], n_idx, s_out_ref, i_out_ref,
                   block_n=block_n, block_q=block_q, bucket=bucket)


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 (FAISS SQ8 analog): [N,H] -> (codes, scales).

    ``scales`` is [N] f32; ``x ~ codes * scales[:, None]``.
    """
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1) / 127.0
    s = jnp.maximum(s, 1e-12)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                     -127, 127).astype(jnp.int8)
    return codes, s


def _finalize(cand_s, cand_i, k, id_offset, qp, nq):
    """Shared host-side epilogue (bf16 + int8 paths): flatten the per-block
    candidate tiles, exact top-k over survivors, apply the shard id offset,
    and mark sub-NEG_INF rows with -1 ids."""
    flat_s = jnp.moveaxis(cand_s, 0, 1).reshape(qp, -1)
    flat_i = jnp.moveaxis(cand_i, 0, 1).reshape(qp, -1)
    flat_s, flat_i = _pad_candidates(flat_s, flat_i, k)
    top_s, sel = jax.lax.top_k(flat_s, k)
    top_i = jnp.take_along_axis(flat_i, sel, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i + id_offset, -1)
    return top_s[:nq], top_i[:nq].astype(jnp.int32)


def fused_mips_topk_int8(
    queries: jax.Array,
    codes: jax.Array,
    row_scales: jax.Array,
    k: int,
    *,
    block_n: int = 2048,
    block_q: int = 256,
    bucket: int = 128,
    id_offset: jax.Array | int = 0,
    valid_n: jax.Array | int | None = None,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused top-k over an int8-quantized corpus: [Q,H] x int8 [N,H].

    ``codes``/``row_scales`` come from :func:`quantize_rows` (build-time);
    queries are float and are per-row-quantized here. Same contract as
    :func:`fused_mips_topk` otherwise. Halves index HBM vs bf16 and runs
    the score matmul at the int8 MXU rate (2x bf16 peak).
    """
    if interpret is None:
        interpret = _use_interpret()
    n, h = codes.shape
    if h % 128 != 0:
        # zero columns change neither the int8 dots nor per-row maxima
        hp = 128 - h % 128
        codes = jnp.pad(codes, ((0, 0), (0, hp)))
        queries = jnp.pad(queries, ((0, 0), (0, hp)))
        h += hp
    nq = queries.shape[0]
    if valid_n is None:
        valid_n = n
    if n % block_n != 0:
        pad = block_n - n % block_n
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        row_scales = jnp.pad(row_scales, (0, pad))
    block_q = min(block_q, max(32, -(-nq // 32) * 32))  # int8 sublane = 32
    if nq % block_q != 0:
        queries = jnp.pad(queries, ((0, block_q - nq % block_q), (0, 0)))

    q8, qs = quantize_rows(queries)
    qp = q8.shape[0]
    num_n = codes.shape[0] // block_n
    num_q = qp // block_q
    bucket = _fit_bucket(bucket, block_n, codes.shape[0], k)
    nb = block_n // bucket

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_n, num_q),
        in_specs=[
            pl.BlockSpec((block_q, h), lambda ni, qi, s: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda ni, qi, s: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, h), lambda ni, qi, s: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda ni, qi, s: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, nb), lambda ni, qi, s: (ni, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, nb), lambda ni, qi, s: (ni, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(
        _mips_kernel_int8, block_n=block_n, block_q=block_q, bucket=bucket)
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_n, qp, nb), jnp.float32),
            jax.ShapeDtypeStruct((num_n, qp, nb), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * codes.shape[0] * h,
            bytes_accessed=codes.shape[0] * h + qp * h * num_n,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(valid_n, jnp.int32).reshape(1), q8,
      qs.reshape(-1, 1), codes, row_scales.reshape(1, -1))

    return _finalize(cand_s, cand_i, k, id_offset, qp, nq)


def fused_mips_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    block_n: int = 2048,
    block_q: int = 256,
    bucket: int = 128,
    id_offset: jax.Array | int = 0,
    valid_n: jax.Array | int | None = None,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel top-k inner products: [Q,H]x[N,H] -> ([Q,k], [Q,k]).

    Drop-in for ``ops.topk.blocked_mips_topk`` (same contract: f32 scores,
    global int32 ids offset by ``id_offset``, -1 ids on sub-``NEG_INF``
    rows). ``valid_n`` and ``id_offset`` may be traced (shard_map rank
    values); ``k``/``block_n``/``block_q``/``bucket`` must be static.

    Corpus/queries are padded here to block multiples (mask rows via
    ``valid_n``); H is zero-padded to a lane multiple (zero columns leave
    inner products unchanged). ``bucket`` is the candidate reduction
    ratio; recall@k ≈ 1 - k(k-1)/2 / (N/bucket).
    """
    if interpret is None:
        interpret = _use_interpret()
    n, h = corpus.shape
    if h % 128 != 0:
        hp = 128 - h % 128
        corpus = jnp.pad(corpus, ((0, 0), (0, hp)))
        queries = jnp.pad(queries, ((0, 0), (0, hp)))
        h += hp
    nq = queries.shape[0]
    if valid_n is None:
        valid_n = n
    if n % block_n != 0:
        corpus = jnp.pad(corpus, ((0, block_n - n % block_n), (0, 0)))
    # Shrink the query tile for small batches (min 16 sublanes covers bf16).
    block_q = min(block_q, max(16, -(-nq // 16) * 16))
    if nq % block_q != 0:
        queries = jnp.pad(queries, ((0, block_q - nq % block_q), (0, 0)))

    bucket = _fit_bucket(bucket, block_n, corpus.shape[0], k)
    cand_s, cand_i = _candidates(
        queries, corpus, valid_n,
        block_n=block_n, block_q=block_q, bucket=bucket, interpret=interpret)

    # [num_n, Qp, nb] -> [Qp, num_n*nb]; one exact top-k over survivors.
    qp = queries.shape[0]
    return _finalize(cand_s, cand_i, k, id_offset, qp, nq)
