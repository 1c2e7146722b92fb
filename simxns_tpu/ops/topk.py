"""Exact maximum-inner-product top-k (the FAISS ``IndexFlatIP`` replacement).

The reference shards a flat fp16 FAISS index across 8 GPUs and calls
``index.search(q, 100)`` (``SimANS/wiki/co_training_generate_new_train_wiki.py:
307-332,369-371``; ``PROD/ProD_base/inference_DE_marco.py:340-392``). On TPU the
corpus embedding matrix lives HBM-resident (sharded over the mesh's ``data``
axis by :mod:`simxns_tpu.index`), and search is a blocked matmul with streaming
k-selection:

- ``exact_topk``        — one-shot matmul + ``lax.top_k``; fine for small N.
- ``blocked_mips_topk`` — ``lax.scan`` over corpus blocks keeping a running
  top-k (merge-and-reselect). Bounds the score-matrix memory to
  ``Q x block_size`` so 21M-passage corpora never materialize ``Q x N``.

Both return global corpus ids, so the distributed engine can merge per-shard
results with one ``all_gather`` + final ``top_k`` (SURVEY.md §5.8).
``lax.top_k`` lowers to an efficient XLA sort-based selection on TPU;
``mode='fused'`` dispatches to the Pallas fused score+select kernel
(:mod:`simxns_tpu.ops.mips_kernel`), which overlaps the k-selection with the
MXU matmul instead of running it after.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30          # python float: a module-level jnp scalar would
                         # initialize the backend AT IMPORT, breaking the
                         # launcher's force-CPU path (_setup_platform)


def exact_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    id_offset: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k inner products of ``queries [Q,H]`` against ``corpus [N,H]``.

    Returns ``(scores [Q,k] f32, ids [Q,k] i32)``; ids are offset by
    ``id_offset`` (shard-local -> global id translation).
    """
    scores = jnp.einsum(
        "qh,nh->qn", queries, corpus, preferred_element_type=jnp.float32
    )
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_scores, (top_ids + id_offset).astype(jnp.int32)


def blocked_mips_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    block_size: int = 8192,
    id_offset: jax.Array | int = 0,
    valid_n: jax.Array | int | None = None,
    axis_name: str | None = None,
    mode: str = "exact",
    recall_target: float = 0.95,
    row_scales: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming top-k over corpus blocks; O(Q*(k+block)) live memory.

    ``valid_n`` masks out padding rows at the tail of ``corpus`` (the corpus is
    padded to a block multiple so shapes stay static). ``id_offset`` and
    ``valid_n`` may be traced values (shard rank offsets under ``shard_map``);
    only ``k`` and ``block_size`` must be static. Callers jit.

    ``mode='exact'`` keeps a running top-k (merge-and-reselect per block —
    the FAISS-exact semantics). ``mode='approx'`` selects per block with
    ``lax.approx_max_k`` (TPU PartialReduce) at ``recall_target`` and merges
    once at the end — much cheaper selection at near-perfect recall, the
    right trade for negative mining where FAISS-fp16 itself isn't exact.

    ``mode='fused'`` dispatches to the Pallas kernel in
    :mod:`simxns_tpu.ops.mips_kernel` (matmul + in-VMEM bucket selection in
    one program; ``block_size`` maps to its corpus block).

    Under ``shard_map`` pass ``axis_name`` so the scan carry is marked
    device-varying (JAX's vma check rejects a replicated carry fed by
    varying block scores).

    ``row_scales`` marks the corpus as int8-quantized (per-row symmetric,
    the FAISS-SQ8 analog; see ``ops.mips_kernel.quantize_rows``): scores
    are computed on the dequantized values — the scale is applied to the
    score matrix, which is cheaper than scaling the block and
    mathematically identical.
    """
    if mode == "fused" and corpus.shape[0] < 64 * k:
        # The fused kernel's bucket reduction keeps ~N/bucket candidates;
        # on a tiny shard that is too lossy for a top-k list (observed:
        # mining a 2048-row shard at k=100 through 128 candidates poisons
        # AR2 training data). Exact streaming is cheap at this size.
        mode = "exact"
    if mode == "fused":
        if row_scales is not None:
            from simxns_tpu.ops.mips_kernel import fused_mips_topk_int8

            return fused_mips_topk_int8(
                queries, corpus, row_scales, k,
                block_n=min(block_size, 2048),
                id_offset=id_offset, valid_n=valid_n)
        from simxns_tpu.ops.mips_kernel import fused_mips_topk

        return fused_mips_topk(
            queries, corpus, k,
            block_n=min(block_size, 2048),
            id_offset=id_offset, valid_n=valid_n)
    n, h = corpus.shape
    q = queries.shape[0]
    if n % block_size != 0:
        pad = block_size - n % block_size
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
        if row_scales is not None:
            row_scales = jnp.pad(row_scales, (0, pad))
        if valid_n is None:
            valid_n = n
        n = corpus.shape[0]
    if valid_n is None:
        valid_n = n
    num_blocks = n // block_size
    blocks = corpus.reshape(num_blocks, block_size, h)
    # uniform scan xs: a [num_blocks, 1] ones vector when unquantized (the
    # broadcast multiply is free next to the matmul)
    sblocks = (jnp.ones((num_blocks, 1), jnp.float32) if row_scales is None
               else row_scales.reshape(num_blocks, block_size).astype(
                   jnp.float32))

    def block_scores(block, sblock):
        s = jnp.einsum("qh,nh->qn", queries, block.astype(queries.dtype),
                       preferred_element_type=jnp.float32)
        return s * sblock[None, :]

    if mode == "approx":
        # Per-block hardware-friendly selection (XLA PartialReduce via
        # lax.approx_max_k — the TPU-native ANN primitive), then one exact
        # top-k over the num_blocks*k survivors. Avoids the expensive
        # per-step sort over (k + block_size) columns of the exact path;
        # whole-corpus recall@k >= recall_target per block by construction.
        def step(_, inp):
            block, sblock, b_idx = inp
            s = block_scores(block, sblock)
            col = jax.lax.broadcasted_iota(jnp.int32, (q, block_size), 1)
            s = jnp.where(b_idx * block_size + col < valid_n, s, NEG_INF)
            bs, bi = jax.lax.approx_max_k(s, k, recall_target=recall_target)
            return None, (bs, (bi + b_idx * block_size).astype(jnp.int32))

        _, (all_s, all_i) = jax.lax.scan(
            step, None,
            (blocks, sblocks, jnp.arange(num_blocks, dtype=jnp.int32)))
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(q, -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(q, -1)
        scores, sel = jax.lax.top_k(all_s, k)
        ids = jnp.take_along_axis(all_i, sel, axis=1)
        return scores, jnp.where(scores > NEG_INF / 2, ids + id_offset, -1)

    init_scores = jnp.full((q, k), NEG_INF, dtype=jnp.float32)
    init_ids = jnp.full((q, k), -1, dtype=jnp.int32)
    if axis_name is not None:
        init_scores = jax.lax.pcast(init_scores, (axis_name,), to="varying")
        init_ids = jax.lax.pcast(init_ids, (axis_name,), to="varying")

    def step(carry, inp):
        best_s, best_i = carry
        block, sblock, b_idx = inp
        s = block_scores(block, sblock)
        local_ids = b_idx * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (q, block_size), 1
        )
        s = jnp.where(local_ids < valid_n, s, NEG_INF)
        cand_s = jnp.concatenate([best_s, s], axis=1)
        cand_i = jnp.concatenate([best_i, local_ids], axis=1)
        new_s, sel = jax.lax.top_k(cand_s, k)
        new_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (new_s, new_i), None

    (scores, ids), _ = jax.lax.scan(
        step,
        (init_scores, init_ids),
        (blocks, sblocks, jnp.arange(num_blocks, dtype=jnp.int32)),
    )
    return scores, jnp.where(ids >= 0, ids + id_offset, ids)


def merge_topk(
    scores: jax.Array, ids: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k lists: [S, Q, k'] -> global [Q, k].

    Used after ``all_gather`` of shard-local results (the TPU analog of
    FAISS's cross-GPU result merge).
    """
    s = jnp.moveaxis(scores, 0, 1).reshape(scores.shape[1], -1)
    i = jnp.moveaxis(ids, 0, 1).reshape(ids.shape[1], -1)
    top_s, sel = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(i, sel, axis=1)
