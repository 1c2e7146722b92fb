"""Encode -> index -> search engine (the FAISS + pickle/disk dance, replaced).

Reference pipeline (SURVEY.md §3.2): each rank encodes a corpus shard,
pickles it to disk, barriers, rank 0 concatenates, reorders by id, builds a
FAISS flat-IP index sharded over 8 GPUs, searches top-100, labels hits by
answer string match, and rewrites the train JSON
(``SimANS/wiki/co_training_generate_new_train_wiki.py:226-465``).

TPU-native version: the corpus embedding matrix is a single jax array
sharded row-wise over the mesh ``data`` axis and *stays in HBM* between
phases — encode, index build, and search are all device ops; only hit
labeling (answer string match) and train-file regeneration touch the host.

- :class:`CorpusEncoder` — chunked corpus encode under jit, batch dim sharded.
- :class:`MIPSIndex`    — HBM-resident sharded matrix + top-k search
  (per-shard blocked scan + cross-shard merge via one ``all_gather``).
- :class:`RetrievalEngine` — mine/eval driver: search, label hits,
  Eval_Tool metrics, and ``reform_out`` train-file regeneration.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simxns_tpu.evals.metrics import get_metrics, top_k_hits_accuracy
from simxns_tpu.evals.qa_match import has_answer
from simxns_tpu.ops.topk import blocked_mips_topk, merge_topk
from simxns_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple
from simxns_tpu.parallel.sync import force_sync
from simxns_tpu.parallel.watchdog import run_with_deadline


class CorpusEncoder:
    """Encode a tokenized corpus into embeddings with a jitted encode fn.

    ``encode_fn(params, ids, mask) -> [B, H]`` is typically
    ``BiEncoder.apply(..., method='encode_passage')``. The corpus is consumed
    in fixed-size chunks (one compilation); the tail chunk is padded.
    Replaces the reference's per-rank encode + disk merge
    (``co_training_generate_new_train_wiki.py:239-280``).
    """

    def __init__(self, encode_fn: Callable, mesh: Mesh, chunk_size: int = 4096,
                 inflight: int = 4, stall_timeout_s: Optional[float] = None,
                 stall_retries: int = 2):
        self.mesh = mesh
        self.chunk_size = chunk_size
        self.inflight = inflight
        # stall watchdog (parallel/watchdog.py): round 5's iter_r5d run
        # wedged in the QUERY encode — the one mine sub-phase whose result
        # pulls were unbounded (index build/search were already covered).
        # Bound them the same way.
        self.stall_timeout_s = stall_timeout_s
        self.stall_retries = stall_retries
        if mesh.size > 1:
            in_shard = NamedSharding(mesh, P(DATA_AXIS, None))
            self._encode = jax.jit(
                encode_fn,
                in_shardings=(None, in_shard, in_shard),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS, None)),
            )
        else:
            # explicit shardings on a 1-device mesh are semantic no-ops but
            # NOT free on every runtime (train/steps.py sharding_kwargs:
            # measured 64x on one relay backend) — omit them
            self._encode = jax.jit(encode_fn)

    def __call__(self, params, token_ids: np.ndarray, attention_mask: np.ndarray,
                 out_dtype=np.float32) -> np.ndarray:
        n = token_ids.shape[0]
        # Keep a bounded window of chunks in flight: jax execution is async,
        # so transfers and encodes of successive chunks pipeline instead of
        # a host sync per chunk serializing them — but draining as we go
        # keeps device-resident encode outputs at O(inflight), not
        # O(corpus) (a 21M x 768 corpus of f32 chunk outputs would OOM the
        # 16G chip before the index even builds).
        pending = []
        done = []

        def drain_one():
            emb, valid = pending.pop(0)
            done.append(run_with_deadline(
                lambda: np.asarray(emb, dtype=out_dtype)[:valid],
                self.stall_timeout_s,
                desc=f"corpus encode pull ({n} rows)",
                retries=self.stall_retries))

        for s in range(0, n, self.chunk_size):
            ids = token_ids[s: s + self.chunk_size]
            mask = attention_mask[s: s + self.chunk_size]
            valid = ids.shape[0]
            if valid < self.chunk_size:
                pad = self.chunk_size - valid
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = self._encode(params, jnp.asarray(ids), jnp.asarray(mask))
            pending.append((emb, valid))
            if len(pending) > self.inflight:
                drain_one()
        while pending:
            drain_one()
        return np.concatenate(done, axis=0)


class MIPSIndex:
    """HBM-resident, row-sharded exact MIPS index.

    The FAISS ``IndexFlatIP`` + ``GpuMultipleClonerOptions(shard=True)``
    equivalent: embeddings sharded over the ``data`` axis, searched with a
    per-shard streaming top-k and a cross-shard merge. fp16 in FAISS
    (``useFloat16=True``) maps to bf16 storage (``store_dtype``);
    ``store_dtype=jnp.int8`` is the FAISS-SQ8 analog — per-row symmetric
    codes + f32 scales, halving index HBM (21M wiki rows fit two v5e chips
    instead of eight A100s) and running the score matmul at the int8 MXU
    rate under ``mode='fused'``.
    """

    def __init__(self, mesh: Mesh, block_size: int = 4096,
                 store_dtype=jnp.bfloat16, mode: str = "exact",
                 recall_target: float = 0.95,
                 stall_timeout_s: Optional[float] = None,
                 stall_retries: int = 2, sync_rows: int = 262144,
                 max_resident_rows: Optional[int] = None):
        self.mesh = mesh
        self.block_size = block_size
        self.store_dtype = store_dtype
        self.quantized = store_dtype == jnp.int8
        self.mode = mode                      # "exact" | "approx" | "fused"
        self.recall_target = recall_target
        # stall watchdog (parallel/watchdog.py): every sync/result-pull in
        # build_streaming and search is bounded by this deadline, re-issued
        # `stall_retries` times on a stall, then raises StallError instead
        # of wedging for hours (the round-4 failure mode). None = disabled
        # (tests / trusted local backends). `sync_rows` sets how many
        # dispatched rows each streaming-build sync covers — the deadline
        # must comfortably exceed that much encode work plus one compile.
        self.stall_timeout_s = stall_timeout_s
        self.stall_retries = stall_retries
        self.sync_rows = sync_rows
        # max_resident_rows: HBM capacity per pass. A streaming-built
        # corpus LARGER than this is searched in device-capacity passes
        # (build slice -> search -> free, top-k merged on host) instead of
        # ever being fully resident — the 21M-row wiki working point
        # (co_training_generate_new_train_wiki.py:307-348 shards it over
        # 8 GPUs) runs on ONE chip this way. Re-encoding each pass costs
        # one extra corpus encode per extra pass but NEVER round-trips
        # GB-scale codes over the wire (~6 min per 8 GB at the relay's
        # ~23 MB/s — measured round 4 to dominate any swap design).
        self.max_resident_rows = max_resident_rows
        self.embeddings: Optional[jax.Array] = None
        self.row_scales: Optional[jax.Array] = None
        self.num_rows = 0
        self._search_cache: Dict[Tuple, Callable] = {}
        self._pass_src: Optional[dict] = None

    @property
    def n_shards(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @staticmethod
    def _quantize(embeddings: np.ndarray):
        """Per-row symmetric int8 on the host: -> (codes i8, scales f32)."""
        x = embeddings.astype(np.float32, copy=False)
        s = np.maximum(np.abs(x).max(axis=1) / 127.0, 1e-12)
        codes = np.clip(np.rint(x / s[:, None]), -127, 127).astype(np.int8)
        return codes, s.astype(np.float32)

    def build(self, embeddings: np.ndarray) -> None:
        """Shard [N, H] embeddings row-wise over the mesh (pads to shards)."""
        n, h = embeddings.shape
        self.num_rows = n
        padded = pad_to_multiple(n, self.n_shards * self.block_size)
        if padded != n:
            embeddings = np.pad(embeddings, ((0, padded - n), (0, 0)))
        if self.quantized:
            codes, scales = self._quantize(embeddings)
            self.embeddings = jax.device_put(
                jnp.asarray(codes),
                NamedSharding(self.mesh, P(DATA_AXIS, None)))
            self.row_scales = jax.device_put(
                jnp.asarray(scales), NamedSharding(self.mesh, P(DATA_AXIS)))
        else:
            arr = jnp.asarray(embeddings, dtype=self.store_dtype)
            self.embeddings = jax.device_put(
                arr, NamedSharding(self.mesh, P(DATA_AXIS, None)))
        self._pass_src = None

    def build_streaming(self, encode_fn: Callable, params, token_ids: np.ndarray,
                        chunk_size: int = 1024, pad_id: int = 0,
                        wire_dtype=None) -> None:
        """Build the index without the embeddings ever visiting the host.

        :meth:`build` via :class:`CorpusEncoder` round-trips the full corpus
        over the wire three times — int32 token ids up, f32 embeddings down
        for host quantization, codes back up (~43 GB at the 8.8M x 768
        working point; measured to dominate the mine's encode phase on the
        relay-attached chip). This path fuses encode -> quantize -> scatter
        into ONE jitted program per chunk: only narrow token ids travel
        (uint16 when the vocab fits — BERT's 30522 does), the attention
        mask is derived on device (``ids != pad_id``, the exact
        ``_Corpus.corpus_mask`` contract), embeddings are quantized on
        device (same math as :meth:`update_rows`), and the donated index
        buffer is updated in place. Wire traffic drops ~10x.

        Replaces the reference's encode + pickle-to-disk + rank-0 FAISS
        ``index.add`` merge (``co_training_generate_new_train_wiki.py:
        239-280``) with a device-resident build.

        HBM note: the full index buffer is live DURING encode here (unlike
        :meth:`build`, which allocates it after). Callers must clear dead
        weight first — see ``parallel/offload.HostStash`` and the AR2
        runner's mine phase.

        When the corpus exceeds ``max_resident_rows``, nothing is built
        here: the token source is recorded and :meth:`search` runs the
        build->search->free loop per device-capacity pass (the single-chip
        21M-row path; see ``__init__``).
        """
        import math

        n, seq_len = token_ids.shape
        if (self.max_resident_rows is not None
                and n > self.max_resident_rows):
            self._pass_src = dict(
                encode_fn=encode_fn, params=params, token_ids=token_ids,
                chunk_size=chunk_size, pad_id=pad_id, wire_dtype=wire_dtype)
            self.num_rows = n
            self.embeddings = None
            self.row_scales = None
            return
        self._pass_src = None
        self.num_rows = n
        if wire_dtype is None:
            wire_dtype = token_ids.dtype
        # dynamic_update_slice CLAMPS out-of-range starts (silently
        # corrupting earlier rows), so the buffer must hold a whole number
        # of chunks as well as a whole number of shard blocks
        unit = math.lcm(chunk_size, self.n_shards * self.block_size)
        padded = pad_to_multiple(n, unit)
        h = jax.eval_shape(
            encode_fn, params,
            jax.ShapeDtypeStruct((chunk_size, seq_len), jnp.int32),
            jax.ShapeDtypeStruct((chunk_size, seq_len), jnp.int32),
        ).shape[-1]

        multi = self.mesh.size > 1
        emb_s = NamedSharding(self.mesh, P(DATA_AXIS, None))
        scale_s = NamedSharding(self.mesh, P(DATA_AXIS))
        alloc = jax.jit(
            lambda: (jnp.zeros((padded, h), self.store_dtype),
                     jnp.ones((padded,), jnp.float32)),
            **({"out_shardings": (emb_s, scale_s)} if multi else {}))
        buf, scales = alloc()

        key = ("stream", chunk_size, seq_len, h, self.quantized)
        if key not in self._search_cache:
            self._search_cache[key] = self._make_stream_fn(
                encode_fn, pad_id, multi, emb_s, scale_s)
        fn = self._search_cache[key]

        wire_max = (np.iinfo(wire_dtype).max
                    if np.dtype(wire_dtype) != token_ids.dtype else None)
        # stall watchdog: a wedged relay session (observed round 4: 0 CPU,
        # one idle socket, 58 min before a manual kill) surfaces here as a
        # bounded sync deadline instead of a silent multi-hour hang. Every
        # `sync_rows` dispatched rows, one force_sync probe proves the
        # chain EXECUTED; the probe is re-issued on a stall and StallError
        # raised when the session is presumed wedged (the AR2 runner then
        # aborts and rebuilds the whole phase — watchdog.retry_on_stall).
        import sys
        import time as _time

        def bounded_sync(upto: int):
            run_with_deadline(
                lambda: force_sync(buf, scales),
                self.stall_timeout_s,
                desc=f"build_streaming sync rows {upto}/{n}",
                retries=self.stall_retries)

        beat = _time.monotonic()
        synced = 0
        for s in range(0, n, chunk_size):
            now = _time.monotonic()
            if now - beat >= 60.0:
                print(f"[build_streaming] {s}/{n} rows dispatched",
                      file=sys.stderr, flush=True)
                beat = now
            ids = token_ids[s: s + chunk_size]
            if wire_max is not None and ids.max(initial=0) > wire_max:
                raise ValueError(
                    f"token id {ids.max()} overflows wire dtype "
                    f"{np.dtype(wire_dtype).name} (rows {s}:{s + len(ids)})")
            if ids.shape[0] < chunk_size:
                ids = np.pad(ids, ((0, chunk_size - ids.shape[0]), (0, 0)))
            buf, scales = fn(params, buf, scales,
                             jnp.asarray(s, jnp.int32),
                             jnp.asarray(ids.astype(wire_dtype, copy=False)))
            if (self.stall_timeout_s is not None
                    and s + chunk_size - synced >= self.sync_rows):
                bounded_sync(min(s + chunk_size, n))
                synced = s + chunk_size
        # prove the chunk chain EXECUTED (relay dispatch returns early):
        # one scalar fetch, so the caller's encode timer reads real work
        # instead of draining into the next phase's bucket
        bounded_sync(n)
        self.embeddings = buf
        self.row_scales = scales if self.quantized else None

    def _make_stream_fn(self, encode_fn: Callable, pad_id: int, multi: bool,
                        emb_s, scale_s) -> Callable:
        """One donated jit: ids -> encode -> (quantize) -> scatter."""
        quantized = self.quantized
        store = self.store_dtype

        def fn(params, buf, scales, start, ids_wire):
            ids = ids_wire.astype(jnp.int32)
            mask = (ids != pad_id).astype(jnp.int32)
            emb = encode_fn(params, ids, mask).astype(jnp.float32)
            # all-pad rows (tail padding) can encode to NaN (empty-mask
            # pooling); zero them so no NaN enters the score matmul
            emb = jnp.where((mask.sum(axis=1) > 0)[:, None], emb, 0.0)
            if quantized:
                sc = jnp.maximum(jnp.abs(emb).max(axis=1) / 127.0, 1e-12)
                codes = jnp.clip(jnp.round(emb / sc[:, None]),
                                 -127, 127).astype(jnp.int8)
                return (jax.lax.dynamic_update_slice(buf, codes, (start, 0)),
                        jax.lax.dynamic_update_slice(
                            scales, sc.astype(jnp.float32), (start,)))
            return (jax.lax.dynamic_update_slice(
                        buf, emb.astype(store), (start, 0)),
                    scales)

        kw = {}
        if multi:
            kw["out_shardings"] = (emb_s, scale_s)
            kw["in_shardings"] = (None, emb_s, scale_s, None,
                                  NamedSharding(self.mesh, P(DATA_AXIS, None)))
        return jax.jit(fn, donate_argnums=(1, 2), **kw)

    def free(self) -> None:
        """Release the HBM-resident rows (the next :meth:`build` restores
        them). Between AR2 refreshes the index is dead weight — at the
        8.8M-row int8 working point, 6.3 GB of a v5e chip's 16 GB — next
        to the train window's activations; the co-training launcher frees
        it once the window's dataset is built. Compiled search/update
        executables survive (they close over no buffers)."""
        self.embeddings = None
        self.row_scales = None

    def update_rows(self, start: int, embeddings: np.ndarray) -> None:
        """In-place row update (incremental re-encode between phases).

        Device-side and donation-based: the updated index never leaves HBM
        and never doubles (the donated input buffer is reused), the int8
        branch quantizes ON DEVICE (per-row symmetric codes + scales, same
        math as :meth:`_quantize`), and the result sharding is pinned back
        to the row-sharded layout so subsequent searches see the same
        distribution. ``start`` is a traced scalar — updating different
        offsets does not recompile; only a new chunk SHAPE does.
        """
        n = embeddings.shape[0]
        if self._pass_src is not None:
            raise RuntimeError(
                "update_rows is not available on a multi-pass index "
                "(rows are re-encoded from tokens each search pass; "
                "update the token source instead)")
        if start < 0 or start + n > self.num_rows:
            raise ValueError(
                f"update_rows([{start}:{start + n}]) outside the live row "
                f"range [0:{self.num_rows}] (padding rows are not "
                "addressable)")
        key = ("update", n, self.quantized)
        if key not in self._search_cache:
            self._search_cache[key] = self._make_update_fn()
        fn = self._search_cache[key]
        rows = jnp.asarray(np.asarray(embeddings, np.float32))
        if self.quantized:
            self.embeddings, self.row_scales = fn(
                self.embeddings, self.row_scales,
                jnp.asarray(start, jnp.int32), rows)
        else:
            self.embeddings = fn(self.embeddings,
                                 jnp.asarray(start, jnp.int32), rows)

    def _make_update_fn(self) -> Callable:
        # explicit out_shardings are skipped on 1-device meshes (the same
        # relay pathology as train-step shardings — steps.sharding_kwargs)
        multi = self.mesh.size > 1
        emb_s = NamedSharding(self.mesh, P(DATA_AXIS, None))
        scale_s = NamedSharding(self.mesh, P(DATA_AXIS))

        if self.quantized:
            kw = ({"out_shardings": (emb_s, scale_s)} if multi else {})

            def fn(emb, scales, start, rows):
                s = jnp.maximum(jnp.abs(rows).max(axis=1) / 127.0, 1e-12)
                codes = jnp.clip(jnp.round(rows / s[:, None]),
                                 -127, 127).astype(jnp.int8)
                return (jax.lax.dynamic_update_slice(emb, codes, (start, 0)),
                        jax.lax.dynamic_update_slice(
                            scales, s.astype(jnp.float32), (start,)))

            return jax.jit(fn, donate_argnums=(0, 1), **kw)

        kw = ({"out_shardings": emb_s} if multi else {})

        def fn(emb, start, rows):
            return jax.lax.dynamic_update_slice(
                emb, rows.astype(emb.dtype), (start, 0))

        return jax.jit(fn, donate_argnums=(0,), **kw)

    def _make_search_fn(self, k: int) -> Callable:
        """Raw (jittable) sharded search fn ``(queries, embeddings) ->
        (scores, ids)`` — composable inside larger jitted programs (e.g. the
        serving facade's fused encode+search)."""
        mesh, block = self.mesh, self.block_size
        quantized = self.quantized
        shard_rows = self.embeddings.shape[0] // self.n_shards
        num_rows = self.num_rows

        def local_search(q, shard, scales):
            rank = jax.lax.axis_index(DATA_AXIS)
            offset = rank * shard_rows
            scores, ids = blocked_mips_topk(
                q, shard if quantized else shard.astype(q.dtype), k,
                block_size=block,
                id_offset=offset, valid_n=jnp.minimum(
                    jnp.maximum(num_rows - offset, 0), shard_rows),
                axis_name=DATA_AXIS, mode=self.mode,
                recall_target=self.recall_target,
                row_scales=scales if quantized else None)
            # [n_shards, Q, k] on every device after gather; every device
            # merges the same gathered lists, so outputs are replicated by
            # construction (hence check_vma=False below — JAX cannot prove
            # post-all_gather invariance statically).
            g_scores = jax.lax.all_gather(scores, DATA_AXIS)
            g_ids = jax.lax.all_gather(ids, DATA_AXIS)
            return merge_topk(g_scores, g_ids, k)

        return jax.shard_map(
            local_search, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )

    def _make_search(self, k: int, q_len: int) -> Callable:
        return jax.jit(self._make_search_fn(k))

    def _scales_arg(self) -> jax.Array:
        """Third search-fn arg: real row scales, or a 1-per-shard dummy
        (the unquantized branch never reads it — static closure branch)."""
        if self.quantized:
            return self.row_scales
        return jax.device_put(
            jnp.zeros((self.n_shards,), jnp.float32),
            NamedSharding(self.mesh, P(DATA_AXIS)))

    def search(self, queries: np.ndarray, k: int,
               query_batch: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k over the full corpus: [Q, H] -> (scores [Q,k], ids [Q,k])."""
        if self._pass_src is not None:
            return self._search_passes(queries, k, query_batch)
        if self.embeddings is None:
            raise RuntimeError("index not built")
        q = np.asarray(queries)
        nq = q.shape[0]
        qb = min(query_batch, pad_to_multiple(nq, 8))
        # the compiled fn bakes the padded buffer shape and the live-row
        # mask (closures in _make_search_fn) — key on both so identically
        # shaped refresh rebuilds reuse it while multi-pass searches with
        # alternating live counts each keep their own entry
        key = (k, qb, self.embeddings.shape[0], self.num_rows)
        if key not in self._search_cache:
            self._search_cache[key] = self._make_search(k, qb)
        fn = self._search_cache[key]
        q_dtype = jnp.bfloat16 if self.quantized else self.store_dtype
        scales = self._scales_arg()
        # dispatch every chunk before draining any result, so device
        # compute for chunk i+1 overlaps the host transfer of chunk i
        # (a serial dispatch->transfer loop stalls the chip per chunk)
        pending = []
        for s in range(0, nq, qb):
            chunk = q[s: s + qb]
            valid = chunk.shape[0]
            if valid < qb:
                chunk = np.pad(chunk, ((0, qb - valid), (0, 0)))
            sc, ids = fn(jnp.asarray(chunk, dtype=q_dtype),
                         self.embeddings, scales)
            pending.append((valid, sc, ids))
        # result pulls are idempotent reads — bounded by the stall watchdog
        # so a wedged session raises StallError instead of hanging the
        # whole eval (round-4 failure mode; callers may retry the search)
        def pull(arr, dtype=None):
            return run_with_deadline(
                lambda: np.asarray(arr) if dtype is None
                else np.asarray(arr, dtype),
                self.stall_timeout_s,
                desc=f"search result pull ({nq} queries, k={k})",
                retries=self.stall_retries)

        all_s = [pull(sc[:v], np.float32) for v, sc, _ in pending]
        all_i = [pull(ids[:v]) for v, _, ids in pending]
        return np.concatenate(all_s), np.concatenate(all_i)

    def _search_passes(self, queries: np.ndarray, k: int,
                       query_batch: int) -> Tuple[np.ndarray, np.ndarray]:
        """Search a corpus larger than device HBM in resident passes.

        Per pass: streaming-build the slice on device (re-encode; token ids
        are the only wire traffic), search ALL queries against it, free the
        buffer, and merge the per-pass top-k on host. Exact by construction
        (each pass's top-k is exact over its rows; the union of per-pass
        top-k lists contains the global top-k). This is the reference's
        8-GPU FAISS shard-and-merge (``co_training_generate_new_train_wiki
        .py:307-332``) folded onto one chip in time instead of space; the
        int8 store at ~10.5M rows/pass covers the 21M-row wiki corpus in 2.
        """
        src = self._pass_src
        n = src["token_ids"].shape[0]
        # pass size: the largest chunk multiple under the resident cap
        # (build_streaming re-pads per pass; equal passes share executables)
        per = max(self.max_resident_rows
                  - self.max_resident_rows % src["chunk_size"],
                  src["chunk_size"])
        all_scores, all_ids = [], []
        try:
            for start in range(0, n, per):
                stop = min(start + per, n)
                self._pass_src = None     # resident build path
                self.build_streaming(
                    src["encode_fn"], src["params"],
                    src["token_ids"][start:stop],
                    chunk_size=src["chunk_size"], pad_id=src["pad_id"],
                    wire_dtype=src["wire_dtype"])
                sc, ids = self.search(queries, k, query_batch=query_batch)
                self.free()
                all_scores.append(sc)
                all_ids.append(ids.astype(np.int64) + start)
        finally:
            self._pass_src = src
            self.num_rows = n
            self.embeddings = None
            self.row_scales = None
        cat_s = np.concatenate(all_scores, axis=1)
        cat_i = np.concatenate(all_ids, axis=1)
        order = np.argsort(-cat_s, axis=1, kind="stable")[:, :k]
        return (np.take_along_axis(cat_s, order, axis=1),
                np.take_along_axis(cat_i, order, axis=1))


def reform_out(
    questions: Sequence[str],
    answers: Sequence[Sequence[str]],
    q_ids: Sequence[str],
    topk_ids: np.ndarray,
    topk_scores: np.ndarray,
    hits: Sequence[Sequence[bool]],
    passages: Dict[int, Tuple[str, str]],       # pid -> (text, title)
    gold_positives: Optional[Dict[str, dict]] = None,  # question -> ctx dict
) -> List[dict]:
    """Regenerate the SimANS train JSON from search results.

    Contract of ``reform_out`` (``co_training_generate_new_train_wiki.py:
    182-223``): retrieved hits become ``positive_ctxs`` (after the gold
    positive, whose score is updated if it was itself retrieved), non-hits
    become ``hard_negative_ctxs``; every ctx carries the retriever score the
    SimANS sampler will consume.
    """
    out = []
    gold_positives = gold_positives or {}
    for qi, question in enumerate(questions):
        positive_ctxs: List[dict] = []
        negative_ctxs: List[dict] = []
        real_true_id = None
        if question in gold_positives:
            gold = dict(gold_positives[question])
            gold.setdefault("passage_id", gold.get("id", gold.get("psg_id")))
            gold["score"] = str(0)
            # gold dumps that carry only title/text have no id at all —
            # keep the gold positive but skip id-based score dedup below
            if gold["passage_id"] is not None:
                real_true_id = int(gold["passage_id"])
            positive_ctxs.append(gold)
        for rank in range(topk_ids.shape[1]):
            pid = int(topk_ids[qi, rank])
            score = float(topk_scores[qi, rank])
            text, title = passages.get(pid, ("", ""))
            ctx = {"title": title, "text": text, "passage_id": pid,
                   "score": str(score)}
            if hits[qi][rank]:
                if real_true_id is not None and pid == real_true_id:
                    positive_ctxs[0]["score"] = str(score)
                else:
                    positive_ctxs.append(ctx)
            else:
                negative_ctxs.append(ctx)
        out.append({
            "q_id": str(q_ids[qi]), "question": question,
            "answers": list(answers[qi]), "positive_ctxs": positive_ctxs,
            "hard_negative_ctxs": negative_ctxs, "negative_ctxs": [],
        })
    return out


@dataclasses.dataclass
class MiningResult:
    topk_ids: np.ndarray
    topk_scores: np.ndarray
    hits: List[List[bool]]
    top_k_hits: List[float]
    metrics: Dict[str, float]
    train_examples: List[dict]


class RetrievalEngine:
    """Full mine/eval phase: search -> hit label -> metrics -> train refresh.

    The single-object replacement for ``RenewTools``
    (``co_training_generate_new_train_wiki.py:226-465``).
    ``passages`` maps pid -> (text, title).
    """

    def __init__(self, index: MIPSIndex, passages: Dict[int, Tuple[str, str]],
                 logger=None):
        self.index = index
        self.passages = passages
        self.logger = logger          # optional MetricLogger for phase timers

    def mine(
        self,
        query_embeddings: np.ndarray,
        questions: Sequence[str],
        answers: Sequence[Sequence[str]],
        q_ids: Optional[Sequence[str]] = None,
        k: int = 100,
        gold_positives: Optional[Dict[str, dict]] = None,
        match_type: str = "string",
        positive_ids: Optional[Sequence] = None,
    ) -> MiningResult:
        """Search + label + metrics + train-file refresh.

        Hit labeling has the reference's two modes:

        - answer string match (``has_answer`` over passage text) — the
          wiki/NQ/TQ path (``co_training_generate_new_train_wiki.py:349-358``);
        - ``positive_ids``: per-query collections of gold passage ids (row
          ids in this index) — the MARCO qrels path, where relevance comes
          from qrels instead of string match
          (``inference_DE_marco.py:446-560`` load qidmap/qrels -> labels).
          When given it takes precedence over string matching.
        """
        import contextlib

        timed = (self.logger.timed if self.logger is not None
                 else (lambda name: contextlib.nullcontext()))
        with timed("search"):
            scores, ids = self.index.search(query_embeddings, k)
        with timed("hit_labeling"):
            if positive_ids is not None:
                gold_sets = [set(int(p) for p in pids)
                             for pids in positive_ids]
                hits = [[int(pid) in gold_sets[qi] for pid in ids[qi]]
                        for qi in range(len(questions))]
            else:
                hits = [
                    [has_answer(answers[qi],
                                self.passages.get(int(pid), ("", ""))[0],
                                match_type)
                     for pid in ids[qi]]
                    for qi in range(len(questions))
                ]
        q_ids = q_ids if q_ids is not None else [str(i) for i in range(len(questions))]
        train = reform_out(questions, answers, q_ids, ids, scores, hits,
                           self.passages, gold_positives)
        return MiningResult(
            topk_ids=ids, topk_scores=scores, hits=hits,
            top_k_hits=top_k_hits_accuracy(hits),
            metrics=get_metrics(hits),
            train_examples=train,
        )
