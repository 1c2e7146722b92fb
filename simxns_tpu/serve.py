"""End-to-end dense-retrieval serving facade.

The reference has no serving story — retrieval happens inside offline
generate/inference scripts. This facade packages the full query path
(tokenize -> encode -> sharded MIPS search -> passage lookup) behind one
object for production use:

    retriever = DenseRetriever(model, params, tokenizer, mesh)
    retriever.index_corpus(passages)            # encode + build HBM index
    hits = retriever.search(["who wrote hamlet?"], k=10)

Compiled paths are cached per (batch, k); queries are padded to the serving
batch so every request hits the same executable. ``from_checkpoint`` wires
an Orbax checkpoint + HF tokenizer for deployment.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from simxns_tpu.index.engine import CorpusEncoder, MIPSIndex
from simxns_tpu.parallel.mesh import create_mesh


@dataclasses.dataclass
class SearchHit:
    passage_id: int
    score: float
    text: str
    title: str


class DenseRetriever:
    def __init__(self, model, params, tokenizer, mesh=None,
                 max_q_length: int = 32, max_ctx_length: int = 128,
                 index_mode: str = "approx", block_size: int = 8192,
                 encode_chunk: int = 1024, query_batch: int = 8,
                 store_dtype=None):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.mesh = mesh or create_mesh()
        self.max_q_length = max_q_length
        self.max_ctx_length = max_ctx_length
        self.query_batch = query_batch
        index_kw = {} if store_dtype is None else {"store_dtype": store_dtype}
        self.index = MIPSIndex(self.mesh, block_size=block_size,
                               mode=index_mode, **index_kw)
        n_chips = int(np.prod(list(self.mesh.shape.values())))
        self._p_encoder = CorpusEncoder(
            lambda p, i, m: model.apply(p, i, m, method="encode_passage"),
            self.mesh, chunk_size=encode_chunk * n_chips)
        self._q_encoder = CorpusEncoder(
            lambda p, i, m: model.apply(p, i, m, method="encode_query"),
            self.mesh, chunk_size=max(query_batch, 8))
        self.passages: Dict[int, Tuple[str, str]] = {}

    # --- indexing ----------------------------------------------------------
    def _tokenize(self, texts: Sequence[str], pairs: Optional[Sequence[str]],
                  length: int) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.full((len(texts), length), self.tokenizer.pad_token_id,
                      np.int32)
        for i, text in enumerate(texts):
            enc = self.tokenizer.encode(
                text, text_pair=pairs[i] if pairs else None,
                max_length=length)
            ids[i, : len(enc)] = enc
        return ids, (ids != self.tokenizer.pad_token_id).astype(np.int32)

    def index_corpus(self, passages: Dict[int, Tuple[str, str]],
                     precomputed_tokens: Optional[np.ndarray] = None) -> int:
        """``{pid: (text, title)}`` -> encode + build the HBM index.

        Passage ids must be dense 0..N-1 (the index returns row positions).
        """
        self.passages = dict(passages)
        n = len(passages)
        if precomputed_tokens is not None:
            ids = precomputed_tokens
            mask = (ids != self.tokenizer.pad_token_id).astype(np.int32)
        else:
            texts = [passages[i][0] for i in range(n)]
            titles = [passages[i][1] for i in range(n)]
            ids, mask = self._tokenize(titles, texts, self.max_ctx_length)
        emb = self._p_encoder(self.params, ids, mask)
        self.index.build(emb)
        # the fused search fns bake valid_n (the live row count) in at
        # trace time; a re-index to a same-padded shape would NOT retrace
        # — drop them like MIPSIndex.build drops its own _search_cache
        self._fused = {}
        return n

    # --- querying ----------------------------------------------------------
    def encode_queries(self, queries: Sequence[str]) -> np.ndarray:
        ids, mask = self._tokenize(list(queries), None, self.max_q_length)
        return self._q_encoder(self.params, ids, mask)

    def _fused_search(self, k: int):
        """One jitted program: query encode + sharded top-k search.

        A single device dispatch per request instead of three — matters
        when per-call dispatch latency is non-trivial (remote/tunneled
        runtimes; also saves an HBM round-trip of the query embeddings).
        """
        if getattr(self, "_fused", None) is None:
            self._fused = {}
        key = (k, self.query_batch)
        if key in self._fused:
            return self._fused[key]
        import jax
        import jax.numpy as jnp

        model, index = self.model, self.index

        def fn(params, q_ids, q_mask, emb, scales):
            q_emb = model.apply(params, q_ids, q_mask, method="encode_query")
            q_dtype = jnp.bfloat16 if index.quantized else emb.dtype
            search = index._make_search_fn(k)
            return search(q_emb.astype(q_dtype), emb, scales)

        self._fused[key] = jax.jit(fn)
        return self._fused[key]

    def search(self, queries: Sequence[str], k: int = 10
               ) -> List[List[SearchHit]]:
        if self.index.embeddings is None:
            raise RuntimeError(
                "index not built — call index_corpus() first")
        ids, mask = self._tokenize(list(queries), None, self.max_q_length)
        nq = len(queries)
        qb = self.query_batch
        pad = (-nq) % qb
        if pad:
            ids = np.pad(ids, ((0, pad), (0, 0)),
                         constant_values=self.tokenizer.pad_token_id)
            mask = np.pad(mask, ((0, pad), (0, 0)))
        # chunk by the serving batch so EVERY request size reuses the one
        # cached executable (a padded one-shot call would retrace per
        # distinct size); chunk dispatches pipeline before the transfers
        fn = self._fused_search(k)
        pending = [fn(self.params, ids[s:s + qb], mask[s:s + qb],
                      self.index.embeddings, self.index._scales_arg())
                   for s in range(0, nq + pad, qb)]
        scores = np.concatenate(
            [np.asarray(s, np.float32) for s, _ in pending])[:nq]
        ids = np.concatenate([np.asarray(p) for _, p in pending])[:nq]
        out: List[List[SearchHit]] = []
        for qi in range(len(queries)):
            hits = []
            for rank in range(k):
                pid = int(ids[qi, rank])
                text, title = self.passages.get(pid, ("", ""))
                hits.append(SearchHit(pid, float(scores[qi, rank]),
                                      text, title))
            out.append(hits)
        return out

    @staticmethod
    def from_checkpoint(ckpt_dir: str, step: int, model, tokenizer,
                        example_params, mesh=None, **kw) -> "DenseRetriever":
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from simxns_tpu.io.checkpoint import restore_checkpoint

        state = restore_checkpoint(ckpt_dir, example_params, step)
        params = state.params if hasattr(state, "params") else state
        mesh = mesh or create_mesh()
        # Orbax restores onto a single device; replicate across the serving
        # mesh so the jitted encode/search programs accept them.
        params = jax.device_put(params, NamedSharding(mesh, P()))
        return DenseRetriever(model, params, tokenizer, mesh=mesh, **kw)
