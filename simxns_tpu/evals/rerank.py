"""Cross-encoder reranking of retrieved top-k lists.

The PROD pipeline reranks the student's top-k with the CE teacher to build
distillation data and rerank metrics (``PROD/ProD_base/rerank_train_eval_
marco.py:146-340``). Here: one jitted CE scoring pass over [Q, K] joint
inputs assembled from the token-array corpus (no re-tokenization), returning
ids reordered by CE score.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# jitted CE scorers keyed by (model class, config repr) — see rerank_topk
_SCORE_CACHE: dict = {}


def build_joint_inputs(query_ids: np.ndarray, corpus_ids: np.ndarray,
                       topk_ids: np.ndarray, max_joint_length: int,
                       pad_id: int = 0, sep_id: int = 2) -> np.ndarray:
    """[Q, Lq] queries + [N, Lc] corpus + [Q, K] ids -> [Q, K, Lj] joints."""
    q, k = topk_ids.shape
    out = np.full((q, k, max_joint_length), pad_id, np.int32)
    for qi in range(q):
        q_row = query_ids[qi]
        q_len = int((q_row != pad_id).sum())
        rows = corpus_ids[topk_ids[qi]]
        out[qi, :, :q_len] = q_row[:q_len]
        body = rows[:, 1:].copy()
        lens = (body != pad_id).sum(1)
        ri = np.arange(body.shape[0])
        last = np.clip(lens - 1, 0, body.shape[1] - 1)
        is_sep = (lens > 0) & (body[ri, last] == sep_id)
        body[ri[is_sep], last[is_sep]] = pad_id   # strip ctx trailing SEP
        take = min(max_joint_length - q_len, body.shape[1])
        out[qi, :, q_len: q_len + take] = body[:, :take]
    return out


def rerank_topk(ce_model, ce_params, joint_ids: np.ndarray,
                pad_id: int = 0, batch: int = 256,
                fused_int8: bool = False
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Score [Q, K, Lj] joint inputs with the CE; return (ce_scores [Q, K],
    reorder [Q, K] — positions into the original top-k by CE rank).

    ``fused_int8=True`` scores through a whole-layer fused int8 VIEW of the
    same params (``BertConfig.layer_impl='fused_int8'`` — param trees
    interchange): measured v5e-1 at the CE joint shape S=192, B=256 —
    **5068 joint/s vs 1804 XLA bf16 (2.81x)**, score corr 0.999
    (bench_r3_results.jsonl ce_rerank_s192). CE forward dominates reranker
    eval ("this step will take a lot of time", ``PROD/README.md:345``).
    """
    import dataclasses

    q, k, lj = joint_ids.shape
    if fused_int8:
        ce_model = type(ce_model)(dataclasses.replace(
            ce_model.cfg, bert=ce_model.cfg.bert.replace(
                layer_impl="fused_int8")))

    # cache the jitted scorer across calls (multi-checkpoint evals call
    # rerank_topk repeatedly; a fresh jit closure per call would pay the
    # full CE compile — minutes on remote-compile backends — every time)
    key = (type(ce_model).__name__, repr(ce_model.cfg))
    cached = _SCORE_CACHE.get(key)
    if cached is None:
        def score_fn(params, ids, mask):
            out = ce_model.apply(params, ids, mask, deterministic=True)
            return out["logits"]

        cached = jax.jit(score_fn)
        _SCORE_CACHE[key] = cached
    score = cached

    flat = joint_ids.reshape(q * k, lj)
    mask = (flat != pad_id).astype(np.int32)
    scores = []
    for s in range(0, q * k, batch):
        ids_c = flat[s: s + batch]
        mask_c = mask[s: s + batch]
        valid = ids_c.shape[0]
        if valid < batch:
            ids_c = np.pad(ids_c, ((0, batch - valid), (0, 0)))
            mask_c = np.pad(mask_c, ((0, batch - valid), (0, 0)))
        out = score(ce_params, jnp.asarray(ids_c), jnp.asarray(mask_c))
        scores.append(np.asarray(out, np.float32)[:valid])
    ce_scores = np.concatenate(scores).reshape(q, k)
    order = np.argsort(-ce_scores, axis=1, kind="stable")
    return ce_scores, order
