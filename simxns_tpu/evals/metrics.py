"""Retrieval metrics.

Vectorized (numpy) re-implementations of the reference's evaluators:

- ``Eval_Tool`` — MRR/MAP/DCG/nDCG/P at {1,5,10,20,50,100} over per-question
  binary hit lists (``SimANS/utils/dpr_utils.py:91-164``). Note the
  reference's quirks are preserved deliberately: ``MAP_n`` divides by ``n``
  (not by #relevant), and ``nDCG_n`` normalizes by
  ``sum(log2(i+2) for i in range(n))`` (not the ideal DCG) — matching them is
  required to compare against published ``*_eval_result*.json`` files.
- DPR-style top-k hit accuracy curve (``co_training_generate_new_train_wiki.
  py:167-179``): fraction of questions whose first hit is at rank <= k.
- MS MARCO MRR@10 / Recall@k over qrels
  (``PROD/ProD_base/inference_DE_marco.py:493-560``).
- TREC nDCG@k with graded relevance (replaces pytrec_eval, which the
  reference shells out to in ``CAPSTONE/utils/evaluate_trec.py:30`` —
  pytrec_eval is not in this image, so it's implemented natively).

All functions take plain Python/numpy inputs — evaluation is host-side, off
the jit path, exactly like the reference.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Mapping, Sequence

import numpy as np


def _as_hit_matrix(results_list: Sequence[Sequence[bool]], n: int) -> np.ndarray:
    """[Q, n] binary matrix from per-question hit lists (truncate/pad to n)."""
    q = len(results_list)
    mat = np.zeros((q, n), dtype=np.float64)
    for i, hits in enumerate(results_list):
        h = np.asarray(hits[:n], dtype=np.float64)
        mat[i, : len(h)] = h
    return mat


def mrr_n(results_list: Sequence[Sequence[bool]], n: int) -> float:
    mat = _as_hit_matrix(results_list, n)
    ranks = np.argmax(mat, axis=1)
    any_hit = mat.max(axis=1) > 0
    rr = np.where(any_hit, 1.0 / (ranks + 1.0), 0.0)
    return float(rr.mean())


def map_n(results_list: Sequence[Sequence[bool]], n: int) -> float:
    mat = _as_hit_matrix(results_list, n)
    cum_hits = np.cumsum(mat, axis=1)
    prec = cum_hits / np.arange(1, n + 1)[None, :]
    # reference divides by n, not by the number of relevant docs
    ap = (prec * mat).sum(axis=1) / n
    return float(ap.mean())


def dcg_n(results_list: Sequence[Sequence[bool]], n: int) -> float:
    mat = _as_hit_matrix(results_list, n)
    gains = 1.0 / np.log2(np.arange(n)[None, :] + 2.0)
    return float((mat * gains).sum(axis=1).mean())


def ndcg_n(results_list: Sequence[Sequence[bool]], n: int) -> float:
    mat = _as_hit_matrix(results_list, n)
    gains = 1.0 / np.log2(np.arange(n)[None, :] + 2.0)
    # reference normalizer: sum of log2(i+2), NOT the ideal DCG
    norm = sum(math.log2(i + 2) for i in range(n))
    return float(((mat * gains).sum(axis=1) / norm).mean())


def p_n(results_list: Sequence[Sequence[bool]], n: int) -> float:
    mat = _as_hit_matrix(results_list, n)
    return float((mat.sum(axis=1) / n).mean())


def get_metrics(results_list: Sequence[Sequence[bool]]) -> Dict[str, float]:
    """The ``Eval_Tool.get_matrics`` result dict (same key format)."""
    cutoffs = [1, 5, 10, 20, 50, 100]
    fns = {"MRR_n": mrr_n, "MAP_n": map_n, "DCG_n": dcg_n,
           "nDCG_n": ndcg_n, "P_n": p_n}
    return {
        f"{name}@_{p}": fn(results_list, p)
        for name, fn in fns.items()
        for p in cutoffs
    }


def top_k_hits_accuracy(results_list: Sequence[Sequence[bool]]) -> List[float]:
    """DPR top-k curve: acc[k] = fraction of questions with a hit at rank <= k+1.

    Mirrors ``validate()``'s best-hit accumulation
    (``co_training_generate_new_train_wiki.py:167-179``).
    """
    if not results_list:
        return []
    n_docs = len(results_list[0])
    top_k_hits = [0] * n_docs
    for hits in results_list:
        best = next((i for i, x in enumerate(hits) if x), None)
        if best is not None:
            for i in range(best, n_docs):
                top_k_hits[i] += 1
    return [v / len(results_list) for v in top_k_hits]


def marco_mrr_at_k(
    ranked_ids: Mapping[str, Sequence[int]],
    qrels: Mapping[str, Iterable[int]],
    k: int = 10,
) -> float:
    """MS MARCO MRR@k: qid -> ranked pid list vs qid -> relevant pid set.

    REFERENCE CONTRACT (``inference_DE_marco.py:542``): the denominator is
    the number of JUDGED queries (len(qrels)), not the number ranked —
    judged queries missing from the run drag the score down instead of
    silently inflating it.
    """
    total = 0.0
    for qid, ranked in ranked_ids.items():
        if qid not in qrels:
            continue
        rel = set(qrels[qid])
        for rank, pid in enumerate(ranked[:k]):
            if pid in rel:
                total += 1.0 / (rank + 1)
                break
    return total / max(len(qrels), 1)


def marco_recall_at_k(
    ranked_ids: Mapping[str, Sequence[int]],
    qrels: Mapping[str, Iterable[int]],
    k: int,
) -> float:
    """MS MARCO recall@k: BINARY any-hit per query over len(qrels).

    REFERENCE CONTRACT (``inference_DE_marco.py:525-549``): a query counts
    1 if ANY relevant pid appears in its top-k (not the fractional
    |retrieved∩rel|/|rel|), and the denominator is the judged-query count.
    """
    hits = 0
    for qid, ranked in ranked_ids.items():
        if qid not in qrels:
            continue
        rel = set(qrels[qid])
        if any(pid in rel for pid in ranked[:k]):
            hits += 1
    return hits / max(len(qrels), 1)


def trec_ndcg_at_k(
    ranked_ids: Mapping[str, Sequence[int]],
    graded_qrels: Mapping[str, Mapping[int, int]],
    k: int = 10,
) -> float:
    """Graded nDCG@k with trec_eval's LINEAR gain (gain = rel, not
    2^rel - 1) — pytrec_eval's ``ndcg_cut`` is linear, and this function
    replaces the reference's pytrec_eval call
    (``CAPSTONE/utils/evaluate_trec.py:30+``); exponential gain would not
    be comparable to published TREC-DL numbers. (The two coincide on
    binary qrels.)
    """
    total, count = 0.0, 0
    for qid, ranked in ranked_ids.items():
        grades = graded_qrels.get(qid)
        if not grades:
            continue
        count += 1
        dcg = sum(
            grades.get(pid, 0) / math.log2(rank + 2)
            for rank, pid in enumerate(ranked[:k])
        )
        ideal = sorted(grades.values(), reverse=True)[:k]
        idcg = sum(g / math.log2(r + 2) for r, g in enumerate(ideal))
        total += dcg / idcg if idcg > 0 else 0.0
    return total / max(count, 1)


def trec_map_at_k(
    ranked_ids: Mapping[str, Sequence[int]],
    graded_qrels: Mapping[str, Mapping[int, int]],
    k: int = 10,
) -> float:
    """trec_eval ``map_cut_k`` over graded qrels: average precision with
    the ranking cut at ``k`` but the denominator = TOTAL relevant count
    (grade > 0), not min(R, k). The reference reads ``map_cut_10`` from
    pytrec_eval (``CAPSTONE/utils/evaluate_trec.py:72-107``).
    """
    total, count = 0.0, 0
    for qid, ranked in ranked_ids.items():
        grades = graded_qrels.get(qid)
        if not grades:
            continue
        count += 1
        rel = {pid for pid, g in grades.items() if g > 0}
        if not rel:
            continue                     # contributes 0 to the mean
        hits, ap = 0, 0.0
        for rank, pid in enumerate(ranked[:k]):
            if pid in rel:
                hits += 1
                ap += hits / (rank + 1)
        total += ap / len(rel)
    return total / max(count, 1)


def trec_recip_rank(
    ranked_ids: Mapping[str, Sequence[int]],
    graded_qrels: Mapping[str, Mapping[int, int]],
) -> float:
    """trec_eval ``recip_rank``: 1/rank of the first relevant (grade > 0)
    document in the full submitted ranking (no cutoff)."""
    total, count = 0.0, 0
    for qid, ranked in ranked_ids.items():
        grades = graded_qrels.get(qid)
        if not grades:
            continue
        count += 1
        rel = {pid for pid, g in grades.items() if g > 0}
        for rank, pid in enumerate(ranked):
            if pid in rel:
                total += 1.0 / (rank + 1)
                break
    return total / max(count, 1)


def trec_recall_at_k(
    ranked_ids: Mapping[str, Sequence[int]],
    graded_qrels: Mapping[str, Mapping[int, int]],
    k: int = 100,
) -> float:
    """trec_eval ``recall_k``: |relevant ∩ top-k| / |relevant| (grade > 0),
    averaged over evaluated queries — the reference's ``recall_topN``
    (``CAPSTONE/utils/evaluate_trec.py:100-107``)."""
    total, count = 0.0, 0
    for qid, ranked in ranked_ids.items():
        grades = graded_qrels.get(qid)
        if not grades:
            continue
        count += 1
        rel = {pid for pid, g in grades.items() if g > 0}
        if not rel:
            continue
        total += sum(1 for pid in ranked[:k] if pid in rel) / len(rel)
    return total / max(count, 1)


def trec_eval_all(
    ranked_ids: Mapping[str, Sequence[int]],
    graded_qrels: Mapping[str, Mapping[int, int]],
    k: int = 10,
    recall_k: int = 100,
) -> Dict[str, float]:
    """The reference's full TREC comparison surface in one call: nDCG@k,
    map_cut_k, recip_rank, recall_N (``EvalDevQuery``,
    ``CAPSTONE/utils/evaluate_trec.py:72-107``)."""
    return {
        f"ndcg_cut_{k}": trec_ndcg_at_k(ranked_ids, graded_qrels, k),
        f"map_cut_{k}": trec_map_at_k(ranked_ids, graded_qrels, k),
        "recip_rank": trec_recip_rank(ranked_ids, graded_qrels),
        f"recall_{recall_k}": trec_recall_at_k(ranked_ids, graded_qrels,
                                               recall_k),
    }


def write_eval_result(path: str, top_k_hits: Sequence[float],
                      results_list: Sequence[Sequence[bool]]) -> dict:
    """Write the reference's ``*_eval_result<step>.json`` contract:
    ``{top1, top5, top20, top100, result_dict: {MRR_n@_k, ...}}``
    (``co_training_generate_new_train_wiki.py:384-387``, SURVEY.md App. A).
    """
    import json

    # keys beyond the retrieval depth are OMITTED, not padded with the
    # last curve value — a top20-depth eval must not publish a "top100"
    # field (the reference indexes top_k_hits[99] and fails loudly)
    payload = {f"top{k}": top_k_hits[k - 1]
               for k in (1, 5, 20, 100) if len(top_k_hits) >= k}
    payload["result_dict"] = get_metrics(results_list)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    return payload
