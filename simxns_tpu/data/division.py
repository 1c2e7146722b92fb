"""PROD data-progressive tooling: rank-bucket division + subset selection.

Replaces ``PROD/ProD_KD/utils/dataset_division_{marco,nq,marcodoc}.py``:
bucket each query by the rank at which its first relevant passage appears in
a model's top-k list, then select the "teacher good / student bad" subset
(e.g. student rank in 2..15 while teacher rank == 1,
``dataset_division_marco.py:175-176``: ``divide1['2t15'] & divide2['top1']``)
for the final LwF-stabilized distillation round.

Bucket names and boundaries match the reference exactly
(``divide_data`` :57-150): top1, 2ti (rank 2), 2t5, 2t10, 2t15, 6t20,
21t50, 51t100, 101tall.
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Sequence, Set

_BUCKETS = {
    "top1": (0, 1),
    "2ti": (1, 2),
    "2t5": (1, 5),
    "2t10": (1, 10),
    "2t15": (1, 15),
    "6t20": (5, 20),
    "21t50": (20, 50),
    "51t100": (50, 100),
    "101tall": (100, 1000),
}


def first_relevant_rank(ranked: Sequence[int], relevant: Iterable[int]) -> int:
    """0-based rank of the first relevant pid, or -1 if absent."""
    rel = set(relevant)
    for i, pid in enumerate(ranked):
        if pid in rel:
            return i
    return -1


def divide_data(
    qid_to_ranked: Mapping[str, Sequence[int]],
    qrels: Mapping[str, Iterable[int]],
) -> Dict[str, Set[str]]:
    """Bucket qids by first-relevant rank (reference bucket semantics,
    including overlapping buckets like 2t5 / 2t10 / 2t15)."""
    out: Dict[str, Set[str]] = {name: set() for name in _BUCKETS}
    for qid, ranked in qid_to_ranked.items():
        if qid not in qrels:
            continue
        r = first_relevant_rank(ranked, qrels[qid])
        if r < 0:
            continue
        for name, (lo, hi) in _BUCKETS.items():
            if lo <= r < hi:
                out[name].add(qid)
    return out


def teacher_better_qids(
    student_ranked: Mapping[str, Sequence[int]],
    teacher_ranked: Mapping[str, Sequence[int]],
    qrels: Mapping[str, Iterable[int]],
    student_bucket: str = "2t15",
    teacher_bucket: str = "top1",
) -> Set[str]:
    """Queries where the teacher ranks gold first but the student doesn't —
    the LwF-round training subset (``CE24_top2t15_better.json`` recipe)."""
    div_s = divide_data(student_ranked, qrels)
    div_t = divide_data(teacher_ranked, qrels)
    return div_s[student_bucket] & div_t[teacher_bucket]


def select_examples(examples: Sequence, qids: Set[str]) -> list:
    """Filter retrieval examples to a qid subset.

    Both sides are coerced to str: ranked-result dicts unpickled from
    reference-format files key qids as ints, and a str-vs-int mismatch
    would silently select nothing.
    """
    qid_strs = {str(q) for q in qids}
    return [ex for ex in examples if str(ex.q_id) in qid_strs]
