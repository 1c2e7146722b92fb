import math

import numpy as np

from simxns_tpu.evals import (
    mrr_n, map_n, dcg_n, ndcg_n, p_n, get_metrics, top_k_hits_accuracy,
    marco_mrr_at_k, marco_recall_at_k, trec_ndcg_at_k,
    SimpleTokenizer, has_answer, check_answer)


# --- reference-style scalar oracles (literal transcription of the loop
#     semantics in SimANS/utils/dpr_utils.py:91-164) ---

def ref_mrr(results, n):
    out = []
    for hits in results:
        score = 0
        for rank, item in enumerate(hits[:n]):
            if item:
                score = 1.0 / (rank + 1)
                break
        out.append(score)
    return sum(out) / len(out)


def ref_map(results, n):
    out = []
    for predict in results:
        ap, hit_num = 0, 1
        for rank, item in enumerate(predict[:n]):
            if item:
                ap += hit_num / (rank + 1.0)
                hit_num += 1
        out.append(ap / n)
    return sum(out) / len(out)


def ref_ndcg(results, n):
    out = []
    for predict in results:
        v = sum(1 / math.log2(r + 2) for r, item in enumerate(predict[:n]) if item)
        out.append(v / sum(math.log2(i + 2) for i in range(n)))
    return sum(out) / len(out)


HITS = [
    [False, True, False, True, True],
    [True, False, False, False, False],
    [False] * 5,
    [True] * 5,
]


def test_eval_tool_parity():
    for n in (1, 3, 5):
        assert abs(mrr_n(HITS, n) - ref_mrr(HITS, n)) < 1e-12
        assert abs(map_n(HITS, n) - ref_map(HITS, n)) < 1e-12
        assert abs(ndcg_n(HITS, n) - ref_ndcg(HITS, n)) < 1e-12
    assert abs(p_n(HITS, 5) - (3 / 5 + 1 / 5 + 0 + 1) / 4) < 1e-12
    assert abs(dcg_n(HITS, 2) - ((1 / math.log2(3)) + 1 + 0 + (1 + 1 / math.log2(3))) / 4) < 1e-12
    keys = get_metrics(HITS).keys()
    assert "MRR_n@_10" in keys and "nDCG_n@_100" in keys and len(keys) == 30


def test_top_k_hits_curve():
    acc = top_k_hits_accuracy(HITS)
    # best hits at ranks 1,0,none,0 -> top1 = 2/4, top2 = 3/4, top5 = 3/4
    assert acc == [2 / 4, 3 / 4, 3 / 4, 3 / 4, 3 / 4]


def test_marco_metrics():
    ranked = {"q1": [5, 3, 9], "q2": [7, 1], "q3": [2]}
    qrels = {"q1": [3], "q2": [4]}
    # q1: hit at rank 2 -> 1/2 ; q2 no hit -> 0 ; q3 not in qrels -> skipped
    assert abs(marco_mrr_at_k(ranked, qrels, 10) - 0.25) < 1e-12
    assert abs(marco_recall_at_k(ranked, qrels, 2) - 0.5) < 1e-12


def test_trec_ndcg():
    ranked = {"q": [1, 2, 3]}
    qrels = {"q": {1: 3, 3: 1}}
    dcg = (2 ** 3 - 1) / math.log2(2) + (2 ** 1 - 1) / math.log2(4)
    idcg = (2 ** 3 - 1) / math.log2(2) + (2 ** 1 - 1) / math.log2(3)
    assert abs(trec_ndcg_at_k(ranked, qrels, 10) - dcg / idcg) < 1e-12


def test_simple_tokenizer():
    t = SimpleTokenizer()
    assert t.words("Hello, World!") == ["hello", ",", "world", "!"]
    assert t.words("naïve café") == ["naïve", "café"]


def test_has_answer_string_match():
    text = "The Eiffel Tower was completed in 1889 in Paris, France."
    assert has_answer(["1889"], text)
    assert has_answer(["Paris, France"], text)      # multi-token with punct
    assert has_answer(["EIFFEL tower"], text)       # uncased
    assert not has_answer(["London"], text)
    assert not has_answer(["188"], text)            # token-level, not substr
    # accents: NFD normalization makes composed/decomposed agree
    assert has_answer(["café"], "a nice café indeed")


def test_has_answer_regex():
    assert has_answer([r"18\d\d"], "completed in 1889", match_type="regex")
    assert not has_answer([r"19\d\d"], "completed in 1889", match_type="regex")


def test_check_answer_hit_list():
    hits = check_answer(["blue"], ["the sky is blue", "grass is green"])
    assert hits == [True, False]
