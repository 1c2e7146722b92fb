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
    # pytrec_eval's ndcg_cut uses LINEAR gain (gain = rel), which this
    # replaces; exponential 2^rel-1 would not match published TREC numbers
    ranked = {"q": [1, 2, 3]}
    qrels = {"q": {1: 3, 3: 1}}
    dcg = 3 / math.log2(2) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert abs(trec_ndcg_at_k(ranked, qrels, 10) - dcg / idcg) < 1e-12
    # binary qrels: linear == exponential
    assert abs(trec_ndcg_at_k({"q": [1]}, {"q": {1: 1}}, 5) - 1.0) < 1e-12


def test_trec_graded_map_mrr_recall():
    """pytrec_eval semantics on graded qrels (the reference reads
    map_cut_10 / recip_rank / recall_N next to ndcg_cut_10,
    CAPSTONE/utils/evaluate_trec.py:72-107): any grade > 0 counts as
    relevant; map divides by the TOTAL relevant count, not min(R, k)."""
    from simxns_tpu.evals import (
        trec_eval_all, trec_map_at_k, trec_recall_at_k, trec_recip_rank)

    ranked = {"q1": [9, 1, 7, 3, 5], "q2": [4, 8], "q3": [2]}
    qrels = {"q1": {1: 2, 3: 1, 6: 3},   # 3 relevant; hits at ranks 2, 4
             "q2": {8: 1, 5: 0},         # grade-0 doc is NOT relevant
             "q3": {}}                   # empty entry -> skipped
    # q1 AP@5: hits at rank2 (P=1/2) + rank4 (P=2/4), / R=3
    ap1 = (1 / 2 + 2 / 4) / 3
    # q2 AP@5: hit at rank2 (P=1/2) / R=1
    ap2 = (1 / 2) / 1
    assert abs(trec_map_at_k(ranked, qrels, 5) - (ap1 + ap2) / 2) < 1e-12
    # map cut BELOW the second hit: q1 keeps only the rank-2 hit
    assert abs(trec_map_at_k(ranked, qrels, 3)
               - ((1 / 2) / 3 + ap2) / 2) < 1e-12
    # recip_rank: first relevant at rank 2 for both
    assert abs(trec_recip_rank(ranked, qrels) - (1 / 2 + 1 / 2) / 2) < 1e-12
    # recall_2: q1 1/3, q2 1/1
    assert abs(trec_recall_at_k(ranked, qrels, 2)
               - (1 / 3 + 1) / 2) < 1e-12
    allm = trec_eval_all(ranked, qrels, k=5, recall_k=2)
    assert set(allm) == {"ndcg_cut_5", "map_cut_5", "recip_rank",
                         "recall_2"}
    # no relevant docs at all -> every metric 0, no division error
    assert trec_map_at_k({"q": [1]}, {"q": {1: 0}}, 5) == 0.0
    assert trec_recall_at_k({"q": [1]}, {"q": {1: 0}}, 5) == 0.0
    assert trec_recip_rank({"q": [1]}, {"q": {1: 0}}) == 0.0


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


def test_qrels_loaders(tmp_path):
    from simxns_tpu.data import load_qrels, load_trec_qrels
    p2 = tmp_path / "qrels2.tsv"
    p2.write_text("q1\t55\nq1\t66\nq2\t7\n")
    assert load_qrels(str(p2)) == {"q1": [55, 66], "q2": [7]}
    p4 = tmp_path / "qrels4.tsv"
    p4.write_text("q1\t0\t55\t1\nq1\t0\t66\t0\nq2\t0\t7\t2\n")
    assert load_qrels(str(p4)) == {"q1": [55], "q2": [7]}
    g = tmp_path / "trec.qrels"
    g.write_text("q1 0 55 3\nq1 0 66 1\n")
    assert load_trec_qrels(str(g)) == {"q1": {55: 3, 66: 1}}


def test_ce_rerank():
    import jax
    from simxns_tpu.evals import build_joint_inputs, rerank_topk
    from simxns_tpu.models import CrossEncoder, CrossEncoderConfig, BertConfig
    from simxns_tpu.data import HashTokenizer

    tok = HashTokenizer(vocab_size=512)
    rng = np.random.default_rng(0)
    n_corpus, lc = 20, 12
    corpus_ids = np.zeros((n_corpus, lc), np.int32)
    for i in range(n_corpus):
        enc = tok.encode(f"passage {i}", max_length=lc)
        corpus_ids[i, :len(enc)] = enc
    query_ids = np.zeros((3, 8), np.int32)
    for i in range(3):
        enc = tok.encode(f"query {i}", max_length=8)
        query_ids[i, :len(enc)] = enc
    topk = np.stack([rng.permutation(n_corpus)[:5] for _ in range(3)])
    joints = build_joint_inputs(query_ids, corpus_ids, topk, 20,
                                pad_id=0, sep_id=tok.sep_token_id)
    assert joints.shape == (3, 5, 20)
    q_len = int((query_ids[0] != 0).sum())
    np.testing.assert_array_equal(joints[0, :, :q_len],
                                  np.tile(query_ids[0][:q_len], (5, 1)))

    ce = CrossEncoder(CrossEncoderConfig(bert=BertConfig.tiny(vocab_size=512)))
    params = ce.init(jax.random.PRNGKey(0), joints.reshape(-1, 20)[:2],
                     np.ones((2, 20), np.int32))
    scores, order = rerank_topk(ce, params, joints, batch=8)
    assert scores.shape == (3, 5) and order.shape == (3, 5)
    # order actually sorts the scores descending
    sorted_scores = np.take_along_axis(scores, order, axis=1)
    assert (np.diff(sorted_scores, axis=1) <= 1e-6).all()


def test_write_eval_result(tmp_path):
    import json
    from simxns_tpu.evals import write_eval_result, top_k_hits_accuracy
    hits = [[False, True] + [False] * 98, [True] + [False] * 99]
    curve = top_k_hits_accuracy(hits)
    out = write_eval_result(str(tmp_path / "e.json"), curve, hits)
    loaded = json.load(open(tmp_path / "e.json"))
    assert loaded["top1"] == 0.5 and loaded["top5"] == 1.0
    assert loaded["top100"] == 1.0
    assert "MRR_n@_10" in loaded["result_dict"]


def test_rerank_topk_fused_int8_view_matches():
    """fused_int8=True scores through the int8 whole-layer view of the SAME
    params (interpret on CPU); rankings track the bf16 path."""
    import jax
    import numpy as np

    import simxns_tpu.ops.fused_layer as fl
    from simxns_tpu.evals.rerank import rerank_topk
    from simxns_tpu.models import BertConfig, CrossEncoder, CrossEncoderConfig

    rng = np.random.default_rng(0)
    ce = CrossEncoder(CrossEncoderConfig(
        bert=BertConfig.tiny(vocab_size=512)))
    joint = rng.integers(4, 512, size=(3, 4, 24)).astype(np.int32)
    p = ce.init(jax.random.PRNGKey(0), joint.reshape(12, 24)[:2],
                np.ones((2, 24), np.int32))
    s_ref, o_ref = rerank_topk(ce, p, joint, batch=12)
    old = fl.INTERPRET
    fl.INTERPRET = True
    try:
        s_fused, o_fused = rerank_topk(ce, p, joint, batch=12,
                                       fused_int8=True)
    finally:
        fl.INTERPRET = old
    corr = np.corrcoef(s_ref.ravel(), s_fused.ravel())[0, 1]
    assert corr > 0.99, corr
