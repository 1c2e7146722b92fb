import numpy as np
import pytest

from simxns_tpu.data.curriculum import (
    QueryExpander, gradual_bucket, rouge_l_f1, bleu)
from simxns_tpu.allies import (
    ALLIESConfig, allies_answer, exact_match, f1_score, rouge_l)


def test_rouge_l():
    assert rouge_l_f1("the cat sat", "the cat sat") == 1.0
    assert rouge_l_f1("the cat sat", "dog runs fast") == 0.0
    # LCS of "a b c d" vs "a c d e" = "a c d" (3): p=3/4, r=3/4
    assert abs(rouge_l_f1("a b c d", "a c d e") - 0.75) < 1e-9


def test_bleu():
    assert bleu("the cat sat on the mat", "the cat sat on the mat") == 1.0
    assert bleu("the cat", "entirely different words") == 0.0


def test_gradual_schedule():
    # N=5 parts over 100 steps: bucket 5 (least similar) -> 1 (most similar)
    assert gradual_bucket(0, 100, 5) == (5, 0.0)
    assert gradual_bucket(20, 100, 5) == (4, 0.0)
    assert gradual_bucket(80, 100, 5) == (1, 0.0)
    assert gradual_bucket(99, 100, 5) == (1, 0.0)
    # gradual-gold ends on the gold query
    b, p = gradual_bucket(99, 100, 5, "gradual-gold")
    assert b == 0 and p == 1.0


def _expander():
    return QueryExpander(queries={
        7: ["who wrote hamlet", "what is hamlet about",
            "completely unrelated query", "hamlet author name"],
    }, total_part=2)


def test_select_query_modes():
    ex = _expander()
    rng = np.random.default_rng(0)
    gold = "who is the author of hamlet"
    assert ex.select_query(7, gold, "first", rng) == "who wrote hamlet"
    got = ex.select_query(7, gold, "random", rng)
    assert got in ex.queries[7]
    # top-1 = most rouge-similar to gold
    top = ex.select_query(7, gold, "top-1", rng)
    scores = {q: rouge_l_f1(gold, q) for q in ex.queries[7]}
    assert top == max(scores, key=scores.get)
    # 2-part (of 2) = least-similar half; with seed variance just check
    # it's NOT the most similar candidate
    for _ in range(5):
        part = ex.select_query(7, gold, "2-part", rng)
        assert part != top
    # gold_query_prob=1 always returns the gold query
    assert ex.select_query(7, gold, "random", rng, gold_query_prob=1.0) == gold
    # unknown passage falls back to gold
    assert ex.select_query(999, gold, "first", rng) == gold


def test_expand_passage_and_corpus():
    ex = _expander()
    assert ex.expand_passage("text", "a query") == "text a query"
    ex.delimiter = " [SEP] "
    out = ex.expand_corpus_entry(7, "text", top_k_query=2)
    assert out == "text [SEP] who wrote hamlet [SEP] what is hamlet about"


class ScriptedLLM:
    """Deterministic fake: knows the answer only given good evidence."""

    def __init__(self):
        self.good_evidence = "paris is the capital of france"

    def directly_answer(self, q):
        return "london"                      # wrong without evidence

    def directly_cal_score(self, q, a):
        return 0.2

    def gen_background(self, q):
        return "some imagined background"

    def summary(self, q, doc):
        return doc

    def answer_with_evidence(self, q, queries, evidence):
        if any(self.good_evidence in e for e in evidence):
            return "paris"
        return "london"

    def cal_score_with_evidence(self, q, a, queries, evidence):
        return 0.95 if a == "paris" else 0.3

    def expand_question(self, q, queries, evidence):
        return ["capital city of france", "france capital"]


def test_allies_beam_search_finds_answer():
    corpus = {
        "capital city of france": ["paris is the capital of france"],
        "france capital": ["france is in europe"],
    }

    def retrieve(q, k):
        return corpus.get(q, ["nothing relevant"])

    llm = ScriptedLLM()
    cfg = ALLIESConfig(beam_size=2, beam_depth=2, threshold=0.9,
                       summarize=False)
    answer, beam, counters = allies_answer(
        "what is the capital of france?", llm, cfg, retrieve)
    assert answer == "paris"
    assert counters["retrievals"] >= 2
    assert beam[0].score >= 0.9


def test_allies_generate_mode_and_exhaustion():
    llm = ScriptedLLM()
    cfg = ALLIESConfig(beam_size=1, beam_depth=1, threshold=0.99,
                       retrieval_type="generate", summarize=True)
    answer, beam, counters = allies_answer("question?", llm, cfg)
    assert answer == "london"   # never crosses threshold -> best-of-beam
    assert counters["retrievals"] == 0 and counters["api_calls"] > 5


def test_qa_metrics():
    assert exact_match("The Eiffel Tower!", ["eiffel tower"]) == 1.0
    assert exact_match("big ben", ["eiffel tower"]) == 0.0
    assert f1_score("the eiffel tower in paris", ["eiffel tower"]) > 0.5
    assert rouge_l("eiffel tower", ["the eiffel tower"]) == 1.0
