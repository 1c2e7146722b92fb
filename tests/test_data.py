import json

import numpy as np
import pytest

from simxns_tpu.data import (
    simans_weights, sample_hard_negatives, select_negatives,
    HashTokenizer, RetrievalCollator, RetrievalDataset,
    load_wiki_json, load_marco_tsv, load_qa_csv, load_passages_tsv)
from simxns_tpu.data.datasets import Passage, RetrievalExample, load_id_text


def test_simans_weight_formulas():
    negs = np.array([1.0, 5.0, 9.0])
    w_quad = simans_weights(negs, pos_score=5.0, mode="quadratic", a=0.5, b=0.0)
    np.testing.assert_allclose(
        w_quad, np.exp(-0.5 * (negs - 5.0) ** 2))
    assert w_quad[1] == 1.0 and w_quad[0] == w_quad[2] < 1.0
    w_abs = simans_weights(negs, pos_score=5.0, mode="abs", tau=3.0)
    np.testing.assert_allclose(w_abs, np.exp(-np.abs(negs - 5.0) * 3.0))


def test_sampler_prefers_ambiguous_negatives():
    """Statistical check: negatives scored near the positive are drawn far
    more often than easy/far negatives (the point of SimANS)."""
    rng = np.random.default_rng(0)
    ids = list(range(10))
    scores = [float(i) for i in range(10)]  # pos_score=5 -> id 5 is nearest
    counts = np.zeros(10)
    for _ in range(400):
        picked = sample_hard_negatives(ids, scores, pos_score=5.0, k=2, rng=rng,
                                       mode="quadratic", a=0.5)
        for p in picked:
            counts[p] += 1
    assert counts[5] > counts[0] * 3
    assert counts[5] > counts[9] * 3


def test_sampler_edge_cases():
    rng = np.random.default_rng(1)
    # fewer candidates than k: cycle, take last k
    assert sample_hard_negatives([7, 8], [1.0, 2.0], 3.0, 5, rng) == [8, 7, 8, 7, 8]
    # pos_score == 0: last k
    assert sample_hard_negatives(list(range(6)), [0.1] * 6, 0.0, 3, rng) == [3, 4, 5]
    # empty
    assert sample_hard_negatives([], [], 1.0, 3, rng) == []
    # k unique always returned
    out = sample_hard_negatives(list(range(20)), [5.0] * 20, 5.0, 8, rng)
    assert len(out) == len(set(out)) == 8


def test_select_negatives_modes():
    rng = np.random.default_rng(2)
    ids = [10, 11, 12, 13]
    scores = [0.1, 0.9, 0.5, 0.7]
    assert select_negatives(ids, scores, 2, rng, "descend") == [11, 13]
    got = select_negatives(ids, scores, 2, rng, "random")
    assert len(set(got)) == 2 and set(got) <= set(ids)


def test_hash_tokenizer_roundtrip():
    tok = HashTokenizer(vocab_size=1000)
    ids = tok.encode("Hello world", text_pair="a passage here", max_length=8)
    assert ids[0] == tok.cls_token_id and ids[-1] == tok.sep_token_id
    assert len(ids) <= 8
    assert tok.encode("same text") == tok.encode("same text")
    assert tok.encode("same text") != tok.encode("other text")


def _example(i, n_negs=8):
    return RetrievalExample(
        q_id=str(i), question=f"who wrote book {i}?", answers=[f"author{i}"],
        positives=[Passage(100 + i, 8.0, f"title{i}", f"text about author{i}")],
        negatives=[Passage(200 + j, 7.0 - 0.1 * j, f"nt{j}", f"neg text {j}")
                   for j in range(n_negs)],
    )


def test_collator_shapes_and_positive_layout():
    tok = HashTokenizer(vocab_size=1000)
    coll = RetrievalCollator(tokenizer=tok, num_negatives=3, max_q_length=16,
                             max_ctx_length=32, max_joint_length=48)
    rng = np.random.default_rng(0)
    batch = coll([_example(i) for i in range(4)], rng)
    m = 4  # 1 + 3 negs
    assert batch["q_ids"].shape == (4, 16)
    assert batch["ctx_ids"].shape == (16, 32)
    assert batch["joint_ids"].shape == (4, m, 48)
    np.testing.assert_array_equal(batch["positive_idx"], [0, 4, 8, 12])
    # positive ctx = first in each group; its tokens come from the positive text
    pos_row = batch["ctx_ids"][0]
    want = tok.encode("title0", text_pair="text about author0", max_length=32)
    np.testing.assert_array_equal(pos_row[: len(want)], want)
    # joint input starts with the query tokens
    q_row = batch["q_ids"][0]
    q_len = int(batch["q_mask"][0].sum())
    np.testing.assert_array_equal(batch["joint_ids"][0, 0, :q_len], q_row[:q_len])


def test_dataset_epoch_iteration():
    tok = HashTokenizer(vocab_size=1000)
    coll = RetrievalCollator(tokenizer=tok, num_negatives=2, max_q_length=8,
                             max_ctx_length=16, max_joint_length=24)
    ds = RetrievalDataset([_example(i) for i in range(10)], coll, seed=0)
    batches = list(ds.batches(batch_size=4))
    assert len(batches) == 2  # drop_last
    assert batches[0]["q_ids"].shape == (4, 8)


def test_wiki_json_loader(tmp_path):
    data = [
        {"q_id": "1", "question": "q?", "answers": ["a"],
         "positive_ctxs": [{"title": "t", "text": "x", "passage_id": "5",
                            "score": "3.5"}],
         "hard_negative_ctxs": [{"title": "n", "text": "y", "passage_id": "6",
                                 "score": "2.0"}],
         "negative_ctxs": []},
        {"q_id": "2", "question": "dropped", "answers": [],
         "positive_ctxs": [], "hard_negative_ctxs": []},
    ]
    p = tmp_path / "train.json"
    p.write_text(json.dumps(data))
    exs = load_wiki_json(str(p))
    assert len(exs) == 1  # filtering matches reference
    assert exs[0].positives[0].passage_id == 5
    assert exs[0].positives[0].score == 3.5


def test_marco_tsv_loader(tmp_path):
    corpus = {1: "text one", 2: "text two", 3: "text three"}
    titles = {1: "T1"}
    p = tmp_path / "train.tsv"
    p.write_text("q1\thello query\t1 9.0\t2 5.5,3 4.0\n")
    exs = load_marco_tsv(str(p), corpus, titles)
    assert len(exs) == 1
    ex = exs[0]
    assert ex.positives[0].passage_id == 1 and ex.positives[0].score == 9.0
    assert [n.passage_id for n in ex.negatives] == [2, 3]
    assert ex.negatives[0].title == "-"  # missing title default


def test_corpus_and_qa_loaders(tmp_path):
    p = tmp_path / "psgs.tsv"
    p.write_text("id\ttext\ttitle\n1\thello world\tGreeting\n2\tbye\tFarewell\n")
    rows = load_passages_tsv(str(p))
    assert rows[0] == (0, "hello world", "Greeting")  # id-1 convention

    q = tmp_path / "dev.qa.csv"
    q.write_text("who?\t\"['Alice', 'Bob']\"\n")
    qa = load_qa_csv(str(q))
    assert qa == [("who?", ["Alice", "Bob"])]

    t = tmp_path / "para.txt"
    t.write_text("7\tsome passage\n")
    assert load_id_text(str(t)) == {7: "some passage"}


def test_mined_dataset_fast_path():
    """Mine->train feedback without text round-trips: batches assembled by
    corpus-row lookup, SimANS sampling on mined scores, joint splicing."""
    from simxns_tpu.data import MinedDataset
    rng = np.random.default_rng(20)
    n_corpus, lc, q, k = 40, 12, 8, 10
    tok = HashTokenizer(vocab_size=512)
    corpus_ids = np.zeros((n_corpus, lc), np.int32)
    for i in range(n_corpus):
        enc = tok.encode(f"passage {i} text", max_length=lc)
        corpus_ids[i, :len(enc)] = enc
    query_ids = np.zeros((q, 10), np.int32)
    for i in range(q):
        enc = tok.encode(f"query {i}", max_length=10)
        query_ids[i, :len(enc)] = enc
    topk_ids = np.stack([rng.permutation(n_corpus)[:k] for _ in range(q)])
    topk_scores = np.sort(rng.normal(size=(q, k)).astype(np.float32))[:, ::-1]
    hit_mask = np.zeros((q, k), bool)
    hit_mask[:, 1] = True       # second-ranked is the answer-bearing one
    hit_mask[0, :] = False      # query 0 has no positive -> filtered

    ds = MinedDataset(corpus_ids=corpus_ids, query_ids=query_ids,
                      topk_ids=topk_ids, topk_scores=topk_scores,
                      hit_mask=hit_mask, num_negatives=3,
                      max_joint_length=20, sep_id=tok.sep_token_id)
    assert len(ds) == q - 1
    batch = next(ds.batches(batch_size=4, shuffle=False))
    m = 4
    assert batch["ctx_ids"].shape == (4 * m, lc)
    assert batch["joint_ids"].shape == (4, m, 20)
    # positive row is the corpus row of the first hit
    qi = ds.valid[0]
    pos_pid = topk_ids[qi][hit_mask[qi]][0]
    np.testing.assert_array_equal(batch["ctx_ids"][0], corpus_ids[pos_pid])
    # negatives come from non-hit mined ids
    negs = set(topk_ids[qi][~hit_mask[qi]].tolist())
    for j in range(1, m):
        row = batch["ctx_ids"][j]
        matches = [pid for pid in negs
                   if np.array_equal(row, corpus_ids[pid])]
        assert matches, "negative row not from mined non-hits"
    # joint = query tokens then ctx tokens minus CLS
    q_len = int(batch["q_mask"][0].sum())
    np.testing.assert_array_equal(batch["joint_ids"][0, 0, :q_len],
                                  batch["q_ids"][0, :q_len])
    assert batch["joint_ids"][0, 0, q_len] == corpus_ids[pos_pid][1]


def test_pack_joint_strips_ctx_specials():
    """The reference's remove_special_token (util_wiki.py:648-658) strips
    the ctx's leading CLS AND trailing SEP — the joint ends on the last
    content token, and truncation does not re-add a SEP."""
    from simxns_tpu.data.tokenization import pack_joint

    q = [101, 5, 6, 102]                  # [CLS q q SEP]
    ctx = [101, 7, 8, 9, 102]             # [CLS d d d SEP]
    assert pack_joint(q, ctx, sep_token_id=102, max_length=16) == \
        [101, 5, 6, 102, 7, 8, 9]
    # truncation: plain cut, no SEP appended
    assert pack_joint(q, ctx, sep_token_id=102, max_length=6) == \
        [101, 5, 6, 102, 7, 8]
    # ctx without trailing SEP (already truncated upstream): only CLS drops
    assert pack_joint(q, [101, 7, 8], 102, 16) == [101, 5, 6, 102, 7, 8]
