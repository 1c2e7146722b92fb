"""Data contract of the vectorized signature-scheme synthetic corpus
(run.py ``_synthesize_vectorized``): the >20k-passage path the continuous
TPU iteration runs at reference scale (8.8M rows) — token layout, gold
bookkeeping, and the lazy text view that feeds ``has_answer`` labeling."""

import numpy as np

from simxns_tpu.config import DataConfig
from simxns_tpu.run import _FactPassages, _synthesize_vectorized


class _Args:
    corpus_size = 25_000
    num_queries = 300
    seed = 7


def _corpus():
    return _synthesize_vectorized(_Args(), DataConfig())


def test_token_layout_and_shapes():
    data = _corpus()
    dc = DataConfig()
    n, lc = data.corpus_ids.shape
    q, lq = data.query_ids.shape
    assert (n, q) == (25_000, 300)
    assert lc == dc.max_ctx_length and lq == dc.max_q_length
    # CLS / SEP framing, fully dense rows (mask == all ones)
    assert (data.corpus_ids[:, 0] == 1).all()
    assert (data.corpus_ids[:, lc - 1] == 3).all()
    assert (data.query_ids[:, 0] == 1).all()
    assert (data.query_ids[:, lq - 1] == 3).all()
    assert data.corpus_mask.all() and data.query_mask.all()
    assert data.corpus_ids.max() < data.vocab_size


def test_signatures_unique_and_query_matches_gold():
    data = _corpus()
    sigs = data.corpus_ids[:, 1:5]
    # the 4-digit base-64 signature is unique per passage
    flat = (sigs - 5).astype(np.int64)
    digits = flat - np.arange(4) * 64
    key = sum(digits[:, d] * 64**d for d in range(4))
    assert np.array_equal(np.sort(key), np.arange(25_000))
    # each query carries EXACTLY its gold passage's signature and shares
    # its background slice (the soak-validated learnability scheme)
    golds = [rows[0] for rows in data.positive_rows]
    assert len(set(golds)) == len(golds)
    q_sig = data.query_ids[:, 1:5]
    assert np.array_equal(q_sig, sigs[golds])
    take = min(DataConfig().max_q_length - 6, DataConfig().max_ctx_length - 5)
    assert np.array_equal(data.query_ids[:, 5:5 + take],
                          data.corpus_ids[golds, 5:5 + take])


def test_text_view_labels_through_has_answer():
    from simxns_tpu.evals.qa_match import has_answer

    data = _corpus()
    golds = [rows[0] for rows in data.positive_rows]
    for qi in (0, 150, 299):
        g = golds[qi]
        text, title = data.passages[g]
        assert has_answer(data.answers[qi], text)
        # a wrong row must NOT label as a hit
        wrong = (g + 1) % 25_000
        assert not has_answer(data.answers[qi], data.passages[wrong][0])


def test_fact_passages_mapping_protocol():
    fp = _FactPassages(10)
    assert len(fp) == 10
    assert 3 in fp and 10 not in fp and -1 not in fp
    assert fp.get(11) == ("", "")
    text, title = fp[4]
    assert "fact4" in text and title == "title4"
    try:
        fp[10]
        assert False, "expected KeyError"
    except KeyError:
        pass
