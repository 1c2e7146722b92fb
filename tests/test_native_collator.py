import time

import numpy as np
import pytest

from simxns_tpu.data import CondenserCollator, TokenMeta, HashTokenizer
from simxns_tpu.data import native
from simxns_tpu.data.collator import IGNORE_INDEX


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable")


def _meta(freq=None):
    tok = HashTokenizer(vocab_size=512)
    return TokenMeta.for_hash_tokenizer(tok, frequency=freq)


def _examples(rng, n, text_len=60):
    return [{"text": rng.integers(5, 500, size=text_len).tolist(),
             "queries": [rng.integers(5, 500, size=8).tolist()],
             "next": [rng.integers(5, 500, size=20).tolist()]}
            for _ in range(n)]


def test_native_whole_word_mask_counts():
    meta = _meta()
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(5, 500, size=100), np.int32)
    special = np.zeros(100, np.uint8)
    contin = np.zeros(100, np.uint8)
    mask = native.whole_word_mask(ids, special, contin, 0.3, seed=7)
    assert mask.sum() == 30
    # different seed -> different mask, same count
    mask2 = native.whole_word_mask(ids, special, contin, 0.3, seed=8)
    assert mask2.sum() == 30 and not np.array_equal(mask, mask2)
    # specials never masked
    special[:10] = 1
    mask3 = native.whole_word_mask(ids, special, contin, 0.3, seed=7)
    assert mask3[:10].sum() == 0


def test_native_keyword_mask_prefers_rare():
    meta = _meta()
    ids = np.asarray(list(range(5, 55)), np.int32)  # 50 distinct tokens
    special = np.zeros(50, np.uint8)
    contin = np.zeros(50, np.uint8)
    weights = np.ones(50)
    weights[:25] = 0.01     # first half "common" -> low weight
    counts = np.zeros(50)
    for s in range(200):
        m = native.keyword_mask(ids, special, contin, weights, 0.3, seed=s)
        counts += m
    assert counts[25:].sum() > counts[:25].sum() * 3


def test_native_mask_tokens_distribution():
    rng = np.random.default_rng(1)
    inputs = rng.integers(5, 500, size=(64, 128)).astype(np.int32)
    mask = (rng.random((64, 128)) < 0.5).astype(np.int8)
    out, labels = native.mask_tokens(inputs, mask, mask_id=511,
                                     vocab_size=512, seed=3)
    masked = mask == 1
    assert (labels[~masked] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(labels[masked], inputs[masked])
    frac = (out[masked] == 511).mean()
    assert 0.75 < frac < 0.85
    # unmasked positions untouched
    np.testing.assert_array_equal(out[~masked], inputs[~masked])


def test_native_collator_output_matches_numpy_statistics():
    rng = np.random.default_rng(2)
    exs = _examples(rng, 16)
    fast = CondenserCollator(_meta(), max_seq_length=64, seed=3,
                             use_native=True)
    slow = CondenserCollator(_meta(), max_seq_length=64, seed=3,
                             use_native=False)
    assert fast._native is not None
    b_fast, b_slow = fast(exs), slow(exs)
    assert set(b_fast) == set(b_slow)
    for k in b_fast:
        assert b_fast[k].shape == b_slow[k].shape, k
    # same mask budget per stream (counts are deterministic given lengths;
    # query/gpt/overlap run at p=0.5 and pin the round-half-to-even parity
    # — (int)(x+0.5) in the C++ core once masked one extra token there)
    for k in ("labels", "decoder_labels", "next_encoder_labels",
              "next_decoder_labels", "query_labels", "gpt_labels",
              "overlap_encoder_labels", "overlap_decoder_labels"):
        np.testing.assert_array_equal(
            (b_fast[k] != IGNORE_INDEX).sum(1),
            (b_slow[k] != IGNORE_INDEX).sum(1)), k
    # attention masks identical (not RNG-dependent)
    np.testing.assert_array_equal(b_fast["attention_mask"],
                                  b_slow["attention_mask"])


def test_native_word_groups_join_across_specials():
    """The numpy/reference grouping (data.py:71-102) appends a continuation
    to the previous word even across a skipped special; the native core
    must treat such a word as one all-or-none group."""
    ids = np.asarray([10, 11, 3, 12, 20, 30], np.int32)
    special = np.asarray([0, 0, 1, 0, 0, 0], np.uint8)
    contin = np.asarray([0, 1, 0, 1, 0, 0], np.uint8)
    for seed in range(20):
        m = native.whole_word_mask(ids, special, contin, 0.5, seed=seed)
        assert m[2] == 0                       # specials never masked
        assert m[0] == m[1] == m[3], m         # one word, all-or-none


def test_native_collator_speedup():
    rng = np.random.default_rng(3)
    exs = _examples(rng, 64, text_len=120)
    fast = CondenserCollator(_meta(), max_seq_length=128, seed=4,
                             use_native=True)
    slow = CondenserCollator(_meta(), max_seq_length=128, seed=4,
                             use_native=False)
    fast(exs[:4]); slow(exs[:4])  # warm
    t0 = time.perf_counter(); fast(exs); t_fast = time.perf_counter() - t0
    t0 = time.perf_counter(); slow(exs); t_slow = time.perf_counter() - t0
    # the C++ core should clearly beat the python/numpy loops
    assert t_fast < t_slow, (t_fast, t_slow)
