"""Seq2seq (docT5query generation) — the CAPSTONE generate phase
(``CAPSTONE/models/generate_query.py:115-235``) rebuilt natively."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from simxns_tpu.models.bert import BertConfig
from simxns_tpu.models.seq2seq import (
    Seq2Seq, Seq2SeqConfig, generate, queries_to_tsv, seq2seq_lm_loss)

CFG = Seq2SeqConfig(
    bert=BertConfig.tiny(vocab_size=64, max_position_embeddings=32),
    max_target_length=8, bos_id=1, eos_id=2, pad_id=0)


def _model_and_params(seed=0):
    model = Seq2Seq(CFG)
    enc = np.ones((2, 6), np.int32) * 5
    dec = np.ones((2, 4), np.int32)
    params = model.init(jax.random.PRNGKey(seed), enc, np.ones_like(enc),
                        dec, np.ones_like(dec))
    return model, params


def test_forward_shapes_and_causality():
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    enc = rng.integers(3, 64, size=(3, 6)).astype(np.int32)
    dec = rng.integers(3, 64, size=(3, 5)).astype(np.int32)
    logits = model.apply(params, enc, np.ones_like(enc), dec,
                         np.ones_like(dec))
    assert logits.shape == (3, 5, 64)
    assert logits.dtype == jnp.float32
    # causality: changing dec tokens AFTER position t leaves logits[:, :t+1]
    dec2 = dec.copy()
    dec2[:, 3:] = (dec2[:, 3:] + 7) % 60 + 3
    logits2 = model.apply(params, enc, np.ones_like(enc), dec2,
                          np.ones_like(dec2))
    np.testing.assert_allclose(np.asarray(logits[:, :3]),
                               np.asarray(logits2[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, 4]), np.asarray(logits2[:, 4]))


def test_lm_loss_ignores_pad():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.asarray([[1, 2, 0], [3, 0, 0]])
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    np.testing.assert_allclose(
        float(seq2seq_lm_loss(logits, labels, mask)), np.log(5), rtol=1e-6)


@pytest.mark.slow
def test_train_then_greedy_generate_recovers_mapping(tmp_path):
    """Overfit passage->query pairs, then top_k=1 generation reproduces the
    trained queries — the full docT5query capability on synthetic vocab."""
    model, params = _model_and_params()
    rng = np.random.default_rng(1)

    # 8 passages; query for passage p is [BOS, p+10, p+20, EOS]
    n, le, lt = 8, 6, 5
    enc = np.zeros((n, le), np.int32)
    for i in range(n):
        enc[i] = [i + 3] * le
    enc_mask = np.ones_like(enc)
    dec_in = np.zeros((n, lt), np.int32)
    labels = np.zeros((n, lt), np.int32)
    for i in range(n):
        seq = [1, i + 10, i + 20, 2]            # BOS a b EOS
        dec_in[i, :4] = seq
        labels[i, :3] = seq[1:]                  # shifted
    lab_mask = (labels != 0).astype(np.int32)
    dec_mask = (dec_in != 0).astype(np.int32)

    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, enc, enc_mask, dec_in, dec_mask)
            return seq2seq_lm_loss(logits, labels, lab_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(300):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < 0.05 < losses[0]

    out = generate(model, params, enc, enc_mask, jax.random.PRNGKey(0),
                   top_k=1, num_return_sequences=1)
    out = np.asarray(out)[:, 0]
    assert out.shape == (n, CFG.max_target_length)
    for i in range(n):
        assert out[i, 0] == 1                     # BOS
        assert list(out[i, 1:4]) == [i + 10, i + 20, 2]
        assert (out[i, 4:] == 0).all()            # pad after EOS

    # sampled generation: multiple return sequences, valid token range
    sampled = np.asarray(generate(model, params, enc, enc_mask,
                                  jax.random.PRNGKey(3), top_k=10,
                                  num_return_sequences=4))
    assert sampled.shape == (n, 4, CFG.max_target_length)
    assert sampled.min() >= 0 and sampled.max() < 64


def test_query_tsv_roundtrip(tmp_path):
    from simxns_tpu.data.curriculum import QueryExpander

    path = str(tmp_path / "query.tsv")
    queries_to_tsv(path, [0, 1], [["what is a", "b?"], ["c d", "e  f"]])
    exp = QueryExpander.from_tsv(path)
    assert exp.queries[0] == ["what is a", "b?"]
    assert exp.queries[1] == ["c d", "e f"]      # whitespace normalized
