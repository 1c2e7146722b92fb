import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simxns_tpu.models import (
    Condenser, CondenserConfig, BertConfig, cocondenser_span_loss,
    mlm_loss_from_logits)
from simxns_tpu.data import CondenserCollator, TokenMeta, HashTokenizer
from simxns_tpu.data.collator import IGNORE_INDEX
from simxns_tpu.parallel import create_mesh, shard_batch
from simxns_tpu.train import TrainState, make_adamw, make_condenser_step
from simxns_tpu.io import export_encoder_only

CFG = BertConfig.tiny(vocab_size=256, max_position_embeddings=64)


def _meta():
    tok = HashTokenizer(vocab_size=256)
    return TokenMeta.for_hash_tokenizer(tok)


def _examples(rng, n=4, text_len=30):
    out = []
    for _ in range(n):
        out.append({
            "text": rng.integers(5, 250, size=text_len).tolist(),
            "queries": [rng.integers(5, 250, size=6).tolist(),
                        rng.integers(5, 250, size=5).tolist()],
            "next": [rng.integers(5, 250, size=20).tolist()],
        })
    return out


def test_mlm_loss_ignore_index():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.asarray([[1, IGNORE_INDEX, 2], [IGNORE_INDEX] * 3])
    # uniform logits -> loss = log(5) over the 2 valid positions
    np.testing.assert_allclose(float(mlm_loss_from_logits(logits, labels)),
                               np.log(5), rtol=1e-6)
    # all-ignored does not NaN
    all_ignored = jnp.full((2, 3), IGNORE_INDEX)
    assert np.isfinite(float(mlm_loss_from_logits(logits, all_ignored)))


def test_collator_streams():
    rng = np.random.default_rng(0)
    coll = CondenserCollator(_meta(), max_seq_length=32, seed=1)
    batch = coll(_examples(rng))
    keys = {"input_ids", "labels", "decoder_input_ids", "decoder_labels",
            "query_input_ids", "query_labels", "gpt_input_ids", "gpt_labels",
            "next_encoder_input_ids", "next_encoder_labels",
            "next_decoder_input_ids", "next_decoder_labels",
            "overlap_encoder_input_ids", "overlap_encoder_labels",
            "overlap_decoder_input_ids", "overlap_decoder_labels",
            "attention_mask", "query_attention_mask", "gpt_attention_mask",
            "next_encoder_attention_mask", "next_decoder_attention_mask"}
    assert keys <= set(batch.keys())
    for k, v in batch.items():
        assert v.shape == (4, 32), k

    meta = _meta()
    # encoder stream: some positions masked, labels only where masked
    masked = batch["labels"] != IGNORE_INDEX
    assert masked.sum() > 0
    # [CLS] never masked
    assert (batch["labels"][:, 0] == IGNORE_INDEX).all()
    assert (batch["input_ids"][:, 0] == meta.cls_id).all()
    # decoder (keyword) stream masks ~50% of real tokens
    dec_masked = (batch["decoder_labels"] != IGNORE_INDEX).sum(1)
    assert (dec_masked >= 10).all()  # 30 tokens * 0.5 ~ 15
    # overlap masks are complementary over real (non-special) positions
    enc_m = batch["overlap_encoder_labels"] != IGNORE_INDEX
    dec_m = batch["overlap_decoder_labels"] != IGNORE_INDEX
    real = (batch["attention_mask"] == 1)
    real[:, 0] = False
    both = enc_m & dec_m
    assert both.sum() == 0  # never mask the same word in both streams


def test_collator_corruption_stats():
    """80/10/10 corruption: most masked positions become [MASK]."""
    rng = np.random.default_rng(2)
    meta = _meta()
    coll = CondenserCollator(meta, max_seq_length=64, seed=3,
                             mlm_probability=0.5)
    batch = coll(_examples(rng, n=32, text_len=60))
    masked = batch["labels"] != IGNORE_INDEX
    frac_mask_tok = (batch["input_ids"][masked] == meta.mask_id).mean()
    assert 0.7 < frac_mask_tok < 0.9


def test_condenser_forward_and_step():
    mesh = create_mesh()
    rng = np.random.default_rng(4)
    coll = CondenserCollator(_meta(), max_seq_length=32, seed=5)
    batch = coll(_examples(rng, n=8))
    model = Condenser(CondenserConfig(bert=CFG, n_head_layers=1))
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:2] for k, v in batch.items()})
    total, parts = model.apply(params, batch)
    assert np.isfinite(float(total))
    assert set(parts) == {"mlm", "c_head", "query", "gpt", "next_encoder",
                          "next", "overlap_encoder", "overlap"}
    # total = sum of the 8 parts (modeling.py:158)
    np.testing.assert_allclose(float(total),
                               sum(float(v) for v in parts.values()),
                               rtol=1e-5)

    tx = make_adamw(5e-4, total_steps=0)
    state = TrainState.create(params, tx)
    step = make_condenser_step(model, tx, mesh)
    dev = shard_batch(batch, mesh)
    losses = []
    for _ in range(6):
        state, metrics = step(state, dev)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_condenser_export_drops_heads():
    rng = np.random.default_rng(5)
    coll = CondenserCollator(_meta(), max_seq_length=32, seed=6)
    batch = coll(_examples(rng, n=2))
    model = Condenser(CondenserConfig(bert=CFG, n_head_layers=1))
    params = model.init(jax.random.PRNGKey(0), batch)
    exported = export_encoder_only(params["params"])
    assert "encoder" in exported and "mlm" in exported
    assert not any(k.startswith("c_head") for k in exported)
    assert not any(k.startswith("overlap_head") for k in exported)


def test_cocondenser_span_loss():
    rng = np.random.default_rng(6)
    h = rng.normal(size=(8, 16)).astype(np.float32)
    # make partners identical -> near-zero loss vs random
    paired = h.copy()
    paired[1::2] = paired[0::2]
    l_paired = float(cocondenser_span_loss(jnp.asarray(10 * paired)))
    l_random = float(cocondenser_span_loss(jnp.asarray(h)))
    assert l_paired < l_random
    # self-similarity is masked: loss isn't trivially zero from diagonal
    assert l_random > 0.5


def test_electra_variant_and_replaced_ids():
    from simxns_tpu.models.condenser import generate_replaced_ids, in_batch_nearest
    rng = np.random.default_rng(7)
    coll = CondenserCollator(_meta(), max_seq_length=32, seed=8)
    batch = coll(_examples(rng, n=4))
    model = Condenser(CondenserConfig(bert=CFG, n_head_layers=1))
    params = model.init(jax.random.PRNGKey(0), {k: v[:2] for k, v in batch.items()})
    total, parts = model.apply(params, batch, method="electra_forward")
    assert set(parts) == {"mlm", "c_head", "next", "overlap"}
    assert np.isfinite(float(total))

    # in-batch nearest never picks self
    cls = jnp.asarray(np.random.default_rng(8).normal(size=(6, 8)), jnp.float32)
    nearest = in_batch_nearest(cls)
    assert not any(np.allclose(np.asarray(nearest[i]), np.asarray(cls[i]))
                   for i in range(6))

    mask_id = _meta().mask_id
    rd, ri = generate_replaced_ids(model, params, batch, mask_id)
    dec = batch["decoder_input_ids"]
    masked = dec == mask_id
    # nearly all [MASK] positions replaced (argmax may rarely emit mask_id)
    assert (np.asarray(rd)[masked] == mask_id).mean() < 0.05
    # non-mask positions untouched
    keep = ~masked
    np.testing.assert_array_equal(np.asarray(rd)[keep], dec[keep])


def test_electra_step_trains():
    from simxns_tpu.train import make_electra_step
    mesh = create_mesh()
    rng = np.random.default_rng(9)
    meta = _meta()
    coll = CondenserCollator(meta, max_seq_length=32, seed=10)
    model = Condenser(CondenserConfig(bert=CFG, n_head_layers=1))
    batch0 = coll(_examples(rng, n=8))
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:2] for k, v in batch0.items()})
    tx = make_adamw(5e-4, total_steps=0)
    state = TrainState.create(params, tx)
    step = make_electra_step(model, tx, mesh, mask_id=meta.mask_id)
    # fixed batch: random-token content is only learnable by memorization,
    # which is exactly what should drive the loss down here
    dev = shard_batch(batch0, mesh)
    losses = []
    for i in range(6):
        state, metrics = step(state, dev)
        losses.append(float(metrics["loss"]))
    assert set(metrics) >= {"loss", "mlm", "c_head", "next", "overlap"}
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
