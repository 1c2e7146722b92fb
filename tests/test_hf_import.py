"""Numerical parity of the HF importer: our BertEncoder must reproduce a
randomly-initialized torch BertModel's hidden states on the same inputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from simxns_tpu.models.bert import BertConfig, BertEncoder, MLMHead
from simxns_tpu.models.hf_import import convert_hf_bert, as_biencoder_params
from simxns_tpu.models.dual_encoder import BiEncoder, BiEncoderConfig


def _hf_model(num_layers=2, mlm=False):
    cfg = transformers.BertConfig(
        vocab_size=500, hidden_size=64, num_hidden_layers=num_layers,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    cls = (transformers.BertForMaskedLM if mlm else transformers.BertModel)
    return cls(cfg).eval(), cfg


def _our_cfg(hf_cfg, num_layers=None):
    return BertConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=num_layers or hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
        attention_impl="xla")


def test_encoder_matches_torch():
    hf, hf_cfg = _hf_model()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 500, size=(3, 16)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, 12:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()

    params, mlm = convert_hf_bert(hf.state_dict())
    assert mlm is None
    enc = BertEncoder(_our_cfg(hf_cfg))
    got = enc.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                    jnp.asarray(mask, jnp.int32)).last_hidden_state
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def test_truncated_import():
    hf, hf_cfg = _hf_model(num_layers=4)
    params, _ = convert_hf_bert(hf.state_dict(), num_layers=2)
    assert "layer_1" in params and "layer_2" not in params
    enc = BertEncoder(_our_cfg(hf_cfg, num_layers=2))
    ids = np.ones((1, 8), np.int32)
    out = enc.apply({"params": params}, ids, np.ones_like(ids))
    assert out.pooled.shape == (1, 64)


def test_mlm_head_import_matches_torch():
    hf, hf_cfg = _hf_model(mlm=True)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 500, size=(2, 12)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).logits.numpy()

    enc_params, mlm_params = convert_hf_bert(hf.state_dict())
    assert mlm_params is not None
    cfg = _our_cfg(hf_cfg)
    enc = BertEncoder(cfg)
    hidden = enc.apply({"params": enc_params}, jnp.asarray(ids, jnp.int32),
                       jnp.asarray(mask, jnp.int32)).last_hidden_state
    emb_table = jnp.asarray(
        enc_params["embeddings"]["word_embeddings"]["embedding"])
    logits = MLMHead(cfg).apply({"params": mlm_params}, hidden, emb_table)
    np.testing.assert_allclose(np.asarray(logits), want, atol=5e-4, rtol=5e-3)


def test_biencoder_wrapping():
    hf, hf_cfg = _hf_model()
    params, _ = convert_hf_bert(hf.state_dict())
    tree = as_biencoder_params(params, share_weight=False)
    model = BiEncoder(BiEncoderConfig(bert=_our_cfg(hf_cfg)))
    ids = np.ones((2, 8), np.int32)
    q, c = model.apply(tree, ids, np.ones_like(ids), ids, np.ones_like(ids))
    np.testing.assert_allclose(np.asarray(q), np.asarray(c), atol=1e-6)


def test_roberta_matches_torch():
    """RobertaDot warm start (SimANS/model/models.py:340-359): converted
    encoder + position_style='roberta' reproduce torch RobertaModel."""
    cfg = transformers.RobertaConfig(
        vocab_size=500, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 500, size=(3, 16)).astype(np.int64)
    ids[:, 13:] = 1                       # RoBERTa pad id
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()

    from simxns_tpu.models.hf_import import convert_hf_roberta

    params, mlm = convert_hf_roberta(hf.state_dict())
    assert mlm is None
    our = BertConfig(
        vocab_size=500, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=66,
        type_vocab_size=1, position_style="roberta", pad_token_id=1,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
        attention_impl="xla")
    got = BertEncoder(our).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32)).last_hidden_state
    # compare only non-pad positions (HF computes pad rows too, but they
    # are masked out of attention and never consumed downstream)
    np.testing.assert_allclose(np.asarray(got)[:, :13], want[:, :13],
                               atol=2e-4, rtol=2e-3)


def test_robertadot_projection_head():
    from simxns_tpu.models.hf_import import robertadot_projection

    h = 8
    sd = {"embeddingHead.weight": torch.randn(h, h),
          "embeddingHead.bias": torch.randn(h),
          "norm.weight": torch.ones(h), "norm.bias": torch.zeros(h)}
    proj = robertadot_projection(sd)
    assert proj["project"]["kernel"].shape == (h, h)
    assert proj["project_layer_norm"]["scale"].shape == (h,)
    assert robertadot_projection({}) is None


def test_electra_matches_torch():
    """MASTER CE warm start (MASTER/finetune/model/models_ele.py): the
    converted discriminator encoder (with the small-variant
    embeddings_project) reproduces torch ElectraModel."""
    cfg = transformers.ElectraConfig(
        vocab_size=500, embedding_size=32, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.ElectraModel(cfg).eval()
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 500, size=(2, 12)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, 10:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()

    from simxns_tpu.models.hf_import import convert_hf_electra

    params, _ = convert_hf_electra(hf.state_dict())
    assert "embeddings_project" in params["embeddings"]
    our = BertConfig(
        vocab_size=500, hidden_size=64, embedding_size=32, num_layers=2,
        num_heads=4, intermediate_size=128, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
        attention_impl="xla")
    got = BertEncoder(our).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32)).last_hidden_state
    np.testing.assert_allclose(np.asarray(got)[:, :10], want[:, :10],
                               atol=2e-4, rtol=2e-3)


def test_distilbert_matches_torch():
    """LEAD student warm start (LEAD/modeling_distilbert.py): converted
    q/k/v/out_lin + sa_layer_norm/ffn naming reproduces torch
    DistilBertModel (no token types)."""
    cfg = transformers.DistilBertConfig(
        vocab_size=500, dim=64, n_layers=2, n_heads=4, hidden_dim=128,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = transformers.DistilBertModel(cfg).eval()
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 500, size=(3, 16)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, 14:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()

    from simxns_tpu.models.hf_import import convert_hf_distilbert

    params, _ = convert_hf_distilbert(hf.state_dict())
    assert "token_type_embeddings" not in params["embeddings"]
    our = BertConfig(
        vocab_size=500, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=64,
        type_vocab_size=0, hidden_dropout=0.0, attention_dropout=0.0,
        dtype=jnp.float32, attention_impl="xla")
    got = BertEncoder(our).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32)).last_hidden_state
    np.testing.assert_allclose(np.asarray(got)[:, :14], want[:, :14],
                               atol=2e-4, rtol=2e-3)


def test_family_sniffing():
    from simxns_tpu.models.hf_import import sniff_hf_family

    assert sniff_hf_family(
        {"roberta.embeddings.word_embeddings.weight": 0}) == "roberta"
    assert sniff_hf_family(
        {"electra.embeddings.word_embeddings.weight": 0}) == "electra"
    assert sniff_hf_family(
        {"distilbert.embeddings.word_embeddings.weight": 0}) == "distilbert"
    assert sniff_hf_family(
        {"transformer.layer.0.attention.q_lin.weight": 0}) == "distilbert"
    assert sniff_hf_family(
        {"embeddings.word_embeddings.weight": 0,
         "lm_head.layer_norm.weight": 0}) == "roberta"
    assert sniff_hf_family(
        {"bert.embeddings.word_embeddings.weight": 0}) == "bert"


def test_truncated_distilbert_and_electra():
    """num_layers truncation (the PROD student-init contract) works on
    every family converter."""
    cfg = transformers.DistilBertConfig(
        vocab_size=128, dim=32, n_layers=4, n_heads=2, hidden_dim=64,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0)
    hf = transformers.DistilBertModel(cfg)
    from simxns_tpu.models.hf_import import (
        convert_hf_distilbert, convert_hf_electra)

    params, _ = convert_hf_distilbert(hf.state_dict(), num_layers=2)
    assert "layer_1" in params and "layer_2" not in params

    ecfg = transformers.ElectraConfig(
        vocab_size=128, embedding_size=32, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64)
    ehf = transformers.ElectraModel(ecfg)
    eparams, _ = convert_hf_electra(ehf.state_dict(), num_layers=2)
    assert "layer_1" in eparams and "layer_2" not in eparams


def test_gamma_beta_and_prefixed_mlm_import():
    """Original-format checkpoints name LayerNorm params gamma/beta, and a
    BertForMaskedLM import with an explicit prefix='bert.' must still
    recover the cls.predictions.* head (it lives outside the prefix)."""
    hf, hf_cfg = _hf_model()
    sd = hf.state_dict()
    old = {}
    for k, v in sd.items():
        k2 = k.replace("LayerNorm.weight", "LayerNorm.gamma").replace(
            "LayerNorm.bias", "LayerNorm.beta")
        old["bert." + k2] = v
    # synthesize an MLM head outside the bert. prefix
    h, v = hf_cfg.hidden_size, hf_cfg.vocab_size
    old["cls.predictions.transform.dense.weight"] = torch.zeros(h, h)
    old["cls.predictions.transform.dense.bias"] = torch.zeros(h)
    old["cls.predictions.transform.LayerNorm.gamma"] = torch.ones(h)
    old["cls.predictions.transform.LayerNorm.beta"] = torch.zeros(h)
    old["cls.predictions.bias"] = torch.zeros(v)
    params, mlm = convert_hf_bert(old, prefix="bert.")
    assert mlm is not None and mlm["bias"].shape == (v,)
    ref_params, _ = convert_hf_bert(hf.state_dict())
    leaf = params["embeddings"]["layer_norm"]["scale"]
    np.testing.assert_array_equal(
        leaf, ref_params["embeddings"]["layer_norm"]["scale"])
