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
