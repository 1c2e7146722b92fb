import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simxns_tpu.models.bert import BertConfig, BertEncoder, truncate_layers
from simxns_tpu.models.dual_encoder import BiEncoder, BiEncoderConfig
from simxns_tpu.models.cross_encoder import CrossEncoder, CrossEncoderConfig
from simxns_tpu.models.colbert import (
    ColBERT, ColBERTConfig, maxsim_score, maxsim_score_paired)

CFG = BertConfig.tiny()


def _batch(key, b=4, s=16, vocab=CFG.vocab_size):
    kids, _ = jax.random.split(key)
    ids = jax.random.randint(kids, (b, s), 0, vocab)
    mask = jnp.ones((b, s), dtype=jnp.int32).at[:, s // 2:].set(0)
    return ids, mask


def test_bert_encoder_shapes():
    enc = BertEncoder(CFG)
    ids, mask = _batch(jax.random.PRNGKey(0))
    params = enc.init(jax.random.PRNGKey(1), ids, mask)
    out = enc.apply(params, ids, mask,
                    output_hidden_states=True, output_attentions=True)
    assert out.last_hidden_state.shape == (4, 16, CFG.hidden_size)
    assert out.pooled.shape == (4, CFG.hidden_size)
    assert len(out.hidden_states) == CFG.num_layers + 1
    assert len(out.attentions) == CFG.num_layers
    assert out.attentions[0].shape == (4, CFG.num_heads, 16, 16)
    # CLS pooling contract: pooled == last_hidden[:, 0]
    np.testing.assert_allclose(out.pooled, out.last_hidden_state[:, 0])


def test_bert_mask_invariance():
    """Padding tokens must not affect unmasked token outputs."""
    enc = BertEncoder(CFG)
    ids, mask = _batch(jax.random.PRNGKey(2))
    params = enc.init(jax.random.PRNGKey(3), ids, mask)
    out1 = enc.apply(params, ids, mask)
    ids2 = ids.at[:, 12:].set(7)  # change padded region
    out2 = enc.apply(params, ids2, mask)
    np.testing.assert_allclose(
        out1.last_hidden_state[:, :8], out2.last_hidden_state[:, :8],
        atol=1e-5, rtol=1e-5)


def test_remat_matches_plain():
    ids, mask = _batch(jax.random.PRNGKey(4))
    enc = BertEncoder(CFG)
    params = enc.init(jax.random.PRNGKey(5), ids, mask)
    plain = enc.apply(params, ids, mask).pooled
    remat_out = BertEncoder(CFG.replace(remat=True)).apply(params, ids, mask).pooled
    np.testing.assert_allclose(plain, remat_out, atol=1e-6)


def test_truncate_layers():
    enc = BertEncoder(CFG)
    ids, mask = _batch(jax.random.PRNGKey(6))
    params = enc.init(jax.random.PRNGKey(7), ids, mask)["params"]
    small = truncate_layers(params, 1)
    assert "layer_0" in small and "layer_1" not in small
    small_enc = BertEncoder(CFG.replace(num_layers=1))
    out = small_enc.apply({"params": small}, ids, mask)
    assert out.pooled.shape == (4, CFG.hidden_size)


def test_biencoder_shared_vs_separate():
    ids, mask = _batch(jax.random.PRNGKey(8))
    shared = BiEncoder(BiEncoderConfig(bert=CFG, share_weight=True))
    params = shared.init(jax.random.PRNGKey(9), ids, mask, ids, mask)
    q, c = shared.apply(params, ids, mask, ids, mask)
    np.testing.assert_allclose(q, c, atol=1e-6)  # same tower, same input

    sep = BiEncoder(BiEncoderConfig(bert=CFG))
    params2 = sep.init(jax.random.PRNGKey(10), ids, mask, ids, mask)
    q2, c2 = sep.apply(params2, ids, mask, ids, mask)
    assert not np.allclose(q2, c2)
    # single-tower methods agree with the pair call
    q_only = sep.apply(params2, ids, mask, method="encode_query")
    np.testing.assert_allclose(q_only, q2, atol=1e-6)


def test_biencoder_mean_pool_and_projection():
    ids, mask = _batch(jax.random.PRNGKey(11))
    model = BiEncoder(BiEncoderConfig(bert=CFG, pooling="mean",
                                      projection_dim=32))
    params = model.init(jax.random.PRNGKey(12), ids, mask, ids, mask)
    q, c = model.apply(params, ids, mask, ids, mask)
    assert q.shape == (4, 32) and c.shape == (4, 32)


def test_cross_encoder_grouping():
    n, m, s = 2, 3, 16
    ids, mask = _batch(jax.random.PRNGKey(13), b=n * m, s=s)
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG, binary_head=True,
                                         per_layer_logits=True))
    params = ce.init(jax.random.PRNGKey(14), ids, mask, group_size=m)
    out = ce.apply(params, ids, mask, group_size=m)
    assert out["logits"].shape == (n, m)
    assert out["per_layer_logits"].shape == (CFG.num_layers, n, m)
    # grouped like the rank logits (Reranker_2 returns .view(N, M, 2))
    assert out["binary_logits"].shape == (n, m, 2)
    out_flat = ce.apply(params, ids, mask)         # ungrouped path stays flat
    assert out_flat["binary_logits"].shape == (n * m, 2)


def test_colbert_maxsim():
    ids, mask = _batch(jax.random.PRNGKey(15))
    model = ColBERT(ColBERTConfig(bert=CFG, dim=32))
    params = model.init(jax.random.PRNGKey(16), ids, mask, ids, mask)
    q, d = model.apply(params, ids, mask, ids, mask)
    assert q.shape == (4, 16, 32)
    # cosine mode: QUERY tokens are unit-norm at every position incl.
    # padding (reference quirk: query_emb normalizes with no mask, PROD
    # models.py:169-173); DOC padding is masked to zero (:180)
    q_norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(q_norms, 1.0, atol=1e-3)
    d_norms = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(d_norms[:, :8], 1.0, atol=1e-3)
    np.testing.assert_allclose(d_norms[:, 8:], 0.0, atol=1e-6)

    scores = maxsim_score(q, d)
    assert scores.shape == (4, 4)
    paired = maxsim_score_paired(q, d)
    np.testing.assert_allclose(np.diag(np.asarray(scores)), np.asarray(paired),
                               rtol=1e-5)
    # oracle check against a tiny numpy maxsim
    qn, dn = np.asarray(q, np.float32), np.asarray(d, np.float32)
    want = sum(
        np.max(qn[0, t] @ dn[1].T) for t in range(16)
    )
    np.testing.assert_allclose(scores[0, 1], want, rtol=1e-4)


def test_remat_trains():
    """remat=True must work under value_and_grad (GradCache-capability
    claim): regression for a tracer leak when the remat body closed over
    the layer submodule instead of receiving it as the traced module."""
    import optax

    ids = np.ones((2, 8), np.int32)
    mask = np.ones_like(ids)
    model = BertEncoder(CFG.replace(remat=True))
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    @jax.jit
    def loss_fn(p):
        return jnp.sum(model.apply(p, ids, mask).pooled.astype(jnp.float32)
                       ** 2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(jax.tree.map(
        lambda x: jnp.sum(jnp.abs(x).astype(jnp.float32)), g))
    assert np.isfinite(sum(float(x) for x in flat))
    # param paths identical to the non-remat model
    p2 = BertEncoder(CFG).init(jax.random.PRNGKey(0), ids, mask)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_quantized_impls_refuse_gradients():
    """Encode-only int8 impls raise under a gradient trace instead of
    silently producing zero grads through round() (ADVICE r2)."""
    ids = np.ones((2, 8), np.int32)
    mask = np.ones_like(ids)
    base = BertEncoder(CFG).init(jax.random.PRNGKey(0), ids, mask)
    for kw in ({"ffn_impl": "int8"}, {"proj_impl": "int8"},
               {"layer_impl": "fused_int8"}):
        model = BertEncoder(CFG.replace(**kw))

        def loss_fn(p):
            return jnp.sum(
                model.apply(p, ids, mask).pooled.astype(jnp.float32) ** 2)

        with pytest.raises(ValueError, match="encode-only quantized"):
            jax.grad(loss_fn)(base)


def test_remat_policy_dots_trains():
    """remat_policy="dots" (save MXU outputs, recompute elementwise) must
    produce the same gradients as plain remat."""
    import numpy as _np

    ids = np.ones((2, 8), np.int32)
    mask = np.ones_like(ids)
    m_full = BertEncoder(CFG.replace(remat=True))
    m_dots = BertEncoder(CFG.replace(remat=True, remat_policy="dots"))
    params = m_full.init(jax.random.PRNGKey(0), ids, mask)

    def loss(model):
        return lambda p: jnp.sum(
            model.apply(p, ids, mask).pooled.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss(m_full))(params)
    g2 = jax.grad(loss(m_dots))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        _np.testing.assert_allclose(np.asarray(a, np.float32),
                                    np.asarray(b, np.float32),
                                    rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="unknown remat_policy"):
        jax.grad(loss(BertEncoder(CFG.replace(
            remat=True, remat_policy="nope"))))(params)


def test_gelu_tanh_knob():
    """BertConfig.gelu="tanh" (opt-in training-speed knob) runs and tracks
    the exact-erf activations closely; unknown values are rejected."""
    ids = np.ones((2, 8), np.int32) * 3
    mask = np.ones_like(ids)
    m_exact = BertEncoder(CFG)
    m_tanh = BertEncoder(CFG.replace(gelu="tanh"))
    params = m_exact.init(jax.random.PRNGKey(0), ids, mask)
    a = np.asarray(m_exact.apply(params, ids, mask).pooled, np.float32)
    b = np.asarray(m_tanh.apply(params, ids, mask).pooled, np.float32)
    assert np.all(np.isfinite(b))
    assert not np.array_equal(a, b)          # the approximation differs...
    np.testing.assert_allclose(a, b, atol=5e-2)   # ...but only slightly
    with pytest.raises(ValueError, match="gelu"):
        CFG.replace(gelu="relu")
