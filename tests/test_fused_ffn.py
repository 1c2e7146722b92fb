"""Fused FFN Pallas kernel vs the XLA reference expression (interpreter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import simxns_tpu.ops.fused_ffn as ff


@pytest.fixture(autouse=True)
def _interpret():
    old = ff.INTERPRET
    ff.INTERPRET = True
    yield
    ff.INTERPRET = old


def _weights(h=128, f=256, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(0, 0.02, (h, f)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.02, (f,)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.02, (f, h)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.02, (h,)), jnp.float32))


def test_kernel_matches_reference_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    w1, b1, w2, b2 = _weights()
    y = ff.fused_ffn(x, w1, b1, w2, b2)
    ref = ff.ffn_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_kernel_matches_reference_bf16_3d():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 16, 128), dtype=np.float32),
                    jnp.bfloat16)
    w1, b1, w2, b2 = _weights(seed=3)
    y = ff.fused_ffn(x, w1, b1, w2, b2)
    ref = ff.ffn_reference(x, w1, b1, w2, b2)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_grads_match_reference():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 128), dtype=np.float32))
    w1, b1, w2, b2 = _weights(seed=5)

    gf = jax.grad(lambda *a: jnp.sum(ff.fused_ffn(*a) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(lambda *a: jnp.sum(ff.ffn_reference(*a) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_unaligned_shapes_fall_back():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((7, 96), dtype=np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.02, (96, 200)), jnp.float32)
    b1 = jnp.zeros((200,))
    w2 = jnp.asarray(rng.normal(0, 0.02, (200, 96)), jnp.float32)
    b2 = jnp.zeros((96,))
    y = ff.fused_ffn(x, w1, b1, w2, b2)
    ref = ff.ffn_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)


def test_model_level_fused_equals_xla():
    """BertEncoder(ffn_impl='fused') == 'xla' with shared params.

    The param pytrees must be identical across impls (checkpoint
    interchange), and outputs must agree.
    """
    from simxns_tpu.models import BertConfig
    from simxns_tpu.models.bert import BertEncoder

    cfg = BertConfig.tiny(hidden_size=128, intermediate_size=256, num_heads=4)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 1000, (2, 16)), jnp.int32)
    mask = jnp.ones_like(ids)

    m_xla = BertEncoder(cfg)
    m_fused = BertEncoder(cfg.replace(ffn_impl="fused"))
    params = m_xla.init(jax.random.PRNGKey(0), ids, mask)
    params_f = m_fused.init(jax.random.PRNGKey(0), ids, mask)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))

    out_x = m_xla.apply(params, ids, mask)
    out_f = m_fused.apply(params, ids, mask)
    np.testing.assert_allclose(np.asarray(out_f.last_hidden_state),
                               np.asarray(out_x.last_hidden_state),
                               atol=2e-5, rtol=2e-5)


def test_int8_ffn_close_to_reference():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    w1, b1, w2, b2 = _weights(seed=9)
    y = ff.int8_ffn(x, w1, b1, w2, b2)
    ref = ff.ffn_reference(x, w1, b1, w2, b2)
    # per-token/per-channel symmetric int8: ~1% relative error budget
    err = np.abs(np.asarray(y) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale


def test_int8_model_embeddings_near_f32():
    """CLS embeddings from int8 encode stay ~parallel to the f32 path."""
    from simxns_tpu.models import BertConfig
    from simxns_tpu.models.bert import BertEncoder

    cfg = BertConfig.tiny(hidden_size=128, intermediate_size=256, num_heads=4)
    rng = np.random.default_rng(10)
    ids = jnp.asarray(rng.integers(0, 1000, (4, 32)), jnp.int32)
    mask = jnp.ones_like(ids)
    m_f32 = BertEncoder(cfg)
    m_int8 = BertEncoder(cfg.replace(ffn_impl="int8"))
    params = m_f32.init(jax.random.PRNGKey(0), ids, mask)
    a = np.asarray(m_f32.apply(params, ids, mask).pooled, np.float32)
    b = np.asarray(m_int8.apply(params, ids, mask).pooled, np.float32)
    cos = np.sum(a * b, 1) / (np.linalg.norm(a, axis=1)
                              * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.995, cos


def test_int8_dense_close_to_reference():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    w = jnp.asarray(rng.normal(0, 0.02, (128, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.02, (128,)), jnp.float32)
    y = ff.int8_dense(x, w, b)
    ref = jnp.dot(x, w) + b
    err = np.abs(np.asarray(y) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale
    # unaligned output dim falls back to the XLA expression exactly
    y2 = ff.int8_dense(x, w[:, :100], b[:100])
    np.testing.assert_allclose(np.asarray(y2),
                               np.asarray(jnp.dot(x, w[:, :100]) + b[:100]),
                               atol=1e-5, rtol=1e-5)


def test_int8_proj_model_embeddings_near_f32():
    """proj_impl='int8' (q/k/v/output on the int8 MXU) shares param paths
    with nn.Dense and keeps CLS ~parallel to the f32 path."""
    from simxns_tpu.models import BertConfig
    from simxns_tpu.models.bert import BertEncoder

    cfg = BertConfig.tiny(hidden_size=128, intermediate_size=256, num_heads=4)
    rng = np.random.default_rng(12)
    ids = jnp.asarray(rng.integers(0, 1000, (4, 32)), jnp.int32)
    mask = jnp.ones_like(ids)
    m_f32 = BertEncoder(cfg)
    m_q = BertEncoder(cfg.replace(ffn_impl="int8", proj_impl="int8"))
    params = m_f32.init(jax.random.PRNGKey(1), ids, mask)
    # same param tree: proj_impl declares identical query/key/value/output
    a = np.asarray(m_f32.apply(params, ids, mask).pooled, np.float32)
    b = np.asarray(m_q.apply(params, ids, mask).pooled, np.float32)
    cos = np.sum(a * b, 1) / (np.linalg.norm(a, axis=1)
                              * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.99, cos


# --- custom-VJP (train) variant ---------------------------------------------


def test_fused_vjp_forward_matches_reference_f32():
    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    w1, b1, w2, b2 = _weights(seed=21)
    y = ff.fused_ffn_vjp(x, w1, b1, w2, b2)
    ref = ff.ffn_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_vjp_grads_match_reference_f32():
    """All five grads from the two Pallas bwd kernels vs jax.vjp oracle."""
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((48, 128), dtype=np.float32))
    w1, b1, w2, b2 = _weights(seed=23)

    gf = jax.grad(lambda *a: jnp.sum(ff.fused_ffn_vjp(*a) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(lambda *a: jnp.sum(ff.ffn_reference(*a) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gf, gr):
        assert a.dtype == b.dtype, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3, err_msg=name)


def test_fused_vjp_grads_bf16_multiblock():
    """bf16 activations + an F that spans several FB blocks (FB=128 here
    via monkeypatched _F_BLOCK) exercises the accumulation paths."""
    old = ff._F_BLOCK
    ff._F_BLOCK = 128
    try:
        rng = np.random.default_rng(24)
        x = jnp.asarray(rng.standard_normal((32, 128), dtype=np.float32),
                        jnp.bfloat16)
        w1, b1, w2, b2 = _weights(h=128, f=384, seed=25)

        gf = jax.grad(lambda *a: jnp.sum(
            ff.fused_ffn_vjp(*a).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        gr = jax.grad(lambda *a: jnp.sum(
            ff.ffn_reference(*a).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gf, gr):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-6)
            assert np.abs(a - b).max() / scale < 3e-2, (name,
                                                        np.abs(a - b).max())
    finally:
        ff._F_BLOCK = old


def test_fused_vjp_unaligned_falls_back():
    rng = np.random.default_rng(26)
    x = jnp.asarray(rng.standard_normal((7, 96), dtype=np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.02, (96, 200)), jnp.float32)
    b1 = jnp.zeros((200,))
    w2 = jnp.asarray(rng.normal(0, 0.02, (200, 96)), jnp.float32)
    b2 = jnp.zeros((96,))
    y = ff.fused_ffn_vjp(x, w1, b1, w2, b2)
    ref = ff.ffn_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)


def test_model_level_fused_vjp_trains():
    """BertEncoder(ffn_impl='fused_vjp') shares the param tree with 'xla'
    and produces matching grads through a full encoder stack."""
    from simxns_tpu.models import BertConfig
    from simxns_tpu.models.bert import BertEncoder

    cfg = BertConfig.tiny(hidden_size=128, intermediate_size=256, num_heads=4)
    rng = np.random.default_rng(27)
    ids = jnp.asarray(rng.integers(0, 1000, (2, 16)), jnp.int32)
    mask = jnp.ones_like(ids)

    m_xla = BertEncoder(cfg)
    m_v = BertEncoder(cfg.replace(ffn_impl="fused_vjp"))
    params = m_xla.init(jax.random.PRNGKey(0), ids, mask)
    assert (jax.tree_util.tree_structure(params) == jax.tree_util
            .tree_structure(m_v.init(jax.random.PRNGKey(0), ids, mask)))

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, ids, mask).pooled ** 2)
        return f

    lx, gx = jax.value_and_grad(loss(m_xla))(params)
    lv, gv = jax.value_and_grad(loss(m_v))(params)
    np.testing.assert_allclose(float(lv), float(lx), rtol=1e-4)
    flat_x = jax.tree_util.tree_leaves(gx)
    flat_v = jax.tree_util.tree_leaves(gv)
    for a, b in zip(flat_v, flat_x):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-4, rtol=5e-3)
