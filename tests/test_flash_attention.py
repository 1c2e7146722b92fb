import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simxns_tpu.ops.flash_attention as fa
from simxns_tpu.ops.attention import multi_head_attention


@pytest.fixture
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _inputs(b=2, h=4, s=128, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    mask = jnp.ones((b, s), jnp.int32).at[:, s - 28:].set(0)
    return q, k, v, mask


def test_pallas_fwd_matches_xla(interpret_mode):
    q, k, v, mask = _inputs()
    out = fa.flash_attention(q, k, v, mask)
    ref, _ = multi_head_attention(q, k, v, mask, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_pallas_bwd_matches_xla(interpret_mode):
    q, k, v, mask = _inputs(b=1, h=2, s=64, d=32)

    def loss_p(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, mask) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, mask, impl="xla")[0] ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_dispatch_policy():
    """On CPU (non-TPU), flash_attention must silently use the XLA path."""
    assert fa.INTERPRET is False
    q, k, v, mask = _inputs(b=1, h=2, s=32, d=16)
    out = fa.flash_attention(q, k, v, mask)
    ref, _ = multi_head_attention(q, k, v, mask, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_model_level_flash_equals_xla(interpret_mode):
    """BertEncoder outputs identical with attention_impl flash vs xla."""
    from simxns_tpu.models.bert import BertConfig, BertEncoder

    cfg_x = BertConfig.tiny(attention_impl="xla")
    cfg_f = cfg_x.replace(attention_impl="flash")
    rng = np.random.default_rng(1)
    ids = rng.integers(4, 1000, size=(2, 16)).astype(np.int32)
    mask = np.ones_like(ids)
    enc_x = BertEncoder(cfg_x)
    params = enc_x.init(jax.random.PRNGKey(0), ids, mask)
    out_x = enc_x.apply(params, ids, mask).pooled
    out_f = BertEncoder(cfg_f).apply(params, ids, mask).pooled
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-4, rtol=2e-4)


@pytest.fixture
def group_mode(interpret_mode):
    old = fa.SMALL_S_IMPL
    fa.SMALL_S_IMPL = "group"
    yield
    fa.SMALL_S_IMPL = old


def test_group_fwd_matches_xla(group_mode):
    """Grouped small-S kernel (bb=2 batch elems x all heads per program)."""
    q, k, v, mask = _inputs(b=4, h=3, s=64, d=32)
    out = fa.flash_attention(q, k, v, mask)
    ref, _ = multi_head_attention(q, k, v, mask, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_group_fwd_odd_batch_falls_to_bb1(group_mode):
    q, k, v, mask = _inputs(b=3, h=2, s=32, d=16, seed=5)
    out = fa.flash_attention(q, k, v, mask)
    ref, _ = multi_head_attention(q, k, v, mask, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_group_bwd_matches_xla(group_mode):
    q, k, v, mask = _inputs(b=2, h=2, s=64, d=32, seed=7)

    def loss_p(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, mask) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, mask, impl="xla")[0] ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_small_s_attn_config_selects_group(interpret_mode):
    """BertConfig.small_s_attn='group' routes THIS model through the
    grouped kernel without touching the module-global default (per-model
    selection for the CE S=160 candidate, bench_r5 ce_attack) — and the
    in-model numerics match the default path."""
    from simxns_tpu.models.bert import BertConfig, BertEncoder

    assert fa.SMALL_S_IMPL == "xla"        # global default untouched
    cfg_d = BertConfig.tiny(attention_impl="flash")
    cfg_g = cfg_d.replace(small_s_attn="group")
    rng = np.random.default_rng(3)
    ids = rng.integers(4, 1000, size=(4, 32)).astype(np.int32)
    mask = np.ones_like(ids)
    enc = BertEncoder(cfg_d)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    out_d = enc.apply(params, ids, mask).pooled
    out_g = BertEncoder(cfg_g).apply(params, ids, mask).pooled
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_d),
                               atol=2e-4, rtol=2e-4)

    # grads flow through the grouped kernel's custom VJP in-model
    def loss(p):
        return jnp.sum(BertEncoder(cfg_g).apply(p, ids, mask).pooled ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(g))
