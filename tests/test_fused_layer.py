"""Whole-layer fused int8 kernel vs the f32 XLA expression (interpreter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import simxns_tpu.ops.fused_layer as fl


@pytest.fixture(autouse=True)
def _interpret():
    old = fl.INTERPRET
    fl.INTERPRET = True
    yield
    fl.INTERPRET = old


def _params(h=128, f=256, seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.02, shape), jnp.float32)

    return {
        "wq": w(h, h), "bq": w(h), "wk": w(h, h), "bk": w(h),
        "wv": w(h, h), "bv": w(h), "wo": w(h, h), "bo": w(h),
        "ln1_scale": jnp.ones(h), "ln1_bias": w(h) * 0,
        "w1": w(h, f), "b1": w(f), "w2": w(f, h), "b2": w(h),
        "ln2_scale": jnp.ones(h), "ln2_bias": w(h) * 0,
    }


def test_fused_layer_close_to_reference():
    rng = np.random.default_rng(1)
    h, s, b = 128, 16, 4
    x = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = jnp.ones((b, s), jnp.int32)
    params = _params(h)
    y = fl.fused_encoder_layer_int8(x, mask, params, num_heads=4)
    ref = fl.layer_reference(x, mask, params, num_heads=4)
    err = np.abs(np.asarray(y, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.05, err.max() / scale
    # LN output is ~unit-scale; mean error should be small
    assert err.mean() < 0.02, err.mean()


def test_fused_layer_respects_mask():
    rng = np.random.default_rng(2)
    h, s, b = 128, 16, 2
    x = np.asarray(rng.standard_normal((b, s, h)), np.float32)
    params = _params(h, seed=3)
    mask = np.ones((b, s), np.int32)
    mask[:, 8:] = 0
    y_m = fl.fused_encoder_layer_int8(jnp.asarray(x), jnp.asarray(mask),
                                      params, num_heads=4)
    # changing masked-key content must not change unmasked-query outputs
    x2 = x.copy()
    x2[:, 8:] = rng.standard_normal((b, 8, h))
    y2 = fl.fused_encoder_layer_int8(jnp.asarray(x2), jnp.asarray(mask),
                                     params, num_heads=4)
    # rows 8+ differ (their own residual path), rows <8 attend only to <8
    np.testing.assert_allclose(np.asarray(y_m[:, :8], np.float32),
                               np.asarray(y2[:, :8], np.float32),
                               atol=1e-2)


def test_fused_layer_odd_batch_tile():
    """b not divisible by seqs_per_tile falls back to 1 seq/program."""
    rng = np.random.default_rng(4)
    h, s, b = 128, 8, 3
    x = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    params = _params(h, seed=5)
    y = fl.fused_encoder_layer_int8(x, jnp.ones((b, s), jnp.int32), params,
                                    num_heads=4, seqs_per_tile=2)
    ref = fl.layer_reference(x, jnp.ones((b, s), jnp.int32), params,
                             num_heads=4)
    err = np.abs(np.asarray(y, np.float32) - np.asarray(ref, np.float32))
    assert err.max() / np.abs(np.asarray(ref)).max() < 0.05


def test_model_level_fused_layer_near_f32():
    """layer_impl='fused_int8' shares param paths with the standard
    composition and keeps CLS ~parallel to the f32 path."""
    from simxns_tpu.models import BertConfig
    from simxns_tpu.models.bert import BertEncoder

    cfg = BertConfig.tiny(hidden_size=128, intermediate_size=256,
                          num_heads=4)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, 1000, (4, 32)), jnp.int32)
    mask = np.ones((4, 32), np.int32)
    mask[2:, 20:] = 0          # exercise padding masks
    mask = jnp.asarray(mask)
    m_f32 = BertEncoder(cfg)
    m_fl = BertEncoder(cfg.replace(layer_impl="fused_int8"))
    params = m_f32.init(jax.random.PRNGKey(2), ids, mask)
    # identical param trees (paths interchange across layer_impl)
    params2 = m_fl.init(jax.random.PRNGKey(2), ids, mask)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    a = np.asarray(m_f32.apply(params, ids, mask).pooled, np.float32)
    b = np.asarray(m_fl.apply(params, ids, mask).pooled, np.float32)
    cos = np.sum(a * b, 1) / (np.linalg.norm(a, axis=1)
                              * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.99, cos


def test_pick_seqs_per_tile_scoped_vmem():
    """Tile selection respects the measured Mosaic stack budget
    (weights 4H^2+2HF + TM*(4H+6F) bytes vs _STACK_BUDGET_BYTES — the
    model matches the 20.94M@TM=320 / 17.22M@TM=160 compile-time
    measurements at BERT-large): the CE-teacher 2-seq tile fits because
    the kernel raises Mosaic's default 16M limit to 64M; long sequences
    halve the tile; a shape whose single sequence exceeds the budget
    returns 0 (XLA fallback)."""
    # BERT-large CE teacher: H=1024, F=4096, S=160 — ~21.8M est fits the
    # 48M budget under the raised 64M limit (ran at 156.3 ms measured)
    assert fl._pick_seqs_per_tile(128, 160, 1024, 4096, 2) == 2
    # BERT-base encode: H=768, F=3072, S=128 -> stays at 2 (~12.2M est,
    # the 0.80-MXU headline tile)
    assert fl._pick_seqs_per_tile(1024, 128, 768, 3072, 2) == 2
    # BERT-large S=768: 2 seqs -> ~56.7M est -> halve to 1 (~34.6M)
    assert fl._pick_seqs_per_tile(8, 768, 1024, 4096, 2) == 1
    # odd batch still falls to 1
    assert fl._pick_seqs_per_tile(3, 128, 768, 3072, 2) == 1
    # single sequence over budget -> 0 (caller uses layer_reference)
    assert fl._pick_seqs_per_tile(8, 2048, 1024, 4096, 2) == 0


def test_fused_layer_cross_encoder_shapes():
    """CE joint shapes (S=160/192, non-128-multiple sequence lengths) —
    the rerank-eval path (VERDICT r2 #6; PROD rerank S<=192)."""
    rng = np.random.default_rng(7)
    params = _params(128, 256, seed=7)
    for s in (160, 192):
        x = jnp.asarray(rng.normal(0, 1, (2, s, 128)), jnp.float32)
        mask = np.ones((2, s), np.int32)
        mask[1, s - 24:] = 0
        mask = jnp.asarray(mask)
        got = fl.fused_encoder_layer_int8(x, mask, params, num_heads=4)
        want = fl.layer_reference(x, mask, params, num_heads=4)
        a = np.asarray(got, np.float32).reshape(-1)
        b = np.asarray(want, np.float32).reshape(-1)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, (s, cos)
