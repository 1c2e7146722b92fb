"""Fused Pallas MIPS kernel vs exact oracle (interpreter mode on CPU).

The kernel's contract (SURVEY.md §2.1 row 1): FAISS-brute-force semantics up
to the documented 128-bucket reduction — at most one of two true top-k hits
sharing a bucket is dropped. The numpy oracle here replays that exact
candidate reduction, so scores/ids must match BIT-EXACTLY; a separate test
checks end-to-end recall vs the true exact top-k.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import simxns_tpu.ops.mips_kernel as mk
from simxns_tpu.ops.topk import blocked_mips_topk, exact_topk


@pytest.fixture(autouse=True)
def _interpret():
    old = mk.INTERPRET
    mk.INTERPRET = True
    yield
    mk.INTERPRET = old


def _oracle(queries, corpus, k, bucket, valid_n=None):
    """Replay the kernel's bucket-reduction semantics in numpy (f32)."""
    q = np.asarray(queries, np.float32)
    c = np.asarray(corpus, np.float32)
    n = c.shape[0]
    scores = q @ c.T
    if valid_n is not None:
        scores[:, valid_n:] = -1e30
    nb = n // bucket
    s3 = scores[:, : nb * bucket].reshape(q.shape[0], nb, bucket)
    best = s3.max(-1)
    arg = s3.argmax(-1) + np.arange(nb)[None, :] * bucket
    order = np.argsort(-best, axis=1, kind="stable")[:, :k]
    return (np.take_along_axis(best, order, 1),
            np.take_along_axis(arg, order, 1))


def test_matches_bucket_oracle_exactly():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, 128), dtype=np.float32)
    c = rng.standard_normal((1024, 128), dtype=np.float32)
    s, i = mk.fused_mips_topk(jnp.asarray(q), jnp.asarray(c), 5,
                              block_n=256, block_q=8, bucket=128)
    os, oi = _oracle(q, c, 5, mk._fit_bucket(128, 256, 1024, 5))
    np.testing.assert_allclose(np.asarray(s), os, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_valid_n_and_offset_and_padding():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((5, 128), dtype=np.float32)   # pads to block_q
    c = rng.standard_normal((700, 128), dtype=np.float32)  # pads to block_n
    s, i = mk.fused_mips_topk(jnp.asarray(q), jnp.asarray(c), 4,
                              block_n=256, block_q=8, bucket=64,
                              valid_n=600, id_offset=1000)
    os, oi = _oracle(q, np.pad(c, ((0, 68), (0, 0))), 4,
                     mk._fit_bucket(64, 256, 768, 4), valid_n=600)
    assert s.shape == (5, 4) and i.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(s), os, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), oi + 1000)
    assert int(np.asarray(i).max()) < 1600  # never selects padding rows


def test_recall_vs_exact():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((16, 128), dtype=np.float32)
    c = rng.standard_normal((4096, 128), dtype=np.float32)
    s, i = mk.fused_mips_topk(jnp.asarray(q), jnp.asarray(c), 10,
                              block_n=512, block_q=16, bucket=16)
    es, ei = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    recall = np.mean([
        len(set(np.asarray(i)[r]) & set(np.asarray(ei)[r])) / 10
        for r in range(16)])
    # 256 buckets, k=10: expected loss C(10,2)/256 ~= 0.18 hits/query.
    # (Production ratio is far finer: N/bucket=68750 at k=100 -> ~0.9993.)
    assert recall >= 0.93


def test_blocked_mips_topk_fused_mode_dispatch():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((8, 128), dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((2048, 128), dtype=np.float32))
    s, i = blocked_mips_topk(q, c, 5, block_size=512, mode="fused")
    os, oi = _oracle(q, c, 5, mk._fit_bucket(128, 512, 2048, 5))
    np.testing.assert_allclose(np.asarray(s), os, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_fused_under_jit_traced_args():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((8, 128), dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((512, 128), dtype=np.float32))

    @jax.jit
    def run(q, c, valid_n, offset):
        return mk.fused_mips_topk(q, c, 3, block_n=256, block_q=8,
                                  valid_n=valid_n, id_offset=offset)

    s, i = run(q, c, jnp.int32(512), jnp.int32(7))
    os, oi = _oracle(q, c, 3, mk._fit_bucket(128, 256, 512, 3))
    np.testing.assert_allclose(np.asarray(s), os, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), oi + 7)


def test_engine_fused_mode_sharded():
    """MIPSIndex(mode='fused') over the 8-device CPU mesh vs exact oracle."""
    from simxns_tpu.index import MIPSIndex
    from simxns_tpu.parallel import create_mesh

    mesh = create_mesh()
    rng = np.random.default_rng(9)
    n, h, k = 8 * 4096, 128, 10
    corpus = rng.standard_normal((n, h), dtype=np.float32)
    queries = rng.standard_normal((24, h), dtype=np.float32)
    index = MIPSIndex(mesh, block_size=1024, store_dtype=jnp.float32,
                      mode="fused")
    index.build(corpus)
    scores, ids = index.search(queries, k)
    oracle = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    recall = np.mean([len(set(ids[i]) & set(oracle[i])) / k
                      for i in range(len(queries))])
    # 256 buckets total at bucket=128; expected loss C(10,2)/256 ~= 0.18.
    assert recall >= 0.93
    assert (ids >= 0).all() and (ids < n).all()


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((32, 128), dtype=np.float32))
    codes, scales = mk.quantize_rows(x)
    assert codes.dtype == jnp.int8
    recon = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
    np.testing.assert_allclose(recon, np.asarray(x),
                               atol=float(np.asarray(scales).max()) * 0.51)


def test_fused_int8_recall_vs_f32_exact():
    rng = np.random.default_rng(12)
    q = rng.standard_normal((16, 128), dtype=np.float32)
    c = rng.standard_normal((4096, 128), dtype=np.float32)
    codes, scales = mk.quantize_rows(jnp.asarray(c))
    s, i = mk.fused_mips_topk_int8(jnp.asarray(q), codes, scales, 10,
                                   block_n=512, block_q=16, bucket=16)
    es, ei = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    recall = np.mean([
        len(set(np.asarray(i)[r]) & set(np.asarray(ei)[r])) / 10
        for r in range(16)])
    # bucket loss ~0.18/query at 256 buckets + SQ8 noise
    assert recall >= 0.9, recall
    # scores must be the dequantized inner products (close to f32 truth)
    np.testing.assert_allclose(np.asarray(s)[:, 0], np.asarray(es)[:, 0],
                               rtol=0.05)


def test_engine_int8_sharded_modes():
    """MIPSIndex(store_dtype=int8) on the CPU mesh: approx + fused modes."""
    from simxns_tpu.index import MIPSIndex
    from simxns_tpu.parallel import create_mesh

    mesh = create_mesh()
    rng = np.random.default_rng(13)
    n, h, k = 8 * 4096, 128, 10
    corpus = rng.standard_normal((n, h), dtype=np.float32)
    queries = rng.standard_normal((24, h), dtype=np.float32)
    oracle = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    for mode in ("approx", "fused"):
        index = MIPSIndex(mesh, block_size=1024, store_dtype=jnp.int8,
                          mode=mode)
        index.build(corpus)
        scores, ids = index.search(queries, k)
        recall = np.mean([len(set(ids[i]) & set(oracle[i])) / k
                          for i in range(len(queries))])
        assert recall >= 0.9, (mode, recall)
        assert (ids >= 0).all() and (ids < n).all()


def test_engine_int8_update_rows():
    from simxns_tpu.index import MIPSIndex
    from simxns_tpu.parallel import create_mesh

    mesh = create_mesh()
    rng = np.random.default_rng(14)
    corpus = rng.standard_normal((64, 128), dtype=np.float32)
    index = MIPSIndex(mesh, block_size=8, store_dtype=jnp.int8,
                      mode="exact")
    index.build(corpus)
    new = rng.standard_normal((8, 128), dtype=np.float32)
    index.update_rows(16, new)
    corpus[16:24] = new
    _, ids = index.search(corpus[16:24], 1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(16, 24))


def test_tiny_shapes_pad_h_and_candidates():
    """H not a lane multiple + corpus so small that candidates < k: both
    wrappers must zero-pad H (inner products unchanged) and backfill the
    candidate set with -1 ids instead of raising."""
    rng = np.random.default_rng(15)
    q = jnp.asarray(rng.standard_normal((5, 64), dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((48, 64), dtype=np.float32))
    es, ei = exact_topk(q, c, 10)

    s, i = mk.fused_mips_topk(q, c, 10, block_n=16, bucket=128)
    assert np.asarray(i).shape == (5, 10)
    # the global max always survives bucket reduction; scores match exactly
    np.testing.assert_array_equal(np.asarray(i)[:, 0], np.asarray(ei)[:, 0])
    np.testing.assert_allclose(np.asarray(s)[:, 0], np.asarray(es)[:, 0],
                               rtol=1e-5)

    codes, scales = mk.quantize_rows(c)
    s8, i8 = mk.fused_mips_topk_int8(q, codes, scales, 10, block_n=16,
                                     block_q=8, bucket=128)
    assert np.asarray(i8).shape == (5, 10)
    np.testing.assert_allclose(np.asarray(s8)[:, 0], np.asarray(es)[:, 0],
                               rtol=0.05)
