"""Multi-slice (DCN) mesh: training + index semantics on a virtual
2-slice x 4-device CPU mesh.

The reference is single-node 8-GPU NCCL; multi-slice is new TPU capability
(ROADMAP gap 4). Contract: a ``(replica, data, model)`` mesh where the
``replica`` axis models the DCN boundary — per-step grad psum crosses it,
while index shards and (optionally) in-batch-negative gathers stay on the
inner ICI axes. Semantics must match the single-axis mesh exactly for
``negatives_scope='global'``; ``'slice'`` partitions the softmax per slice.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
from simxns_tpu.parallel import (create_mesh, create_multislice_mesh,
                                 dp_axes, dp_size, shard_batch,
                                 REPLICA_AXIS, DATA_AXIS)
from simxns_tpu.train import TrainState, make_adamw
from simxns_tpu.train.steps import make_biencoder_step


def _model():
    cfg = BiEncoderConfig(bert=BertConfig.tiny(), share_weight=False)
    return BiEncoder(cfg)


def _batch(rng, n=16, s=12, v=1024):
    q = rng.integers(5, v, (n, s)).astype(np.int32)
    ctx = rng.integers(5, v, (n, s)).astype(np.int32)
    m = np.ones((n, s), np.int32)
    return {"q_ids": q, "q_mask": m, "ctx_ids": ctx, "ctx_mask": m,
            "positive_idx": np.arange(n, dtype=np.int32)}


def test_multislice_mesh_shape():
    mesh = create_multislice_mesh(2)
    assert mesh.axis_names == (REPLICA_AXIS, DATA_AXIS, "model")
    assert mesh.shape[REPLICA_AXIS] == 2 and mesh.shape[DATA_AXIS] == 4
    assert dp_axes(mesh) == (REPLICA_AXIS, DATA_AXIS)
    assert dp_size(mesh) == 8
    with pytest.raises(ValueError):
        create_multislice_mesh(3)


@pytest.mark.parametrize("grad_mode", ["full", "local"])
def test_multislice_matches_single_mesh(grad_mode):
    """Global-scope training on (2, 4) == the flat 8-device mesh."""
    model = _model()
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0),
                        batch["q_ids"][:2], batch["q_mask"][:2],
                        batch["ctx_ids"][:2], batch["ctx_mask"][:2])
    tx = make_adamw(1e-3, total_steps=0)

    host_params = jax.tree.map(np.asarray, params)
    results = []
    for mesh in (create_mesh(), create_multislice_mesh(2)):
        # steps donate their state: rebuild from host copies per mesh
        state = TrainState.create(jax.tree.map(jnp.asarray, host_params), tx)
        step = make_biencoder_step(model, tx, mesh, grad_mode=grad_mode)
        losses = []
        for _ in range(3):
            state, metrics = step(state, shard_batch(batch, mesh))
            losses.append(float(metrics["loss"]))
        results.append(losses)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-4)


def test_slice_scoped_negatives():
    """negatives_scope='slice': each slice's softmax sees only its own
    contexts; loss equals the mean of the two per-half NLLs."""
    model = _model()
    rng = np.random.default_rng(1)
    batch = _batch(rng, n=16)
    params = model.init(jax.random.PRNGKey(1),
                        batch["q_ids"][:2], batch["q_mask"][:2],
                        batch["ctx_ids"][:2], batch["ctx_mask"][:2])
    tx = make_adamw(1e-3, total_steps=0)
    mesh = create_multislice_mesh(2)
    step = make_biencoder_step(model, tx, mesh, grad_mode="full",
                               negatives_scope="slice")
    host_params = jax.tree.map(np.asarray, params)
    state = TrainState.create(jax.tree.map(jnp.asarray, host_params), tx)
    params = jax.tree.map(jnp.asarray, host_params)  # step donates state
    _, metrics = step(state, shard_batch(batch, mesh))
    got = float(metrics["loss"])

    # oracle: per-half softmax over that half's 8 contexts
    q = model.apply(params, batch["q_ids"], batch["q_mask"],
                    method="encode_query")
    c = model.apply(params, batch["ctx_ids"], batch["ctx_mask"],
                    method="encode_passage")
    q, c = np.asarray(q, np.float32), np.asarray(c, np.float32)
    tot = 0.0
    for half in (slice(0, 8), slice(8, 16)):
        scores = q[half] @ c[half].T
        logp = scores - np.log(np.exp(scores).sum(1, keepdims=True))
        tot += -np.trace(logp)
    np.testing.assert_allclose(got, tot / 16, rtol=1e-3)
    assert int(metrics["correct"]) <= 16


def test_index_on_multislice_mesh():
    """MIPSIndex shards rows over the inner data axis and replicates
    across slices; results match the oracle."""
    from simxns_tpu.index import MIPSIndex

    mesh = create_multislice_mesh(2)
    rng = np.random.default_rng(2)
    n, h, k = 4 * 1024, 64, 5
    corpus = rng.standard_normal((n, h), dtype=np.float32)
    queries = rng.standard_normal((8, h), dtype=np.float32)
    oracle = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    index = MIPSIndex(mesh, block_size=256, store_dtype=jnp.float32,
                      mode="exact")
    index.build(corpus)
    _, ids = index.search(queries, k)
    np.testing.assert_array_equal(ids, oracle)
