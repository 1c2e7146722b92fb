import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from simxns_tpu.parallel import (
    DATA_AXIS, create_mesh, all_gather_full_grad, all_gather_local_grad,
    shard_batch, local_batch_size)
from simxns_tpu.parallel.collectives import gather_positive_offsets
from simxns_tpu.losses import in_batch_nll


def test_mesh_shape():
    mesh = create_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    assert local_batch_size(16, mesh) == 2


def _run_shard_map(fn, mesh, x):
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS))
    )(x)


def test_all_gather_order():
    """Gathered order must be device-major (rank 0 first), like the reference."""
    mesh = create_mesh()
    x = jnp.arange(16, dtype=jnp.float32).reshape(16, 1)

    def f(xs):
        g = all_gather_full_grad(xs, DATA_AXIS)
        return g[None]  # [1, 16, 1] per device

    out = _run_shard_map(f, mesh, x)
    for d in range(8):
        np.testing.assert_array_equal(np.asarray(out[d, :, 0]), np.arange(16))


def test_local_grad_semantics():
    """Gradient flows only into the local shard under `local` mode.

    Oracle: with loss = sum(gathered * w), d/dx under `local` must equal the
    local slice of w only (remote contributions detached), while `full` sees
    the psum'd total. This is the PROD/MASTER detach-remote contract
    (MASTER/pretrain/modeling.py:402-410).
    """
    mesh = create_mesh()
    x = jnp.ones((16, 2), dtype=jnp.float32)
    w = jnp.arange(32, dtype=jnp.float32).reshape(16, 2)

    def make_loss(mode):
        def loss_fn(xs, ws_global):
            gather = (all_gather_local_grad if mode == "local"
                      else all_gather_full_grad)
            g = gather(xs, DATA_AXIS)              # [16, 2] global view
            # per-device partial loss; psum to make it a replicated scalar
            return jax.lax.psum(jnp.sum(g * ws_global), DATA_AXIS)

        def wrapped(xs):
            return jax.shard_map(
                lambda s: loss_fn(s, w),
                mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P())(xs)

        return wrapped

    grad_local = jax.grad(make_loss("local"))(x)
    grad_full = jax.grad(make_loss("full"))(x)
    # local mode: each shard's grad is its own slice of w (summed once,
    # because only the local device's loss term sees it live).
    np.testing.assert_allclose(np.asarray(grad_local), np.asarray(w))
    # full mode: every device's loss term sees every shard -> 8x.
    np.testing.assert_allclose(np.asarray(grad_full), 8 * np.asarray(w))


def test_positive_offsets():
    mesh = create_mesh()
    local_pos = jnp.zeros((16,), dtype=jnp.int32)  # each device: positive at 0

    def f(p):
        return gather_positive_offsets(p, 2, DATA_AXIS)

    out = _run_shard_map(f, mesh, local_pos)
    np.testing.assert_array_equal(
        np.asarray(out), np.repeat(np.arange(8) * 2, 2))


def test_global_in_batch_nll_matches_single_device():
    """Sharded loss with gathered negatives == unsharded full-batch loss."""
    mesh = create_mesh()
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (16, 8))
    c = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    pos = jnp.arange(16, dtype=jnp.int32)

    ref_loss, ref_correct = in_batch_nll(q, c, pos)

    def sharded(qs, cs, ps):
        g_c = all_gather_full_grad(cs, DATA_AXIS)
        g_pos = ps  # already global indices
        loss, correct = in_batch_nll(qs, g_c, g_pos, reduction="sum")
        return (jax.lax.psum(loss, DATA_AXIS) / 16.0,
                jax.lax.psum(correct, DATA_AXIS))

    loss, correct = jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P())))(q, c, pos)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    assert int(correct) == int(ref_correct)


def test_shard_batch_places_on_mesh():
    mesh = create_mesh()
    batch = {"ids": np.zeros((16, 4), np.int32), "y": np.zeros((16,), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["ids"].sharding.spec == P(DATA_AXIS, None)


def test_tensor_parallel_biencoder_step():
    """2D (data=4, model=2) mesh: TP param shardings propagate through a
    full train step and match the replicated-run numerics."""
    import jax.numpy as jnp
    from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
    from simxns_tpu.parallel import create_mesh as _cm
    from simxns_tpu.parallel.mesh import MODEL_AXIS
    from simxns_tpu.parallel.tp import shard_params, tp_param_shardings
    from simxns_tpu.train import TrainState, make_adamw, make_biencoder_step
    from simxns_tpu.parallel import shard_batch

    mesh = _cm(n_data=4, n_model=2)
    cfg = BertConfig.tiny(vocab_size=256, hidden_size=64)
    model = BiEncoder(BiEncoderConfig(bert=cfg))
    rng = np.random.default_rng(0)
    n, m = 8, 2
    q = rng.integers(4, 256, size=(n, 8)).astype(np.int32)
    ctx = rng.integers(4, 256, size=(n * m, 10)).astype(np.int32)
    batch = {"q_ids": q, "q_mask": np.ones_like(q), "ctx_ids": ctx,
             "ctx_mask": np.ones_like(ctx),
             "positive_idx": (np.arange(n) * m).astype(np.int32)}
    params = model.init(jax.random.PRNGKey(0), q[:2], batch["q_mask"][:2],
                        ctx[:2], batch["ctx_mask"][:2])

    # TP layout: FFN/attention kernels sharded over the model axis
    specs = tp_param_shardings(params, mesh)
    inter = specs["params"]["question_model"]["encoder"]["layer_0"][
        "intermediate"]["kernel"].spec
    assert inter == P(None, MODEL_AXIS)
    out_spec = specs["params"]["question_model"]["encoder"]["layer_0"][
        "output"]["kernel"].spec
    assert out_spec == P(MODEL_AXIS, None)

    tx = make_adamw(1e-3, total_steps=0)
    tp_params = shard_params(jax.tree.map(jnp.copy, params), mesh)
    state_tp = TrainState.create(tp_params, tx)
    state_rep = TrainState.create(params, tx)

    dev = shard_batch(batch, mesh)
    step_tp = make_biencoder_step(model, tx, mesh, auto_state=True)
    step_rep = make_biencoder_step(model, tx, mesh)
    state_tp, m_tp = step_tp(state_tp, dev)
    state_rep, m_rep = step_rep(state_rep, dev)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_rep["loss"]),
                               rtol=1e-5)
    # TP layout preserved after the step (donated + re-emitted)
    post = state_tp.params["params"]["question_model"]["encoder"]["layer_0"][
        "intermediate"]["kernel"]
    assert MODEL_AXIS in str(post.sharding.spec)
