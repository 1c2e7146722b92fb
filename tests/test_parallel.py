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
