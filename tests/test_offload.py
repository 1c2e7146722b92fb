"""HostStash: phase-based HBM budgeting (parallel/offload.py).

The AR2 mine phase stashes the reranker TrainState to host while the index
occupies HBM (run.py mine_offloaded; AR2CoTrainer offload_refresh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from simxns_tpu.parallel import create_mesh
from simxns_tpu.parallel.offload import HostStash


def test_hoststash_roundtrip_preserves_values_and_shardings():
    mesh = create_mesh()
    sharded = jax.device_put(
        jnp.arange(64.0).reshape(8, 8),
        NamedSharding(mesh, P("data", None)))
    replicated = jax.device_put(jnp.ones((3,)), NamedSharding(mesh, P()))
    tree = {"w": sharded, "b": replicated, "step": 7, "none": None}
    want_w = np.asarray(sharded)
    stash = HostStash(tree)
    assert stash.nbytes == 64 * 4 + 3 * 4
    # the device buffers are actually gone
    assert sharded.is_deleted()
    back = stash.restore()
    np.testing.assert_array_equal(np.asarray(back["w"]), want_w)
    assert back["w"].sharding == NamedSharding(mesh, P("data", None))
    assert back["step"] == 7 and back["none"] is None


def test_hoststash_restore_twice_raises():
    stash = HostStash({"x": jnp.zeros((4,))})
    stash.restore()
    with pytest.raises(RuntimeError):
        stash.restore()


def test_hoststash_numpy_tree_is_host_view():
    """numpy_tree(): the checkpoint's host copy without a second pull.

    The AR2 boundary writes Orbax from this tree while the mine runs
    (run.py checkpoint closure); it must match the stashed values, stay
    valid after restore() if captured before, and refuse capture after."""
    tree = {"w": jnp.arange(12.0).reshape(3, 4), "step": 5}
    stash = HostStash(tree)
    host = stash.numpy_tree()
    assert isinstance(host["w"], np.ndarray)
    np.testing.assert_array_equal(host["w"],
                                  np.arange(12.0).reshape(3, 4))
    assert host["step"] == 5
    back = stash.restore()
    # captured-before tree survives the restore (refcounted buffers)
    np.testing.assert_array_equal(host["w"], np.asarray(back["w"]))
    with pytest.raises(RuntimeError):
        stash.numpy_tree()


def test_force_sync_mixed_tree_and_sharded_leaves():
    """force_sync: completes on pytrees with sharded, scalar, and
    non-array leaves, and leaves values untouched (it only probes)."""
    from simxns_tpu.parallel import force_sync

    mesh = create_mesh()
    sharded = jax.device_put(
        jnp.arange(64.0).reshape(8, 8), NamedSharding(mesh, P("data", None)))
    tree = {"w": sharded, "scalar": jnp.float32(3.0), "i8": jnp.zeros((4,),
            jnp.int8), "np": np.ones(2), "none": None, "py": 7}
    force_sync(tree)
    force_sync()            # no arrays at all: a no-op
    force_sync(None, {"a": 1})
    np.testing.assert_array_equal(np.asarray(sharded),
                                  np.arange(64.0).reshape(8, 8))


def test_hoststash_train_state_through_a_step():
    """Stash/restore a real TrainState mid-run: the restored state must
    drive further (donating) steps exactly as the original would."""
    import optax

    from simxns_tpu.train import TrainState

    def loss_fn(params, x):
        return jnp.sum((x @ params["w"]) ** 2)

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((4, 2))}
    state = TrainState.create(params, tx)

    @jax.jit
    def step(s, x):
        g = jax.grad(loss_fn)(s.params, x)
        return s.apply_gradients(g, tx)

    x = jnp.arange(8.0).reshape(2, 4)
    s_ref = step(step(state, x), x)

    s2 = TrainState.create({"w": jnp.ones((4, 2))}, tx)
    s2 = step(s2, x)
    s2 = HostStash(s2).restore()       # mine-phase round trip
    s2 = step(s2, x)
    np.testing.assert_allclose(np.asarray(s_ref.params["w"]),
                               np.asarray(s2.params["w"]), rtol=1e-6)
