"""Stall watchdog: bounded syncs, abort-and-retry, loud bounded failure.

Round-4 motivation: a full-size run's final whole-corpus eval mine wedged
for 58 minutes (0 CPU, main thread in futex_wait under a host transfer)
and had to be killed by hand. The watchdog bounds every sync/result-pull
in the index hot paths and retries the phase instead (parallel/watchdog.py).
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

import simxns_tpu.index.engine as engine_mod
from simxns_tpu.index import MIPSIndex
from simxns_tpu.parallel import create_mesh
from simxns_tpu.parallel.sync import force_sync
from simxns_tpu.parallel.watchdog import (
    StallError, retry_on_stall, run_with_deadline)


# ---------------------------------------------------------------- primitive


def test_deadline_fast_path_returns_value():
    assert run_with_deadline(lambda: 42, deadline_s=5.0) == 42


def test_deadline_none_disables_watchdog():
    # no worker thread at all — the direct-call path
    assert run_with_deadline(lambda: "x", deadline_s=None) == "x"


def test_deadline_propagates_exceptions():
    def boom():
        raise ValueError("inner")

    with pytest.raises(ValueError, match="inner"):
        run_with_deadline(boom, deadline_s=5.0)


def test_deadline_retry_recovers_from_one_stall():
    calls = []

    def stalls_once():
        calls.append(time.monotonic())
        if len(calls) == 1:
            time.sleep(1.0)      # past the deadline — abandoned worker
            return "slow"
        return "fast"

    out = run_with_deadline(stalls_once, deadline_s=0.15, retries=2,
                            backoff_s=0.0, desc="test sync")
    assert out == "fast"
    assert len(calls) == 2


def test_deadline_raises_stallerror_when_all_attempts_stall():
    def always_stalls():
        time.sleep(0.8)

    t0 = time.monotonic()
    with pytest.raises(StallError, match="wedged"):
        run_with_deadline(always_stalls, deadline_s=0.1, retries=1,
                          backoff_s=0.0, desc="doomed sync")
    # bounded: 2 attempts x 0.1 s deadline, not 2 x 0.8 s of sleeping
    assert time.monotonic() - t0 < 0.7


def test_retry_on_stall_reruns_phase_and_calls_cleanup():
    attempts = []
    cleanups = []

    def phase():
        attempts.append(1)
        if len(attempts) == 1:
            raise StallError("index build", 0.1, 2)
        return "built"

    assert retry_on_stall(phase, attempts=2, cleanup=lambda:
                          cleanups.append(1)) == "built"
    assert len(attempts) == 2 and len(cleanups) == 1


def test_retry_on_stall_propagates_final_stall():
    def phase():
        raise StallError("index build", 0.1, 2)

    with pytest.raises(StallError):
        retry_on_stall(phase, attempts=2)


def test_retry_on_stall_does_not_catch_other_errors():
    def phase():
        raise RuntimeError("not a stall")

    with pytest.raises(RuntimeError, match="not a stall"):
        retry_on_stall(phase, attempts=3)


# ------------------------------------------------------------------ in situ


def _toy_encode(params, ids, mask):
    emb = params[ids]
    m = mask[..., None].astype(jnp.float32)
    return (emb * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)


def _toy_encode_np(table, ids):
    mask = (ids != 0).astype(np.float32)[..., None]
    emb = table[ids] * mask
    return emb.sum(1) / np.maximum(mask.sum(1), 1e-9)


def test_build_streaming_survives_one_stalled_sync(monkeypatch):
    """A sync that stalls ONCE mid-build is re-probed and the build
    completes with a correct index (the fake models a transient relay
    hiccup: the first probe blocks past the deadline, the re-issued one
    finds the session drained)."""
    mesh = create_mesh()
    rng = np.random.default_rng(23)
    table = rng.standard_normal((40, 8)).astype(np.float32)
    ids = rng.integers(1, 40, size=(64, 6)).astype(np.int32)

    stalled = []

    def flaky_sync(*trees):
        if not stalled:
            stalled.append(1)
            time.sleep(1.0)      # first probe wedges past the deadline
        return force_sync(*trees)

    monkeypatch.setattr(engine_mod, "force_sync", flaky_sync)
    index = MIPSIndex(mesh, block_size=8, store_dtype=jnp.int8,
                      stall_timeout_s=0.2, stall_retries=2,
                      sync_rows=32)      # periodic syncs mid-build too
    index.build_streaming(_toy_encode, jnp.asarray(table), ids,
                          chunk_size=16)
    assert stalled                        # the stall actually happened
    q = rng.standard_normal((4, 8)).astype(np.float32)
    _, got = index.search(q, 5)
    oracle = MIPSIndex(mesh, block_size=8, store_dtype=jnp.int8)
    oracle.build(_toy_encode_np(table, ids))
    _, want = oracle.search(q, 5)
    np.testing.assert_array_equal(got, want)


def test_build_streaming_raises_bounded_stallerror(monkeypatch):
    """A session that never drains raises StallError in bounded time
    instead of wedging — the caller (run.py mine()) then aborts and
    rebuilds the phase via retry_on_stall."""
    mesh = create_mesh()
    rng = np.random.default_rng(24)
    table = rng.standard_normal((40, 8)).astype(np.float32)
    ids = rng.integers(1, 40, size=(32, 6)).astype(np.int32)

    monkeypatch.setattr(engine_mod, "force_sync",
                        lambda *trees: time.sleep(0.6))
    index = MIPSIndex(mesh, block_size=8, store_dtype=jnp.int8,
                      stall_timeout_s=0.1, stall_retries=1)
    t0 = time.monotonic()
    with pytest.raises(StallError, match="build_streaming"):
        index.build_streaming(_toy_encode, jnp.asarray(table), ids,
                              chunk_size=16)
    assert time.monotonic() - t0 < 2.0


def test_corpus_encoder_pulls_bounded(monkeypatch):
    """iter_r5d wedged in the QUERY encode — the one mine sub-phase whose
    result pulls were unbounded. Every CorpusEncoder drain must now route
    through run_with_deadline with the configured knobs."""
    import jax.numpy as jnp
    import numpy as np

    import simxns_tpu.index.engine as eng
    from simxns_tpu.parallel import create_mesh

    calls = []
    orig = eng.run_with_deadline

    def spy(fn, deadline_s, desc="", retries=2):
        calls.append((deadline_s, retries, desc))
        return orig(fn, None)

    monkeypatch.setattr(eng, "run_with_deadline", spy)
    mesh = create_mesh()
    table = np.random.default_rng(0).standard_normal((32, 8)).astype(
        np.float32)

    def toy(params, ids, mask):
        e = params[ids] * mask[..., None].astype(jnp.float32)
        return e.sum(1)

    enc = eng.CorpusEncoder(toy, mesh, chunk_size=8,
                            stall_timeout_s=123.0, stall_retries=5)
    ids = np.random.default_rng(1).integers(0, 32, (24, 4)).astype(np.int32)
    out = enc(jnp.asarray(table), ids, np.ones_like(ids))
    assert out.shape == (24, 8)
    assert calls and all(c[:2] == (123.0, 5) for c in calls)
    assert "encode pull" in calls[0][2]
