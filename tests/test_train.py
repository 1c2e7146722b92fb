import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simxns_tpu.models import (
    BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder, CrossEncoderConfig)
from simxns_tpu.parallel import create_mesh, shard_batch
from simxns_tpu.train import (
    TrainState, make_adamw, linear_warmup_schedule,
    make_biencoder_step, make_reranker_step, make_ar2_retriever_step,
    AR2Config, AR2CoTrainer)
from simxns_tpu.io import (save_checkpoint, restore_checkpoint, latest_step,
                           export_encoder_only)

CFG = BertConfig.tiny(vocab_size=512)


def _de_batch(rng, n=16, m=3, lq=8, lc=12):
    q = rng.integers(4, 512, size=(n, lq)).astype(np.int32)
    ctx = rng.integers(4, 512, size=(n * m, lc)).astype(np.int32)
    # make positives correlated with queries: share first tokens
    for i in range(n):
        ctx[i * m, :4] = q[i, :4]
    return {
        "q_ids": q, "q_mask": np.ones_like(q),
        "ctx_ids": ctx, "ctx_mask": np.ones_like(ctx),
        "positive_idx": (np.arange(n) * m).astype(np.int32),
        "joint_ids": rng.integers(4, 512, size=(n, m, 16)).astype(np.int32),
        "joint_mask": np.ones((n, m, 16), np.int32),
    }


def test_linear_schedule():
    sch = linear_warmup_schedule(1.0, 10, 110)
    assert float(sch(0)) == 0.0
    assert abs(float(sch(5)) - 0.5) < 1e-6
    assert abs(float(sch(10)) - 1.0) < 1e-6
    assert abs(float(sch(60)) - 0.5) < 1e-6
    assert float(sch(110)) == 0.0


def test_adamw_decay_mask():
    from simxns_tpu.train.optim import _decay_mask
    params = {"layer_0": {"attention": {"query": {"kernel": np.ones(2),
                                                  "bias": np.ones(2)},
                                        "output_layer_norm": {"scale": np.ones(2),
                                                              "bias": np.ones(2)}}}}
    mask = _decay_mask(params)
    leaf = mask["layer_0"]["attention"]
    assert leaf["query"]["kernel"] is True
    assert leaf["query"]["bias"] is False
    assert leaf["output_layer_norm"]["scale"] is False


@pytest.mark.parametrize("grad_mode", ["full", "local"])
def test_biencoder_step_trains(grad_mode):
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    model = BiEncoder(BiEncoderConfig(bert=CFG))
    batch = _de_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    tx = make_adamw(2e-3, warmup_steps=0, total_steps=0, max_grad_norm=1.0)
    state = TrainState.create(params, tx)
    step = make_biencoder_step(model, tx, mesh, grad_mode=grad_mode)
    dev = shard_batch({k: v for k, v in batch.items()
                       if k not in ("joint_ids", "joint_mask")}, mesh)
    losses = []
    for _ in range(8):
        state, metrics = step(state, dev)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_grad_modes_agree_on_loss_value():
    """full and local modes share the forward value (only grads differ)."""
    mesh = create_mesh()
    rng = np.random.default_rng(1)
    model = BiEncoder(BiEncoderConfig(bert=CFG))
    batch = _de_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    tx = make_adamw(0.0, total_steps=0)
    # build both states up front: steps donate their state arg, so params
    # must not be re-wrapped after a step has consumed them
    state = TrainState.create(params, tx)
    state2 = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    dev = shard_batch({k: v for k, v in batch.items()
                       if k not in ("joint_ids", "joint_mask")}, mesh)
    _, m_full = make_biencoder_step(model, tx, mesh, "full")(state, dev)
    _, m_local = make_biencoder_step(model, tx, mesh, "local")(state2, dev)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_local["loss"]),
                               rtol=1e-5)
    assert int(m_full["correct"]) == int(m_local["correct"])


def test_reranker_step_trains():
    mesh = create_mesh()
    rng = np.random.default_rng(2)
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    batch = _de_batch(rng)
    n, m, lj = batch["joint_ids"].shape
    # plant signal: positive joints share a marker token
    batch["joint_ids"][:, 0, 5] = 9
    params = ce.init(jax.random.PRNGKey(0),
                     batch["joint_ids"].reshape(n * m, lj)[:2],
                     batch["joint_mask"].reshape(n * m, lj)[:2])
    tx = make_adamw(2e-3, total_steps=0)
    state = TrainState.create(params, tx)
    step = make_reranker_step(ce, tx, mesh, group_size=m)
    dev = shard_batch({"joint_ids": batch["joint_ids"],
                       "joint_mask": batch["joint_mask"]}, mesh)
    losses = []
    for _ in range(10):
        state, metrics = step(state, dev)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(metrics["correct"]) >= 12  # most groups solved


def test_ar2_retriever_step_runs_and_improves_kl():
    mesh = create_mesh()
    rng = np.random.default_rng(3)
    de = BiEncoder(BiEncoderConfig(bert=CFG))
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    batch = _de_batch(rng)
    n, m, lj = batch["joint_ids"].shape
    de_params = de.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    ce_params = ce.init(jax.random.PRNGKey(1),
                        batch["joint_ids"].reshape(n * m, lj)[:2],
                        batch["joint_mask"].reshape(n * m, lj)[:2])
    tx = make_adamw(2e-3, total_steps=0)
    de_state = TrainState.create(de_params, tx)
    step = make_ar2_retriever_step(de, ce, tx, mesh, temperature=1.0,
                                   adv_lambda=0.0)
    dev = shard_batch(batch, mesh)
    normals = []
    for _ in range(8):
        de_state, metrics = step(de_state, ce_params, dev)
        normals.append(float(metrics["normal_loss"]))
    assert normals[-1] < normals[0]  # retriever matches reranker distribution


def test_ar2_retriever_step_with_int8_teacher_view():
    """The frozen-teacher forward may run through the fused-int8 layer view
    (encode-only composition): same param tree, loss close to the bf16
    teacher, retriever grads still flow (the quantized-under-grad guard
    must NOT fire — the teacher path carries no JVP tracer)."""
    mesh = create_mesh()
    rng = np.random.default_rng(7)
    de = BiEncoder(BiEncoderConfig(bert=CFG))
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    ce_int8 = CrossEncoder(CrossEncoderConfig(
        bert=CFG.replace(layer_impl="fused_int8")))
    batch = _de_batch(rng)
    n, m, lj = batch["joint_ids"].shape
    de_params = de.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    ce_params = ce.init(jax.random.PRNGKey(1),
                        batch["joint_ids"].reshape(n * m, lj)[:2],
                        batch["joint_mask"].reshape(n * m, lj)[:2])
    tx = make_adamw(2e-3, total_steps=0)
    dev = shard_batch(batch, mesh)
    losses = {}
    for label, teacher in (("bf16", ce), ("int8", ce_int8)):
        state = TrainState.create(jax.tree.map(jnp.copy, de_params), tx)
        step = make_ar2_retriever_step(de, teacher, tx, mesh,
                                       temperature=1.0, adv_lambda=0.0)
        state, metrics = step(state, ce_params, dev)
        losses[label] = float(metrics["loss"])
        assert np.isfinite(losses[label])
    # quantized teacher logits shift the KL target only slightly
    assert abs(losses["int8"] - losses["bf16"]) < 0.15 * abs(
        losses["bf16"]) + 0.05


class _FakeState:
    def __init__(self):
        self.params = None


def test_ar2_flag_machine():
    """Windows of iteration_step: steps 1..rr+1 reranker, rest retriever,
    refresh at boundary (reference transitions :294-306 incl. == quirk)."""
    modes = []
    refreshes = []

    class S:  # fake states
        params = None

    def rstep(state, ce_params, batch):
        modes.append("retriever")
        return state, {"loss": jnp.asarray(0.0)}

    def cstep(state, batch):
        modes.append("reranker")
        return state, {"loss": jnp.asarray(0.0)}

    def batches():
        while True:
            yield {"x": np.zeros((8, 2), np.int32)}

    mesh = create_mesh()
    cfg = AR2Config(iteration_step=10, iteration_reranker_step=3,
                    max_steps=25, log_every=1000)
    tr = AR2CoTrainer(mesh, cfg, S(), S(), rstep, cstep, batches,
                      refresh_fn=lambda s, g: refreshes.append(g))
    tr.run()
    assert len(modes) == 25
    # window 1: steps 1-4 reranker (r=0..3 <= 3), 5-10 retriever
    assert modes[:4] == ["reranker"] * 4
    assert modes[4:10] == ["retriever"] * 6
    assert modes[10:14] == ["reranker"] * 4
    assert refreshes == [10, 20]


def test_checkpoint_roundtrip(tmp_path):
    tx = make_adamw(1e-3, total_steps=0)
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    state = TrainState.create(params, tx)
    state = state.apply_gradients(
        {"dense": {"kernel": jnp.full((4, 4), 0.1), "bias": jnp.full(4, 0.1)}}, tx)
    path = save_checkpoint(str(tmp_path), state, 42)
    assert latest_step(str(tmp_path)) == 42
    zero = TrainState.create(
        {"dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)}}, tx)
    restored = restore_checkpoint(str(tmp_path), zero, 42)
    np.testing.assert_allclose(np.asarray(restored.params["dense"]["kernel"]),
                               np.asarray(state.params["dense"]["kernel"]))
    assert int(restored.step) == 1


def test_export_encoder_only():
    params = {"encoder": {"w": 1}, "c_head": {"w": 2}, "query_head": {"w": 3}}
    out = export_encoder_only(params)
    assert "encoder" in out and "c_head" not in out and "query_head" not in out


def test_dropout_training_mode():
    """dropout=True uses fresh masks per step (losses differ across repeats
    on identical data) and trains; dropout=False is deterministic."""
    mesh = create_mesh()
    rng = np.random.default_rng(9)
    cfg = CFG.replace(hidden_dropout=0.3)
    model = BiEncoder(BiEncoderConfig(bert=cfg))
    batch = _de_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    tx = make_adamw(0.0, total_steps=0)  # lr 0: params frozen, loss isolates rng
    dev = shard_batch({k: v for k, v in batch.items()
                       if k not in ("joint_ids", "joint_mask")}, mesh)

    params2 = jax.tree.map(jnp.copy, params)   # steps donate their state
    step_d = make_biencoder_step(model, tx, mesh, dropout=True)
    state = TrainState.create(params, tx)
    losses = []
    for _ in range(3):
        state, m = step_d(state, dev)
        losses.append(float(m["loss"]))
    assert len(set(np.round(losses, 6))) == 3  # fresh mask each step

    step_nd = make_biencoder_step(model, tx, mesh, dropout=False)
    state2 = TrainState.create(params2, tx)
    l_nd = []
    for _ in range(2):
        state2, m = step_nd(state2, dev)
        l_nd.append(float(m["loss"]))
    assert l_nd[0] == l_nd[1]  # deterministic without dropout


def test_attention_dropout_applies_in_train_mode():
    """attention_dropout (HF attention_probs_dropout_prob) perturbs the
    forward in train mode — fresh mask per step — and is off in eval."""
    mesh = create_mesh()
    rng = np.random.default_rng(10)
    cfg = CFG.replace(hidden_dropout=0.0, attention_dropout=0.4)
    model = BiEncoder(BiEncoderConfig(bert=cfg))
    batch = _de_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    tx = make_adamw(0.0, total_steps=0)       # lr 0 isolates the rng effect
    dev = shard_batch({k: v for k, v in batch.items()
                       if k not in ("joint_ids", "joint_mask")}, mesh)
    params2 = jax.tree.map(jnp.copy, params)
    step_d = make_biencoder_step(model, tx, mesh, dropout=True)
    state = TrainState.create(params, tx)
    losses = []
    for _ in range(3):
        state, m = step_d(state, dev)
        losses.append(float(m["loss"]))
    assert len(set(np.round(losses, 6))) == 3   # probs dropout is live
    step_nd = make_biencoder_step(model, tx, mesh, dropout=False)
    state2 = TrainState.create(params2, tx)
    l_nd = []
    for _ in range(2):
        state2, m = step_nd(state2, dev)
        l_nd.append(float(m["loss"]))
    assert l_nd[0] == l_nd[1]                   # eval mode: no attn dropout


def test_colbert_step_trains():
    from simxns_tpu.models import ColBERT, ColBERTConfig
    from simxns_tpu.train import make_colbert_step
    mesh = create_mesh()
    rng = np.random.default_rng(11)
    model = ColBERT(ColBERTConfig(bert=CFG, dim=16))
    n, m = 16, 2
    q = rng.integers(4, 512, size=(n, 8)).astype(np.int32)
    ctx = rng.integers(4, 512, size=(n * m, 10)).astype(np.int32)
    for i in range(n):
        ctx[i * m, :4] = q[i, :4]
    batch = {"q_ids": q, "q_mask": np.ones_like(q),
             "ctx_ids": ctx, "ctx_mask": np.ones_like(ctx)}
    params = model.init(jax.random.PRNGKey(0), q[:2], batch["q_mask"][:2],
                        ctx[:2], batch["ctx_mask"][:2])
    tx = make_adamw(2e-3, total_steps=0)
    state = TrainState.create(params, tx)
    step = make_colbert_step(model, tx, mesh, group_size=m)
    dev = shard_batch(batch, mesh)
    losses = []
    for _ in range(8):
        state, metrics = step(state, dev)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(metrics["correct"]) >= 12


def test_ar2_checkpoint_resume(tmp_path):
    """Step-indexed checkpoint/resume mid-co-training: a restored trainer
    continues from the same global step with identical states (the outer
    loop's load-bearing resume contract, SURVEY §5.4)."""
    mesh = create_mesh()
    rng = np.random.default_rng(12)
    de = BiEncoder(BiEncoderConfig(bert=CFG))
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    batch = _de_batch(rng, n=8, m=2)
    n, m, lj = batch["joint_ids"].shape
    de_params = de.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    ce_params = ce.init(jax.random.PRNGKey(1),
                        batch["joint_ids"].reshape(n * m, lj)[:2],
                        batch["joint_mask"].reshape(n * m, lj)[:2])
    tx = make_adamw(1e-3, total_steps=0)

    saved = {}

    def checkpoint_fn(de_state, ce_state, step):
        saved["de"] = save_checkpoint(str(tmp_path), de_state, step, "de")
        saved["ce"] = save_checkpoint(str(tmp_path), ce_state, step, "ce")

    def batches():
        while True:
            yield batch

    def make_trainer(de_state, ce_state, start_step=0):
        tr = AR2CoTrainer(
            mesh, AR2Config(iteration_step=6, iteration_reranker_step=2,
                            max_steps=100, log_every=1000),
            de_state, ce_state,
            make_ar2_retriever_step(de, ce, tx, mesh, adv_lambda=0.0),
            make_reranker_step(ce, tx, mesh, group_size=m),
            batches, checkpoint_fn=checkpoint_fn)
        tr.global_step = start_step
        return tr

    t1 = make_trainer(TrainState.create(de_params, tx),
                      TrainState.create(jax.tree.map(jnp.copy, ce_params), tx))
    t1.run(num_steps=6)   # hits the window boundary -> checkpoint at step 6
    assert latest_step(str(tmp_path), "de") == 6
    # continue the original for 4 more steps as ground truth
    t1.run(num_steps=4)
    truth_de = t1.de_state

    # resume a fresh trainer from the checkpoint
    zero_de = TrainState.create(
        jax.tree.map(jnp.zeros_like, de_params), tx)
    zero_ce = TrainState.create(
        jax.tree.map(jnp.zeros_like, ce_params), tx)
    de_restored = restore_checkpoint(str(tmp_path), zero_de, 6, "de")
    ce_restored = restore_checkpoint(str(tmp_path), zero_ce, 6, "ce")
    t2 = make_trainer(de_restored, ce_restored, start_step=6)
    t2.run(num_steps=4)
    assert t2.global_step == 10
    # identical parameters after resume (same data, deterministic steps)
    a = jax.tree.leaves(truth_de.params)
    b = jax.tree.leaves(t2.de_state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5)


def test_ar2_boundary_offload_checkpoint_fusion(tmp_path):
    """Under offload_refresh, the boundary hands checkpoint_fn the
    HostStash itself (one device->host pull serves both the HBM offload
    and the checkpoint); an Orbax artifact written from its numpy_tree()
    on a background thread must restore into a state the trainer then
    continues from bit-identically (run.py's async checkpoint closure)."""
    import threading

    from simxns_tpu.parallel.offload import HostStash

    mesh = create_mesh()
    rng = np.random.default_rng(13)
    de = BiEncoder(BiEncoderConfig(bert=CFG))
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    batch = _de_batch(rng, n=8, m=2)
    n, m, lj = batch["joint_ids"].shape
    de_params = de.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    ce_params = ce.init(jax.random.PRNGKey(1),
                        batch["joint_ids"].reshape(n * m, lj)[:2],
                        batch["joint_mask"].reshape(n * m, lj)[:2])
    tx = make_adamw(1e-3, total_steps=0)

    seen = {}
    writers = []

    def checkpoint_fn(de_state, ce_like, step):
        # the driver must pass the stash, not the (now-deleted) state
        assert isinstance(ce_like, HostStash)
        seen["step"] = step
        host = ce_like.numpy_tree()
        t = threading.Thread(target=save_checkpoint,
                             args=(str(tmp_path), host, step, "ce"))
        t.start()
        writers.append(t)

    def refresh_fn(de_state, step):
        return None   # keep the batch source; the stash round-trip is real

    def batches():
        while True:
            yield batch

    tr = AR2CoTrainer(
        mesh, AR2Config(iteration_step=6, iteration_reranker_step=2,
                        max_steps=100, log_every=1000),
        TrainState.create(de_params, tx),
        TrainState.create(ce_params, tx),
        make_ar2_retriever_step(de, ce, tx, mesh, adv_lambda=0.0),
        make_reranker_step(ce, tx, mesh, group_size=m),
        batches, refresh_fn=refresh_fn, checkpoint_fn=checkpoint_fn,
        offload_refresh=True)
    tr.run(num_steps=8)   # crosses the boundary at step 6
    assert seen["step"] == 6
    for t in writers:
        t.join()
    # the async artifact equals the trainer's reranker state AS OF step 6:
    # replay 2 more post-boundary steps from the restored state and compare
    zero = TrainState.create(jax.tree.map(jnp.zeros_like, ce_params), tx)
    restored = restore_checkpoint(str(tmp_path), zero, 6, "ce")
    cstep = make_reranker_step(ce, tx, mesh, group_size=m)
    dev = shard_batch({k: v for k, v in batch.items() if k != "answers"},
                      mesh)
    # steps 7-8 run under flag==1 (r = 0, 1 <= reranker window 2): replay
    # exactly the two reranker steps the trainer took after the checkpoint
    replay = restored
    replay, _ = cstep(replay, dev)
    replay, _ = cstep(replay, dev)
    for x, y in zip(jax.tree.leaves(replay.params),
                    jax.tree.leaves(tr.ce_state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_recall_guard_and_teacher_warmth():
    """VERDICT r2 weak #5: collapse must be loud, not silent."""
    import logging

    from simxns_tpu.train.driver import RecallGuard, check_teacher_warmth

    g = RecallGuard()
    assert g.update(0.30)
    assert g.update(0.31)          # fine
    assert not g.update(0.10)      # < 0.5x start -> collapse flagged
    assert not g.ok()              # ended below start
    g2 = RecallGuard()
    for r in (0.30, 0.25, 0.41, 0.62):
        g2.update(r)
    assert g2.ok()
    # teacher adequacy floor (measured: 8 warm steps collapse, >=48 stable)
    assert not check_teacher_warmth(8)
    assert check_teacher_warmth(64)
