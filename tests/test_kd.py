import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simxns_tpu.models import (
    BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder, CrossEncoderConfig,
    ColBERT, ColBERTConfig)
from simxns_tpu.parallel import create_mesh, shard_batch
from simxns_tpu.train import TrainState, make_adamw, make_kd_step
from simxns_tpu.data.division import (
    divide_data, teacher_better_qids, first_relevant_rank)

CFG = BertConfig.tiny(vocab_size=256)


def _batch(rng, n=16, m=3):
    q = rng.integers(4, 256, size=(n, 8)).astype(np.int32)
    ctx = rng.integers(4, 256, size=(n * m, 12)).astype(np.int32)
    for i in range(n):
        ctx[i * m, :4] = q[i, :4]
    return {
        "q_ids": q, "q_mask": np.ones_like(q),
        "ctx_ids": ctx, "ctx_mask": np.ones_like(ctx),
        "positive_idx": (np.arange(n) * m).astype(np.int32),
        "joint_ids": rng.integers(4, 256, size=(n, m, 16)).astype(np.int32),
        "joint_mask": np.ones((n, m, 16), np.int32),
    }


def _init_models(batch):
    n, m, lj = batch["joint_ids"].shape
    student = BiEncoder(BiEncoderConfig(bert=CFG))
    teacher_de = BiEncoder(BiEncoderConfig(bert=CFG.replace(num_layers=2)))
    teacher_ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    s_params = student.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                            batch["q_mask"][:2], batch["ctx_ids"][:2],
                            batch["ctx_mask"][:2])
    t_de = teacher_de.init(jax.random.PRNGKey(1), batch["q_ids"][:2],
                           batch["q_mask"][:2], batch["ctx_ids"][:2],
                           batch["ctx_mask"][:2])
    t_ce = teacher_ce.init(jax.random.PRNGKey(2),
                           batch["joint_ids"].reshape(n * m, lj)[:2],
                           batch["joint_mask"].reshape(n * m, lj)[:2])
    return student, teacher_de, teacher_ce, s_params, t_de, t_ce


@pytest.mark.parametrize("kd_type", ["KD_softmax", "KD_logit", "DKD", "Bi_logit"])
def test_de_teacher_kd_step(kd_type):
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    student, teacher_de, _, s_params, t_de, _ = _init_models(batch)
    tx = make_adamw(1e-3, total_steps=0)
    state = TrainState.create(s_params, tx)
    step = make_kd_step(student, tx, mesh, "dual_encoder", kd_type=kd_type,
                        ce_weight=1.0, kd_weight=1.0, temperature=2.0,
                        de_teacher_model=teacher_de)
    dev = shard_batch({k: v for k, v in batch.items()
                       if not k.startswith("joint")}, mesh)
    losses = []
    for _ in range(4):
        state, metrics = step(state, {"de": t_de}, dev)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ce_teacher_kd_with_lwf():
    mesh = create_mesh()
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    student, _, teacher_ce, s_params, _, t_ce = _init_models(batch)
    tx = make_adamw(1e-3, total_steps=0)
    init_copy = jax.tree.map(jnp.copy, s_params)   # LwF frozen copy at init
    state = TrainState.create(s_params, tx)
    step = make_kd_step(student, tx, mesh, "cross_encoder",
                        kd_type="KD_softmax", ce_weight=1.0, kd_weight=1.0,
                        lwf_weight=0.5, ce_teacher_model=teacher_ce)
    dev = shard_batch(batch, mesh)
    teachers = {"ce": t_ce, "student_init": init_copy}
    losses = []
    for _ in range(4):
        state, metrics = step(state, teachers, dev)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_ce_teacher_kd_with_int8_teacher_view():
    """KD teachers are frozen, so the CE teacher forward may run through
    the fused-int8 layer view (the --fast-teacher path): same param tree,
    loss close to the bf16 teacher's, student grads unaffected."""
    mesh = create_mesh()
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    student, _, teacher_ce, s_params, _, t_ce = _init_models(batch)
    teacher_int8 = CrossEncoder(CrossEncoderConfig(
        bert=CFG.replace(layer_impl="fused_int8")))
    tx = make_adamw(1e-3, total_steps=0)
    dev = shard_batch(batch, mesh)
    losses = {}
    for label, teacher in (("bf16", teacher_ce), ("int8", teacher_int8)):
        state = TrainState.create(jax.tree.map(jnp.copy, s_params), tx)
        step = make_kd_step(student, tx, mesh, "cross_encoder",
                            kd_type="KD_softmax", ce_weight=1.0,
                            kd_weight=1.0, ce_teacher_model=teacher)
        state, metrics = step(state, {"ce": t_ce}, dev)
        losses[label] = float(metrics["loss"])
        assert np.isfinite(losses[label])
    assert abs(losses["int8"] - losses["bf16"]) < 0.15 * abs(
        losses["bf16"]) + 0.05


def test_double_teacher_takes_max():
    mesh = create_mesh()
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    student, teacher_de, teacher_ce, s_params, t_de, t_ce = _init_models(batch)
    tx = make_adamw(1e-3, total_steps=0)
    state = TrainState.create(s_params, tx)
    step = make_kd_step(student, tx, mesh, "double", kd_type="KD_softmax",
                        ce_weight=1.0, kd_weight=1.0,
                        de_teacher_model=teacher_de,
                        ce_teacher_model=teacher_ce)
    dev = shard_batch(batch, mesh)
    state, metrics = step(state, {"de": t_de, "ce": t_ce}, dev)
    assert np.isfinite(float(metrics["loss"]))
    assert "teacher_pick" in metrics


def test_colbert_teacher_kd_step():
    mesh = create_mesh()
    rng = np.random.default_rng(3)
    batch = _batch(rng)
    student = BiEncoder(BiEncoderConfig(bert=CFG))
    colbert = ColBERT(ColBERTConfig(bert=CFG.replace(num_layers=2), dim=16))
    s_params = student.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                            batch["q_mask"][:2], batch["ctx_ids"][:2],
                            batch["ctx_mask"][:2])
    c_params = colbert.init(jax.random.PRNGKey(4), batch["q_ids"][:2],
                            batch["q_mask"][:2], batch["ctx_ids"][:2],
                            batch["ctx_mask"][:2])
    tx = make_adamw(1e-3, total_steps=0)
    state = TrainState.create(s_params, tx)
    step = make_kd_step(student, tx, mesh, "colbert", kd_type="KD_softmax",
                        ce_weight=1.0, kd_weight=1.0,
                        colbert_teacher_model=colbert)
    dev = shard_batch({k: v for k, v in batch.items()
                       if not k.startswith("joint")}, mesh)
    state, metrics = step(state, {"colbert": c_params}, dev)
    assert np.isfinite(float(metrics["loss"]))


def test_division_buckets():
    ranked = {
        "a": [1, 2, 3],        # gold 1 at rank 0 -> top1
        "b": [9, 1, 3],        # gold at rank 1 -> 2ti, 2t5, 2t10, 2t15
        "c": list(range(100, 160)),  # gold 155 at rank 55 -> 51t100
        "d": [7, 8, 9],        # gold absent -> nowhere
    }
    qrels = {"a": [1], "b": [1], "c": [155], "d": [1000]}
    div = divide_data(ranked, qrels)
    assert div["top1"] == {"a"}
    assert div["2ti"] == {"b"} and div["2t15"] == {"b"}
    assert div["51t100"] == {"c"}
    assert all("d" not in s for s in div.values())
    assert first_relevant_rank([5, 6, 7], [7]) == 2
    assert first_relevant_rank([5, 6], [9]) == -1


def test_teacher_better_selection():
    student = {"q1": [9, 1], "q2": [1, 9], "q3": [9, 8, 1]}
    teacher = {"q1": [1, 9], "q2": [1, 9], "q3": [1, 9]}
    qrels = {"q1": [1], "q2": [1], "q3": [1]}
    # student rank in 2..15 AND teacher rank == 1 -> q1, q3
    got = teacher_better_qids(student, teacher, qrels)
    assert got == {"q1", "q3"}


def test_ce_to_ce_distillation():
    """Cross2Cross: 2-layer CE student distills a 2-layer trained teacher."""
    from simxns_tpu.train import make_ce_kd_step, make_reranker_step
    mesh = create_mesh()
    rng = np.random.default_rng(6)
    batch = _batch(rng, n=8, m=3)
    n, m, lj = batch["joint_ids"].shape
    batch["joint_ids"][:, 0, 5] = 9   # learnable marker
    teacher = CrossEncoder(CrossEncoderConfig(bert=CFG))
    student = CrossEncoder(CrossEncoderConfig(bert=CFG.replace(num_layers=1)))
    t_params = teacher.init(jax.random.PRNGKey(0),
                            batch["joint_ids"].reshape(n * m, lj)[:2],
                            batch["joint_mask"].reshape(n * m, lj)[:2])
    s_params = student.init(jax.random.PRNGKey(1),
                            batch["joint_ids"].reshape(n * m, lj)[:2],
                            batch["joint_mask"].reshape(n * m, lj)[:2])
    tx = make_adamw(2e-3, total_steps=0)
    dev = shard_batch({"joint_ids": batch["joint_ids"],
                       "joint_mask": batch["joint_mask"]}, mesh)
    # warm the teacher
    t_state = TrainState.create(t_params, tx)
    t_step = make_reranker_step(teacher, tx, mesh, group_size=m)
    for _ in range(10):
        t_state, tm = t_step(t_state, dev)
    # distill
    s_state = TrainState.create(s_params, tx)
    step = make_ce_kd_step(student, tx, mesh, teacher_ce=teacher)
    losses = []
    for _ in range(10):
        s_state, sm = step(s_state, t_state.params, dev)
        losses.append(float(sm["loss"]))
    assert losses[-1] < losses[0]
    assert int(sm["correct"]) >= 6
