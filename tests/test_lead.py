import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simxns_tpu.losses.lead import (
    batchmean_kl, pair_kl, grouped_slice, layer_scores_from_cls,
    layer_score_distill_loss, query_doc_attention_maps, virt_loss,
    select_layers)
from simxns_tpu.models import (
    BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder, CrossEncoderConfig,
    ColBERT, ColBERTConfig)
from simxns_tpu.parallel import create_mesh, shard_batch
from simxns_tpu.train import TrainState, make_adamw, LeadConfig, make_lead_step

CFG = BertConfig.tiny(vocab_size=256)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_batchmean_kl_matches_torch_convention():
    rng = np.random.default_rng(0)
    s = rng.normal(size=(4, 6)).astype(np.float32)
    t = rng.normal(size=(4, 6)).astype(np.float32)
    log_s = np.log(_softmax(s))
    p_t = _softmax(t)
    want = float((p_t * (np.log(p_t) - log_s)).sum() / 4)
    got = float(batchmean_kl(jnp.asarray(log_s), jnp.asarray(p_t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # pair_kl with temperature on the teacher side only
    want2 = float((_softmax(t / 2) * (np.log(_softmax(t / 2)) - log_s)).sum() / 4)
    np.testing.assert_allclose(float(pair_kl(s, t, 2.0)), want2, rtol=1e-5)


def test_grouped_slice():
    scores = jnp.arange(2 * 6, dtype=jnp.float32).reshape(2, 6)
    out = grouped_slice(scores, 3)  # q0 -> cols 0..2, q1 -> cols 3..5
    np.testing.assert_array_equal(np.asarray(out), [[0, 1, 2], [9, 10, 11]])


def test_layer_score_distill_reweighting():
    """Layers where the teacher ranks gold higher must get larger weight."""
    rng = np.random.default_rng(1)
    q, c = 8, 4
    target = jnp.zeros(q, jnp.int32)
    # teacher layer 0: confident & correct; layer 1: garbage
    good = np.full((q, c), -3.0); good[:, 0] = 3.0
    bad = rng.normal(size=(q, c)) * 0.1
    t_scores = jnp.asarray(np.stack([good, bad]), jnp.float32)
    s_scores = jnp.asarray(rng.normal(size=(2, q, c)), jnp.float32)
    # small layer_temperature sharpens the weighting -> layer 0 dominates
    loss_rw, per = layer_score_distill_loss(t_scores, s_scores, target,
                                            reweight=True,
                                            layer_temperature=0.1)
    np.testing.assert_allclose(float(loss_rw), float(per[0]), rtol=0.05)
    # at T=1 the weights follow softmax(-nll): hand-computed oracle
    loss_t1, per_t1 = layer_score_distill_loss(t_scores, s_scores, target,
                                               reweight=True,
                                               layer_temperature=1.0)
    t_np = np.asarray(t_scores)
    nll = np.stack([-np.log(_softmax(t_np[l]))[:, 0].mean() for l in range(2)])
    w = _softmax(-nll[None])[0]
    np.testing.assert_allclose(float(loss_t1),
                               float((w * np.asarray(per_t1)).sum()), rtol=1e-5)
    loss_flat, per2 = layer_score_distill_loss(t_scores, s_scores, target,
                                               reweight=False, distill_para=1.0)
    np.testing.assert_allclose(float(loss_flat), float(per2.sum()), rtol=1e-5)
    # teacher gets no gradient
    g = jax.grad(lambda t: layer_score_distill_loss(
        t, s_scores, target)[0])(t_scores)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_attention_maps_masking_and_virt():
    rng = np.random.default_rng(2)
    L, Q, D, Sq, Sd, H = 2, 2, 3, 4, 5, 8
    qh = jnp.asarray(rng.normal(size=(L, Q, Sq, H)), jnp.float32)
    dh = jnp.asarray(rng.normal(size=(L, D, Sd, H)), jnp.float32)
    q_len = jnp.asarray([2, 4])
    d_len = jnp.asarray([5, 3, 1])
    maps = query_doc_attention_maps(qh, dh, q_len, d_len)
    assert maps.shape == (L, Q, D, Sq, Sd)
    m = np.asarray(maps)
    # rows sum to 1 (softmax over doc tokens)
    np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-5)
    # masked doc tokens get ~0 probability for valid query rows
    assert m[0, 0, 1, 0, 3:].max() < 1e-6   # doc 1 has 3 valid tokens
    # fully-masked query rows become uniform -> identical for any hiddens,
    # so they contribute 0 to the virt MSE
    qh2 = qh.at[:, 0, 3].set(123.0)  # query 0 row 3 is beyond q_len=2
    maps2 = query_doc_attention_maps(qh2, dh, q_len, d_len)
    assert float(virt_loss(maps, maps2)) < 1e-10
    # oracle: virt normalization sum/L/Q/D * para
    delta = maps + 0.01
    want = float((0.01 ** 2) * np.prod(m.shape) / L / Q / D * 2.0)
    np.testing.assert_allclose(float(virt_loss(maps, delta, 2.0)), want,
                               rtol=1e-4)


def test_select_layers_modes():
    rng = np.random.default_rng(3)
    s, t = select_layers(rng, 6, 12, 4, "random")
    assert len(s) == len(t) == 4 and s == sorted(s)
    assert max(s) < 6 and max(t) < 12
    s, t = select_layers(rng, 6, 12, 5, "last")
    assert s == [1, 2, 3, 4, 5] and t == [7, 8, 9, 10, 11]
    s, t = select_layers(rng, 6, 12, 5, "skip")
    assert t == [0, 2, 4, 6, 8]


def _lead_batch(rng, n=8, m=2):
    q = rng.integers(4, 256, size=(n, 8)).astype(np.int32)
    ctx = rng.integers(4, 256, size=(n * m, 10)).astype(np.int32)
    for i in range(n):
        ctx[i * m, :4] = q[i, :4]
    return {
        "q_ids": q, "q_mask": np.ones_like(q),
        "ctx_ids": ctx, "ctx_mask": np.ones_like(ctx),
        "positive_idx": (np.arange(n) * m).astype(np.int32),
        "joint_ids": rng.integers(4, 256, size=(n, m, 14)).astype(np.int32),
        "joint_mask": np.ones((n, m, 14), np.int32),
    }


def test_ce_attention_targets_index_content_tokens():
    """Pins the (row, col) contract of the CE->student attention targets:
    teacher row 1+i (joint content query token i), col q_len+j (joint doc
    content token j, pack_joint appends ctx[1:]), valid region = content
    tokens only (len-2 each side) — the reference's [1:qlen-1]/[1:dlen-1]
    slices (LEAD/util.py:467-502)."""
    from simxns_tpu.train.lead import ce_attention_targets

    lj, heads = 12, 2
    # att[r, c] = r * 100 + c, identical per head -> mean keeps the pattern
    base = (np.arange(lj)[:, None] * 100 + np.arange(lj)[None, :]).astype(
        np.float32)
    att = np.broadcast_to(base, (1, 1, heads, lj, lj))   # [Lsel=1, B*M=1, ...]
    q_len = np.asarray([4], np.int32)       # CLS + 2 content + SEP
    d_len = np.asarray([5], np.int32)       # CLS + 3 content + SEP
    sq, sd = 3, 4
    targets, q_valid, d_valid = ce_attention_targets(
        jnp.asarray(att), jnp.asarray(q_len), jnp.asarray(d_len), sq, sd)
    t = np.asarray(targets)[0, 0]
    for i in range(sq):
        for j in range(sd):
            r = min(1 + i, lj - 1)
            c = min(int(q_len[0]) + j, lj - 1)
            assert t[i, j] == r * 100 + c, (i, j)
    np.testing.assert_array_equal(np.asarray(q_valid)[0],
                                  [True, True, False])        # q_len-2 = 2
    np.testing.assert_array_equal(np.asarray(d_valid)[0],
                                  [True, True, True, False])  # d_len-2 = 3


def test_lead_step_four_models():
    mesh = create_mesh()
    rng = np.random.default_rng(4)
    batch = _lead_batch(rng)
    n, m, lj = batch["joint_ids"].shape
    db = BiEncoder(BiEncoderConfig(bert=CFG.replace(num_layers=1)))
    de = BiEncoder(BiEncoderConfig(bert=CFG))
    col = ColBERT(ColBERTConfig(bert=CFG.replace(num_layers=1), dim=16))
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG, per_layer_logits=True))
    models = {"db": db, "de": de, "col": col, "ce": ce}

    def init(model, key, kind):
        if kind == "joint":
            return model.init(jax.random.PRNGKey(key),
                              batch["joint_ids"].reshape(n * m, lj)[:2],
                              batch["joint_mask"].reshape(n * m, lj)[:2])
        return model.init(jax.random.PRNGKey(key), batch["q_ids"][:2],
                          batch["q_mask"][:2], batch["ctx_ids"][:2],
                          batch["ctx_mask"][:2])

    tx = make_adamw(1e-3, total_steps=0)
    states = {
        "db": TrainState.create(init(db, 0, "pair"), tx),
        "de": TrainState.create(init(de, 1, "pair"), tx),
        "col": TrainState.create(init(col, 2, "pair"), tx),
        "ce": TrainState.create(init(ce, 3, "joint"), tx),
    }
    cfg = LeadConfig(distill_db=True, distill_de=True, distill_col=True,
                     distill_ce=True, train_db=True, train_de=True,
                     layer_score=True, attention=True)
    step = make_lead_step(models, {k: tx for k in models}, mesh, cfg,
                          num_distill_layers=1)
    dev = shard_batch(batch, mesh)
    sel_s = jnp.asarray([0], jnp.int32)
    sel_t = jnp.asarray([1], jnp.int32)
    states, metrics = step(states, dev, sel_s, sel_t)
    assert np.isfinite(float(metrics["loss"]))
    for key in ("loss_db", "loss_de", "loss_de_db_dis", "loss_db_de_dis",
                "loss_ce_db_dis", "loss_col_db_dis",
                "loss_de_db_layer_dis", "loss_ce_db_layer_dis",
                "loss_de_db_attention", "loss_ce_db_attention_map"):
        assert key in metrics, key
    # frozen models unchanged, trained models stepped
    assert int(states["db"].step) == 1 and int(states["de"].step) == 1
    assert int(states["col"].step) == 0 and int(states["ce"].step) == 0


def test_lead_step_layer_reselect_no_recompile():
    """Changing selected layers must not retrigger compilation (traced)."""
    mesh = create_mesh()
    rng = np.random.default_rng(5)
    batch = _lead_batch(rng, n=8, m=2)
    db = BiEncoder(BiEncoderConfig(bert=CFG.replace(num_layers=1)))
    de = BiEncoder(BiEncoderConfig(bert=CFG))
    tx = make_adamw(1e-3, total_steps=0)
    states = {
        "db": TrainState.create(db.init(jax.random.PRNGKey(0),
                                        batch["q_ids"][:2], batch["q_mask"][:2],
                                        batch["ctx_ids"][:2], batch["ctx_mask"][:2]), tx),
        "de": TrainState.create(de.init(jax.random.PRNGKey(1),
                                        batch["q_ids"][:2], batch["q_mask"][:2],
                                        batch["ctx_ids"][:2], batch["ctx_mask"][:2]), tx),
    }
    cfg = LeadConfig(train_db=True, layer_score=True)
    step = make_lead_step({"db": db, "de": de}, {"db": tx, "de": tx}, mesh, cfg,
                          num_distill_layers=1)
    dev = shard_batch(batch, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    states = jax.device_put(states, NamedSharding(mesh, P()))
    losses = []
    for sel in ([0], [1], [0]):
        states, metrics = step(states, dev, jnp.asarray([0], jnp.int32),
                               jnp.asarray(sel, jnp.int32))
        losses.append(float(metrics["loss"]))
    assert step._cache_size() == 1  # one compilation across re-selections
    assert all(np.isfinite(losses))
