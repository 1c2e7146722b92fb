"""Numerical parity against the reference's OWN loss implementations.

These tests import the untouched PyTorch loss classes from the read-only
reference checkout and compare them with our JAX losses on identical random
inputs — the strongest available check for SURVEY.md §7.4 hard part 4
("numerical parity"). Skipped when the reference tree isn't mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def prod_models():
    sys.path.insert(0, os.path.join(REF, "PROD", "ProD_KD"))
    import model.models as m  # noqa: E402

    yield m
    sys.path.pop(0)


def _args(**kw):
    ns = types.SimpleNamespace(
        KD_type="KD_softmax", TEMPERATURE=2.0, CE_WEIGHT=1.0, KD_WEIGHT=1.0,
        DKD_alpha=1.0, DKD_beta=2.0, LwF_WEIGHT=0.5)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


def test_biencoder_kd_softmax_parity(prod_models):
    """BiEncoderKDLoss KD_softmax+hard vs our in_batch_nll + kd_softmax."""
    import jax.numpy as jnp

    from simxns_tpu.losses import in_batch_nll
    from simxns_tpu.losses.distill import kd_softmax_loss, mixed_kd_loss

    q = _rand(4, 8, seed=1)
    c = _rand(8, 8, seed=2)
    tq = _rand(4, 8, seed=3)
    tc = _rand(8, 8, seed=4)
    pos = [0, 2, 4, 6]

    ref_loss, ref_correct = prod_models.BiEncoderKDLoss().calc(
        _args(), torch.tensor(q), torch.tensor(c), torch.tensor(tq),
        torch.tensor(tc), pos)

    hard, correct = in_batch_nll(jnp.asarray(q), jnp.asarray(c),
                                 jnp.asarray(pos))
    soft = kd_softmax_loss(jnp.einsum("qh,ch->qc", q, c),
                           jnp.einsum("qh,ch->qc", tq, tc), temperature=2.0)
    ours = mixed_kd_loss(hard, soft, ce_weight=1.0, kd_weight=1.0)
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)
    assert int(correct) == int(ref_correct)


def test_biencoder_kd_logit_and_bilogit_parity(prod_models):
    import jax.numpy as jnp

    from simxns_tpu.losses import in_batch_nll
    from simxns_tpu.losses.distill import (bi_logit_loss, kd_logit_mse_loss,
                                           mixed_kd_loss)

    q, c = _rand(4, 8, seed=5), _rand(8, 8, seed=6)
    tq, tc = _rand(4, 8, seed=7), _rand(8, 8, seed=8)
    pos = [1, 3, 5, 7]
    for kd_type in ("KD_logit", "Bi_logit"):
        ref_loss, _ = prod_models.BiEncoderKDLoss().calc(
            _args(KD_type=kd_type), torch.tensor(q), torch.tensor(c),
            torch.tensor(tq), torch.tensor(tc), pos)
        hard, _ = in_batch_nll(jnp.asarray(q), jnp.asarray(c),
                               jnp.asarray(pos))
        if kd_type == "KD_logit":
            soft = kd_logit_mse_loss(jnp.einsum("qh,ch->qc", q, c),
                                     jnp.einsum("qh,ch->qc", tq, tc))
        else:
            soft = bi_logit_loss(jnp.asarray(q), jnp.asarray(c),
                                 jnp.asarray(tq), jnp.asarray(tc))
        ours = mixed_kd_loss(hard, soft, 1.0, 1.0)
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5,
                                   err_msg=kd_type)


def test_dkd_parity(prod_models):
    import jax.numpy as jnp

    from simxns_tpu.losses.distill import dkd_loss

    s = _rand(4, 6, seed=9)
    t = _rand(4, 6, seed=10)
    target = torch.zeros(4, dtype=torch.long)
    ref = prod_models.BiEncoderKDLoss.dkd_loss(
        torch.tensor(s), torch.tensor(t), target, 1.0, 2.0, 2.0)
    ours = dkd_loss(jnp.asarray(s), jnp.asarray(t),
                    jnp.zeros(4, jnp.int32), alpha=1.0, beta=2.0,
                    temperature=2.0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_crossbert_kd_parity(prod_models):
    """CE-teacher KD incl. LwF term vs our grouped pipeline."""
    import jax.numpy as jnp

    from simxns_tpu.losses.distill import kd_softmax_loss

    n, m, h = 4, 3, 8
    q = _rand(n, h, seed=11)
    c = _rand(n * m, h, seed=12)
    rel = _rand(n, m, seed=13)
    oq = _rand(n, h, seed=14)
    oc = _rand(n * m, h, seed=15)

    ref_loss, _ = prod_models.CrossBERTKDLoss().calc(
        _args(), torch.tensor(q), torch.tensor(c), torch.tensor(rel),
        LwF=True, ori_q_vector=torch.tensor(oq),
        ori_ctx_vectors=torch.tensor(oc))

    def grouped(qv, cv):
        return jnp.einsum("bh,bmh->bm", jnp.asarray(qv),
                          jnp.asarray(cv).reshape(n, m, h))

    import jax

    s_scores = grouped(q, c)
    o_scores = grouped(oq, oc)
    hard = -jax.nn.log_softmax(s_scores, axis=1)[:, 0].mean()
    soft = kd_softmax_loss(s_scores, jnp.asarray(rel), temperature=2.0)
    lwf = kd_softmax_loss(s_scores, o_scores, temperature=2.0)
    ours = 1.0 * hard + 1.0 * soft + 0.5 * lwf
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)


def test_ar2_loss_parity_vs_reference_formula():
    """AR2 retriever loss vs a torch transcription of the reference's step
    body (co_training_wiki_train.py:194-227, which lives inline in train())."""
    import jax.numpy as jnp

    from simxns_tpu.losses.distill import ar2_retriever_loss

    B, M = 4, 5
    retr = _rand(B, M, seed=16)
    rel = _rand(B, M, seed=17)
    T, lam, eps = 2.0, 0.3, 1e-7

    rs = torch.tensor(retr)
    rl = torch.tensor(rel)
    retr_p = torch.softmax(rs, dim=1)
    rer_p = torch.softmax(rl / T, dim=1)
    normal = (-rer_p * torch.log(retr_p + eps)).sum() / B
    pos = rl[:, :1].expand(rl.size())
    reward = torch.log(torch.softmax(torch.stack((pos, rl), -1), 2)[:, :, 0]
                       + eps)
    adv = (reward * torch.log(retr_p + eps)).sum()
    ref = lam * adv + (1 - lam) * normal

    ours, _ = ar2_retriever_loss(jnp.asarray(retr), jnp.asarray(rel),
                                 temperature=T, adv_lambda=lam)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_simans_sampler_distribution_parity():
    """Our sampler vs the reference's literal random.choices union loop
    (util_wiki.py:613-640): same selection distribution within tolerance."""
    import math
    import random

    from simxns_tpu.data.sampling import sample_hard_negatives

    ids = list(range(12))
    scores = [float(i) for i in range(12)]
    pos_score, a, b, k = 6.0, 0.5, 0.0, 3

    def reference_draw(seed):
        rnd = random.Random(seed)
        neg_candidates, neg_scores = [], []
        for i, s in zip(ids, scores):
            neg_scores.append(math.exp(-((s - pos_score + b) ** 2) * a))
            neg_candidates.append(i)
        chosen = set()
        cands, ws = list(neg_candidates), list(neg_scores)
        while len(chosen) < k:
            chosen = chosen.union(rnd.choices(cands, weights=ws, k=k))
            cands2, ws2 = [], []
            for i, w in zip(cands, ws):
                if i not in chosen:
                    cands2.append(i)
                    ws2.append(w)
            cands, ws = cands2, ws2
        return [i for i in ids if i in chosen][:k]

    n_trials = 3000
    ref_counts = np.zeros(12)
    for s in range(n_trials):
        for i in reference_draw(s):
            ref_counts[i] += 1
    ours_counts = np.zeros(12)
    rng = np.random.default_rng(0)
    for _ in range(n_trials):
        for i in sample_hard_negatives(ids, scores, pos_score, k, rng,
                                       mode="quadratic", a=a, b=b):
            ours_counts[i] += 1
    ref_p = ref_counts / ref_counts.sum()
    our_p = ours_counts / ours_counts.sum()
    np.testing.assert_allclose(our_p, ref_p, atol=0.02)
