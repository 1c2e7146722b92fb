"""PROD progressive knowledge-distillation steps.

One step factory covering the four teacher modes of
``PROD/ProD_KD/run_progressive_distill_marco.py:204-318``:

- ``dual_encoder``  — DE teacher; student and teacher both score the global
  in-batch matrix, KD over [Q, C] scores (``BiEncoderKDLoss``).
- ``cross_encoder`` — frozen CE teacher over (1+n) groups
  (``CrossBERTKDLoss``), optional LwF term against a frozen copy of the
  student at init (``:84-86,294-306``).
- ``colbert``       — ColBERT teacher, full-cross MaxSim scores
  (``ColBERTKDLoss``).
- ``double``        — DE + CE teachers; per-step the *larger* loss wins
  (``:227-234``).

The progressive schedule itself (12L->6L, data refresh between stages,
dataset division) is host-level: see :mod:`simxns_tpu.data.division` and the
PROD pipeline driver.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from simxns_tpu.losses.contrastive import in_batch_nll
from simxns_tpu.losses.distill import (
    bi_logit_loss, colbert_teacher_scores, dkd_loss, kd_logit_mse_loss,
    kd_softmax_loss, prob_loss)
from simxns_tpu.parallel.mesh import dp_axes
from simxns_tpu.train.steps import sharding_kwargs


def soft_kd_loss(kd_type: str, student_scores, teacher_scores, target_idx,
                 temperature: float, dkd_alpha: float = 1.0,
                 dkd_beta: float = 1.0):
    """Dispatch on the reference's ``KD_type`` flag."""
    if kd_type == "KD_softmax":
        return kd_softmax_loss(student_scores, teacher_scores, temperature)
    if kd_type == "KD_logit":
        return kd_logit_mse_loss(student_scores, teacher_scores)
    if kd_type == "DKD":
        return dkd_loss(student_scores, teacher_scores, target_idx,
                        dkd_alpha, dkd_beta, temperature)
    if kd_type == "prob_loss":
        return prob_loss(student_scores, teacher_scores, temperature)
    raise ValueError(f"unknown KD_type {kd_type!r}")


def make_ce_kd_step(
    student_ce,
    tx: optax.GradientTransformation,
    mesh,
    kd_type: str = "KD_softmax",
    temperature: float = 1.0,
    ce_weight: float = 1.0,
    kd_weight: float = 1.0,
    teacher_ce=None,
) -> Callable:
    """CE -> CE distillation (``Cross2CrossKDLoss``, the 24L->12L reranker
    compression stage of PROD): grouped hard CE at column 0 plus soft KD
    between the two rerankers' group logits.

    ``step(student_state, teacher_params, batch) -> (state, metrics)``.
    """

    def loss_fn(params, t_params, batch):
        n, m, lj = batch["joint_ids"].shape
        flat_ids = batch["joint_ids"].reshape(n * m, lj)
        flat_mask = batch["joint_mask"].reshape(n * m, lj)
        s_out = student_ce.apply(params, flat_ids, flat_mask, group_size=m,
                                 deterministic=True)
        t_out = teacher_ce.apply(t_params, flat_ids, flat_mask, group_size=m,
                                 deterministic=True)
        s_logits = s_out["logits"]
        t_logits = jax.lax.stop_gradient(t_out["logits"])
        logp = jax.nn.log_softmax(s_logits.astype(jnp.float32), axis=1)
        hard = -logp[:, 0].mean()
        soft = soft_kd_loss(kd_type, s_logits, t_logits,
                            jnp.zeros((n,), jnp.int32), temperature)
        correct = jnp.sum((jnp.argmax(s_logits, 1) == 0).astype(jnp.int32))
        return ce_weight * hard + kd_weight * soft, {
            "hard_loss": hard, "soft_loss": soft, "correct": correct}

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(dp_axes(mesh)))

    def step(state, teacher_params, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, teacher_params, batch)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **aux}

    return jax.jit(step, **sharding_kwargs(mesh, (repl, repl, shard),
                                            (repl, repl)))


def make_kd_step(
    student_model,
    tx: optax.GradientTransformation,
    mesh,
    teacher_type: str,                      # dual_encoder|cross_encoder|colbert|double
    kd_type: str = "KD_softmax",
    temperature: float = 1.0,
    ce_weight: float = 0.0,
    kd_weight: float = 1.0,
    lwf_weight: float = 0.0,
    dkd_alpha: float = 1.0,
    dkd_beta: float = 1.0,
    de_teacher_model=None,
    ce_teacher_model=None,
    colbert_teacher_model=None,
) -> Callable:
    """Returns ``step(student_state, teacher_params, batch) ->
    (student_state, metrics)``.

    ``teacher_params`` is a dict with keys among
    ``{"de", "ce", "colbert", "student_init"}`` (all frozen).
    Batch layout matches :mod:`simxns_tpu.data.datasets`; for
    ``dual_encoder``/``colbert`` modes the loss runs over the full in-batch
    [Q, C] matrix, for ``cross_encoder`` over [N, M] groups.
    """

    def student_forward(params, batch):
        return student_model.apply(
            params, batch["q_ids"], batch["q_mask"],
            batch["ctx_ids"], batch["ctx_mask"], deterministic=True)

    def in_batch_scores(q, ctx):
        return jnp.einsum("qh,ch->qc", q, ctx,
                          preferred_element_type=jnp.float32)

    def grouped_scores(q, ctx):
        groups = ctx.reshape(q.shape[0], -1, q.shape[1])
        return jnp.einsum("bh,bmh->bm", q, groups,
                          preferred_element_type=jnp.float32)

    def de_branch(params, teacher_params, batch):
        q, ctx = student_forward(params, batch)
        s_scores = in_batch_scores(q, ctx)
        hard, correct = in_batch_nll(q, ctx, batch["positive_idx"])
        t_q, t_ctx = de_teacher_model.apply(
            teacher_params["de"], batch["q_ids"], batch["q_mask"],
            batch["ctx_ids"], batch["ctx_mask"], deterministic=True)
        t_scores = jax.lax.stop_gradient(in_batch_scores(t_q, t_ctx))
        if kd_type == "Bi_logit":
            soft = bi_logit_loss(q, ctx, t_q, t_ctx)
        else:
            soft = soft_kd_loss(kd_type, s_scores, t_scores,
                                batch["positive_idx"], temperature,
                                dkd_alpha, dkd_beta)
        return hard, soft, correct

    def ce_branch(params, teacher_params, batch):
        q, ctx = student_forward(params, batch)
        s_scores = grouped_scores(q, ctx)
        n, m = s_scores.shape
        zeros = jnp.zeros((n,), jnp.int32)
        logp = jax.nn.log_softmax(s_scores, axis=1)
        hard = -logp[:, 0].mean()
        correct = jnp.sum((jnp.argmax(s_scores, 1) == 0).astype(jnp.int32))
        lj = batch["joint_ids"].shape[-1]
        ce_out = ce_teacher_model.apply(
            teacher_params["ce"], batch["joint_ids"].reshape(n * m, lj),
            batch["joint_mask"].reshape(n * m, lj), group_size=m,
            deterministic=True)
        t_scores = jax.lax.stop_gradient(ce_out["logits"])
        soft = soft_kd_loss(kd_type, s_scores, t_scores, zeros, temperature,
                            dkd_alpha, dkd_beta)
        # LwF is an INDEPENDENT term in the reference (CrossBERTKDLoss:
        # CE_WEIGHT*hard + KD_WEIGHT*soft + LwF_WEIGHT*lwf) — returned
        # separately so kd_weight=0 doesn't zero it and soft_loss
        # telemetry stays pure
        lwf = jnp.asarray(0.0, jnp.float32)
        if lwf_weight and "student_init" in teacher_params:
            o_q, o_ctx = student_model.apply(
                teacher_params["student_init"], batch["q_ids"],
                batch["q_mask"], batch["ctx_ids"], batch["ctx_mask"],
                deterministic=True)
            o_scores = jax.lax.stop_gradient(grouped_scores(o_q, o_ctx))
            lwf = soft_kd_loss(kd_type, s_scores, o_scores, zeros,
                               temperature, dkd_alpha, dkd_beta)
        return hard, soft, lwf, correct

    def colbert_branch(params, teacher_params, batch):
        q, ctx = student_forward(params, batch)
        s_scores = in_batch_scores(q, ctx)
        hard, correct = in_batch_nll(q, ctx, batch["positive_idx"])
        t_q = colbert_teacher_model.apply(
            teacher_params["colbert"], batch["q_ids"], batch["q_mask"],
            method="encode_query", deterministic=True)
        t_ctx = colbert_teacher_model.apply(
            teacher_params["colbert"], batch["ctx_ids"], batch["ctx_mask"],
            method="encode_doc", deterministic=True)
        t_scores = colbert_teacher_scores(t_q, t_ctx, batch["ctx_mask"])
        soft = soft_kd_loss(kd_type, s_scores, t_scores,
                            batch["positive_idx"], temperature,
                            dkd_alpha, dkd_beta)
        return hard, soft, correct

    def loss_fn(params, teacher_params, batch):
        if teacher_type == "dual_encoder":
            hard, soft, correct = de_branch(params, teacher_params, batch)
        elif teacher_type == "cross_encoder":
            hard, soft, lwf, correct = ce_branch(params, teacher_params,
                                                 batch)
            loss = ce_weight * hard + kd_weight * soft + lwf_weight * lwf
            return loss, {"hard_loss": hard, "soft_loss": soft,
                          "lwf_loss": lwf, "correct": correct}
        elif teacher_type == "colbert":
            hard, soft, correct = colbert_branch(params, teacher_params, batch)
        elif teacher_type == "double":
            h1, s1, c1 = de_branch(params, teacher_params, batch)
            h2, s2, lwf2, c2 = ce_branch(params, teacher_params, batch)
            l1 = ce_weight * h1 + kd_weight * s1
            l2 = ce_weight * h2 + kd_weight * s2 + lwf_weight * lwf2
            # reference picks the max loss of the two teachers (:227-234)
            # and reports the picked teacher's metrics
            pick_ce = l2 > l1
            loss = jnp.maximum(l1, l2)
            return loss, {"hard_loss": jnp.where(pick_ce, h2, h1),
                          "soft_loss": jnp.where(pick_ce, s2, s1),
                          "correct": jnp.where(pick_ce, c2, c1),
                          "teacher_pick": pick_ce.astype(jnp.int32)}
        else:
            raise ValueError(f"unknown teacher_type {teacher_type!r}")
        loss = ce_weight * hard + kd_weight * soft
        return loss, {"hard_loss": hard, "soft_loss": soft, "correct": correct}

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(dp_axes(mesh)))

    def step(state, teacher_params, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, teacher_params, batch)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **aux}

    return jax.jit(step, **sharding_kwargs(mesh, (repl, repl, shard),
                                            (repl, repl)))
