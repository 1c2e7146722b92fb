"""Distillation losses (AR2 co-training + PROD KD family).

AR2 retriever loss (``SimANS/wiki/co_training_wiki_train.py:194-235``):
the retriever's softmax over its (1+n)-passage group is pulled toward the
frozen reranker's distribution, plus an optional adversarial reward term:

- ``normal_loss = -sum(p_CE * log p_DE) / B``   (:221-222, note the *sum over
  the group, mean over batch* normalization)
- ``reward[b,d] = log softmax([logit_pos, logit_d])[0]``  (:216-219)
- ``adv_loss   = sum(reward * log p_DE)``       (:224-225, summed, unscaled)
- ``loss = adv_lambda * adv + (1 - adv_lambda) * normal``  (:227)

PROD KD losses (``PROD/ProD_KD/model/models.py:970-1105``): soft targets from
a teacher over gathered in-batch scores or grouped CE logits, in four types:
``KD_softmax`` (KL * T^2), ``KD_logit`` (MSE on logits), ``DKD`` (decoupled
target/non-target), ``Bi_logit`` (embedding MSE); mixed with the hard NLL via
``CE_WEIGHT/KD_WEIGHT``. LwF adds the same KD term against a frozen copy of
the student at init (``run_progressive_distill_marco.py:84-86,294-306``).

All inputs are f32 logits/scores; ``eps = 1e-7`` matches the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7


def ar2_retriever_loss(
    retriever_scores: jax.Array,      # [B, M] q·ctx within each group
    reranker_logits: jax.Array,       # [B, M] frozen CE relevance logits
    temperature: float = 1.0,         # args.temperature_normal
    adv_lambda: float = 0.0,          # args.adv_lambda (0.5 in launchers)
    scale_scores: Optional[float] = None,   # 1/sqrt(H) if args.scale_simmila
) -> Tuple[jax.Array, dict]:
    """AR2 retriever objective. Returns (loss, aux dict)."""
    s = retriever_scores.astype(jnp.float32)
    if scale_scores is not None:
        # softmax(scores / sqrt(H)) when scale_simmila is set
        # (co_training_wiki_train.py:203-205) — callers pass 1/sqrt(H)
        s = s * scale_scores
    p_de = jax.nn.softmax(s, axis=1)

    logits = jax.lax.stop_gradient(reranker_logits.astype(jnp.float32))
    p_ce = jax.nn.softmax(logits / temperature, axis=1)

    normal = -(p_ce * jnp.log(p_de + EPS)).sum() / s.shape[0]

    pos = logits[:, :1]
    pair = jnp.stack([jnp.broadcast_to(pos, logits.shape), logits], axis=-1)
    reward = jnp.log(jax.nn.softmax(pair, axis=-1)[..., 0] + EPS)
    adv = (reward * jnp.log(p_de + EPS)).sum()

    loss = adv_lambda * adv + (1.0 - adv_lambda) * normal
    return loss, {"normal_loss": normal, "adv_loss": adv}


def kd_softmax_loss(student_logits: jax.Array, teacher_logits: jax.Array,
                    temperature: float = 1.0) -> jax.Array:
    """KL(teacher || student) at temperature T, scaled by T^2 (batchmean)."""
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32)) / temperature
    s = student_logits.astype(jnp.float32) / temperature
    p_t = jax.nn.softmax(t, axis=-1)
    kl = (p_t * (jax.nn.log_softmax(t, axis=-1) -
                 jax.nn.log_softmax(s, axis=-1))).sum(-1)
    return kl.mean() * temperature ** 2


def kd_logit_mse_loss(student_logits: jax.Array,
                      teacher_logits: jax.Array) -> jax.Array:
    """``KD_logit``: 0.5 * MSE on logits (models.py:1056-1058)."""
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32))
    return 0.5 * jnp.mean((student_logits.astype(jnp.float32) - t) ** 2)


def embedding_mse_loss(student_emb: jax.Array, teacher_emb: jax.Array) -> jax.Array:
    """0.5 * MSE on pooled embeddings (one side of ``Bi_logit``)."""
    t = jax.lax.stop_gradient(teacher_emb.astype(jnp.float32))
    return 0.5 * jnp.mean((student_emb.astype(jnp.float32) - t) ** 2)


def bi_logit_loss(student_q: jax.Array, student_ctx: jax.Array,
                  teacher_q: jax.Array, teacher_ctx: jax.Array) -> jax.Array:
    """``Bi_logit``: 0.5*MSE(q) + 0.5*MSE(ctx) on embeddings
    (models.py:1061-1067)."""
    return (embedding_mse_loss(student_q, teacher_q)
            + embedding_mse_loss(student_ctx, teacher_ctx))


def prob_loss(student_logits: jax.Array, teacher_logits: jax.Array,
              temperature: float = 1.0) -> jax.Array:
    """``prob_loss``: -softmax(teacher/T) . log softmax(student), sum over
    group, mean over batch; student is NOT temperature-scaled
    (``CrossBERTKDLoss`` models.py:739-745)."""
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32)) / temperature
    p_t = jax.nn.softmax(t, axis=1)
    p_s = jax.nn.softmax(student_logits.astype(jnp.float32), axis=1)
    return -(p_t * jnp.log(p_s + EPS)).sum() / student_logits.shape[0]


def colbert_teacher_scores(teacher_q_tokens: jax.Array,   # [Q, Sq, D]
                           teacher_ctx_tokens: jax.Array, # [P, Sd, D]
                           ctx_mask: jax.Array            # [P, Sd]
                           ) -> jax.Array:
    """ColBERT teacher score matrix for KD: full-cross MaxSim with masked doc
    tokens at -9999 (``ColBERTKDLoss`` models.py:342-348)."""
    s = jnp.einsum("qin,pjn->qipj", teacher_q_tokens, teacher_ctx_tokens,
                   preferred_element_type=jnp.float32)
    mask = ctx_mask[None, None, :, :] > 0
    s = jnp.where(mask, s, -9999.0)
    return jax.lax.stop_gradient(s.max(-1).sum(1))          # [Q, P]


def dkd_loss(student_logits: jax.Array, teacher_logits: jax.Array,
             target_idx: jax.Array, alpha: float = 1.0, beta: float = 1.0,
             temperature: float = 1.0) -> jax.Array:
    """Decoupled KD (models.py:1069-1105): split into target-class binary KD
    (TCKD) and non-target distribution KD (NCKD)."""
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32)) / temperature
    s = student_logits.astype(jnp.float32) / temperature
    n, m = s.shape
    onehot = jax.nn.one_hot(target_idx, m, dtype=jnp.float32)

    def binary_probs(logits):
        p = jax.nn.softmax(logits, axis=1)
        p_t = (p * onehot).sum(1, keepdims=True)
        return jnp.concatenate([p_t, 1.0 - p_t], axis=1)

    b_t, b_s = binary_probs(t), binary_probs(s)
    tckd = (b_t * (jnp.log(b_t + EPS) - jnp.log(b_s + EPS))).sum(1).mean()

    neg_inf = jnp.float32(-1e9)
    t_masked = jnp.where(onehot > 0, neg_inf, t)
    s_masked = jnp.where(onehot > 0, neg_inf, s)
    p_t_n = jax.nn.softmax(t_masked, axis=1)
    nckd = (p_t_n * (jax.nn.log_softmax(t_masked, axis=1) -
                     jax.nn.log_softmax(s_masked, axis=1))).sum(1).mean()
    return (alpha * tckd + beta * nckd) * temperature ** 2


def mixed_kd_loss(hard_loss: jax.Array, soft_loss: jax.Array,
                  ce_weight: float = 0.0, kd_weight: float = 1.0) -> jax.Array:
    """``CE_WEIGHT * hard + KD_WEIGHT * soft`` (models.py:1031)."""
    return ce_weight * hard_loss + kd_weight * soft_loss


def multi_teacher_kd_loss(
    student_scores: jax.Array,     # [B, M] grouped scores
    de_scores: jax.Array,          # [B, M] DE teacher
    ce12_scores: jax.Array,        # [B, M] 12L CE teacher
    ce24_scores: jax.Array,        # [B, M] 24L CE teacher
    temperature: float = 1.0,
) -> Tuple[jax.Array, dict]:
    """PROD ``UniKDLoss`` 3-teacher loss-weighted ensemble
    (``PROD/ProD_KD/model/models.py:473-560``), replicated faithfully
    including its quirks: the per-teacher "loss" is ``F.nll_loss`` applied to
    *softmax probabilities* (not log-probs), i.e. ``-p[:,0].mean()`` — a
    negative number — and the ensemble weights are each teacher's share of
    that sum (so *worse* teachers get more weight) with the soft term scaled
    by ``1 / (0.1 + mean_teacher_loss)`` (:552-554).
    """
    s = student_scores.astype(jnp.float32)
    logp = jax.nn.log_softmax(s, axis=1)
    hard = -logp[:, 0].mean()

    def quirk_loss(t):
        return -jax.nn.softmax(
            jax.lax.stop_gradient(t.astype(jnp.float32)), axis=1)[:, 0].mean()

    de_l = quirk_loss(de_scores)
    c12_l = quirk_loss(ce12_scores)
    c24_l = quirk_loss(ce24_scores)
    total_t = de_l + c12_l + c24_l
    mixed = (de_l / total_t * de_scores + c12_l / total_t * ce12_scores
             + c24_l / total_t * ce24_scores)
    soft = kd_softmax_loss(s, mixed, temperature)
    loss = hard + (1.0 / (0.1 + total_t / 3.0)) * soft
    return loss, {"hard_loss": hard, "soft_loss": soft,
                  "teacher_losses": jnp.stack([de_l, c12_l, c24_l])}
