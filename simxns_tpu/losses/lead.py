"""LEAD layer-reweighted distillation losses.

Re-implements ``LEAD/util.py`` loss machinery with static shapes:

- :func:`layer_score_distill_loss` — per-layer CLS-score distributions
  aligned by KL, with layer weights ``softmax(-teacher_layer_NLL /
  layer_temperature)`` so informative teacher layers get more weight
  (``layer_score_dis_loss`` :539-559, the paper's core).
- :func:`pair_kl` — the model-level mutual KL terms
  (``loss_de_db_dis`` etc., :750-753).
- :func:`query_doc_attention_maps` + :func:`virt_loss` — VIRT attention-map
  MSE between per-layer query-token x doc-token similarity maps
  (``query_doc_attention_map`` :504-529, ``virt_loss`` :531-537). The
  reference builds the valid-region mask with a Python double loop over
  (query, doc) lengths; here it's two broadcasted-iota comparisons —
  identical result (fully-masked rows softmax to uniform on both sides and
  contribute 0 to the MSE).
- :func:`select_layers` — random / last / skip layer selection re-drawn every
  ``save_steps`` (``select_layer`` :206-254).
- :func:`grouped_slice` — the "remove cross-batch negatives" reshape used
  when a CE is in the mix (``distill_loss`` :704-706): row i keeps columns
  ``[i*M, (i+1)*M)``.

KL convention: torch ``F.kl_div(log_p_student, p_teacher,
reduction='batchmean')`` = sum over all elements / first-dim size; teacher
probabilities use ``softmax(scores / T)``, student log-probs are NOT
temperature-scaled (:607-609).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


def batchmean_kl(student_log_probs: jax.Array, teacher_probs: jax.Array) -> jax.Array:
    """torch F.kl_div(log_s, p_t, reduction='batchmean') semantics."""
    t = jax.lax.stop_gradient(teacher_probs.astype(jnp.float32))
    s = student_log_probs.astype(jnp.float32)
    kl = t * (jnp.log(jnp.clip(t, 1e-30, None)) - s)
    return kl.sum() / student_log_probs.shape[0]


def pair_kl(student_scores: jax.Array, teacher_scores: jax.Array,
            temperature: float = 1.0) -> jax.Array:
    """KL(softmax(teacher/T) || softmax(student)), batchmean."""
    return batchmean_kl(
        jax.nn.log_softmax(student_scores.astype(jnp.float32), axis=-1),
        jax.nn.softmax(
            jax.lax.stop_gradient(teacher_scores.astype(jnp.float32))
            / temperature, axis=-1))


def grouped_slice(scores: jax.Array, sample_num: int) -> jax.Array:
    """[Q, Q*M] in-batch scores -> [Q, M] own-group scores (util.py:704)."""
    q = scores.shape[0]
    rows = jnp.arange(q)[:, None]
    cols = rows * sample_num + jnp.arange(sample_num)[None, :]
    return scores[rows, cols]


def layer_scores_from_cls(q_layer_cls: jax.Array,   # [L, Q, H]
                          d_layer_cls: jax.Array    # [L, D, H]
                          ) -> jax.Array:
    """Per-layer in-batch score matrices [L, Q, D] from layer CLS hiddens."""
    return jnp.einsum("lqh,ldh->lqd", q_layer_cls, d_layer_cls,
                      preferred_element_type=jnp.float32)


def layer_score_distill_loss(
    teacher_layer_scores: jax.Array,   # [L, Q, C] selected teacher layers
    student_layer_scores: jax.Array,   # [L, Q, C] selected student layers
    target: jax.Array,                 # [Q] positive column index
    temperature: float = 1.0,
    layer_temperature: float = 1.0,
    reweight: bool = True,
    distill_para: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(loss, per_layer_kl [L])``.

    loss = sum_l w_l * KL(softmax(teacher_l/T) || softmax(student_l)) with
    w_l = softmax_l(-NLL(teacher_l, target) / layer_temperature) when
    ``reweight`` (LEAD's contribution), else ``distill_para`` per layer.
    """
    t = jax.lax.stop_gradient(teacher_layer_scores.astype(jnp.float32))
    s = student_layer_scores.astype(jnp.float32)

    t_probs = jax.nn.softmax(t / temperature, axis=-1)
    s_logp = jax.nn.log_softmax(s, axis=-1)
    kl = (t_probs * (jnp.log(jnp.clip(t_probs, 1e-30, None)) - s_logp)
          ).sum(-1).sum(-1) / s.shape[1]                    # [L] batchmean

    t_logp = jax.nn.log_softmax(t, axis=-1)
    nll = -jnp.take_along_axis(
        t_logp, target[None, :, None], axis=2)[..., 0].mean(-1)   # [L]
    if reweight:
        weights = jax.nn.softmax(-nll / layer_temperature)
    else:
        weights = jnp.full(kl.shape, distill_para, dtype=jnp.float32)
    return (weights * kl).sum(), kl


def query_doc_attention_maps(
    q_layer_hidden: jax.Array,     # [L_sel, Q, Sq, H] selected layers
    d_layer_hidden: jax.Array,     # [L_sel, D, Sd, H]
    q_len: jax.Array,              # [Q] valid query token counts
    d_len: jax.Array,              # [D] valid doc token counts
) -> jax.Array:
    """Per-layer query-token x doc-token attention maps, softmaxed over doc
    tokens with out-of-length positions masked to -1e9: [L, Q, D, Sq, Sd].
    """
    att = jnp.einsum("lqsh,ldth->lqdst", q_layer_hidden, d_layer_hidden,
                     preferred_element_type=jnp.float32)
    sq, sd = att.shape[-2], att.shape[-1]
    q_valid = jnp.arange(sq)[None, :] < q_len[:, None]          # [Q, Sq]
    d_valid = jnp.arange(sd)[None, :] < d_len[:, None]          # [D, Sd]
    mask = (q_valid[:, None, :, None] & d_valid[None, :, None, :])  # [Q,D,Sq,Sd]
    att = jnp.where(mask[None], att, NEG)
    return jax.nn.softmax(att, axis=-1)


def virt_loss(teacher_maps: jax.Array, student_maps: jax.Array,
              distill_para: float = 1.0) -> jax.Array:
    """MSE(sum) / L / Q / D * para (``virt_loss`` util.py:531-537)."""
    t = jax.lax.stop_gradient(teacher_maps.astype(jnp.float32))
    s = student_maps.astype(jnp.float32)
    l, q, d = s.shape[0], s.shape[1], s.shape[2]
    return jnp.sum((s - t) ** 2) / l / q / d * distill_para


def attention_map_kl(
    student_scores: jax.Array,   # [..., Sq, Sd] raw q-token x d-token scores
    teacher_scores: jax.Array,   # [..., Sq, Sd] raw attention logits
    q_valid: jax.Array,          # [..., Sq] bool/int
    d_valid: jax.Array,          # [..., Sd]
) -> jax.Array:
    """CE -> student attention-map KL (``attention_map_loss`` util.py:467-502).

    The reference slices each instance's CE attention map to its
    [query x doc] region with Python loops over per-instance spans; here both
    sides are masked to -1e9 outside the valid region and softmaxed over doc
    tokens — fully-masked rows become identical uniform distributions and
    contribute zero KL, so the result matches the per-instance slicing.
    KL is batchmean over all leading dims, averaged over valid query rows.
    """
    mask = (q_valid[..., :, None] > 0) & (d_valid[..., None, :] > 0)
    s = jnp.where(mask, student_scores.astype(jnp.float32), NEG)
    t = jnp.where(mask, jax.lax.stop_gradient(
        teacher_scores.astype(jnp.float32)), NEG)
    p_t = jax.nn.softmax(t, axis=-1)
    log_s = jax.nn.log_softmax(s, axis=-1)
    kl = (p_t * (jnp.log(jnp.clip(p_t, 1e-30, None)) - log_s)).sum(-1)
    row_valid = (q_valid > 0).astype(jnp.float32)
    return (kl * row_valid).sum() / jnp.maximum(row_valid.sum(), 1.0)


def select_layers(
    rng: np.random.Generator,
    num_student_layers: int,
    num_teacher_layers: int,
    num_distill_layers: int,
    mode: str = "random",
) -> Tuple[List[int], List[int]]:
    """Layer index selection, re-drawn every ``save_steps``
    (``run_LEAD.py:152,260``). ``last`` / ``skip`` reproduce the reference's
    fixed MS-passage lists generalized to arbitrary depths."""
    if mode == "random":
        s = sorted(rng.choice(num_student_layers, size=num_distill_layers,
                              replace=False).tolist())
        t = sorted(rng.choice(num_teacher_layers, size=num_distill_layers,
                              replace=False).tolist())
        return s, t
    if mode == "last":
        s = list(range(num_student_layers - num_distill_layers,
                       num_student_layers))
        t = list(range(num_teacher_layers - num_distill_layers,
                       num_teacher_layers))
        return s, t
    if mode == "skip":
        s = list(range(num_student_layers - num_distill_layers,
                       num_student_layers))
        stride = max(1, num_teacher_layers // num_distill_layers)
        t = [i * stride for i in range(num_distill_layers)]
        return s, t
    raise ValueError(f"unknown layer selection mode {mode!r}")
