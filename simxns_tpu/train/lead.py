"""LEAD joint distillation step: up to 4 models in one backward.

The reference trains/freezes any subset of {DistilBERT student (db),
dual-encoder teacher (de), ColBERT (col), cross-encoder (ce)} in a single
step with one combined loss and per-model optimizers
(``LEAD/run_LEAD.py:43-276``). Loss terms (``LEAD/util.py:distill_loss``):

- task NLL per *trained* model (in-batch for db/de/col over gathered
  negatives; grouped when a CE participates, ``util.py:704-706``);
- mutual KL between db and each teacher's score distribution
  (both directions when the teacher is trained too, :750-756);
- layer-reweighted KL over selected layers' CLS-score distributions
  (:539-559) — LEAD's core;
- VIRT attention-map MSE between per-layer query x doc maps (:531-537).

TPU design: layer selections are *traced* index arrays (``jnp.take`` over
the stacked [L, ...] hiddens), so the every-``save_steps`` re-draw
(``run_LEAD.py:260``) does NOT trigger recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from simxns_tpu.losses.lead import (
    attention_map_kl, grouped_slice, layer_score_distill_loss,
    layer_scores_from_cls, pair_kl, query_doc_attention_maps, virt_loss)
from simxns_tpu.models.colbert import maxsim_score
from simxns_tpu.parallel.mesh import dp_axes
from simxns_tpu.train.steps import sharding_kwargs


def ce_attention_targets(ce_attn_sel: jax.Array,   # [Lsel, B*M, H, Lj, Lj]
                         q_len: jax.Array,          # [B] incl CLS+SEP
                         d_len: jax.Array,          # [B*M] doc token count
                         sq: int, sd: int):
    """Slice CE attention maps to the (query x doc) region, statically.

    The reference extracts ``att[:, 1:qlen-1, qlen:dend]`` per instance with
    Python loops (``LEAD/util.py:685-700``); here rows/cols are gathered with
    per-instance offsets so shapes stay [Lsel, B*M, sq, sd]. Heads are
    averaged first (``torch.mean(attention_map_ce[i], dim=1)``).
    Returns ``(targets, q_valid [B*M, sq], d_valid [B*M, sd])``.
    """
    att = ce_attn_sel.mean(axis=2)                  # [Lsel, B*M, Lj, Lj]
    bm = att.shape[1]
    m = bm // q_len.shape[0]
    q_len_bm = jnp.repeat(q_len, m)                 # [B*M]
    lj = att.shape[-1]
    rows = jnp.clip(1 + jnp.arange(sq)[None, :], 0, lj - 1)          # [1, sq]
    rows = jnp.broadcast_to(rows, (bm, sq))
    cols = jnp.clip(q_len_bm[:, None] + jnp.arange(sd)[None, :], 0, lj - 1)

    def gather_one(a, r, c):                        # a: [Lj, Lj]
        return a[r][:, c]

    targets = jax.vmap(                              # over Lsel
        jax.vmap(gather_one, in_axes=(0, 0, 0)),     # over B*M
        in_axes=(0, None, None))(att, rows, cols)
    # callers pass CLS-dropped student maps: valid rows/cols are the
    # CONTENT tokens only — q_len-2 and d_len-2 (both lengths include
    # their tower's CLS+SEP), matching the reference's [1:len-1] slices
    q_valid = (jnp.arange(sq)[None, :] < (q_len_bm - 2)[:, None])
    d_valid = (jnp.arange(sd)[None, :] < (d_len - 2)[:, None])
    return targets, q_valid, d_valid


@dataclasses.dataclass(frozen=True)
class LeadConfig:
    distill_db: bool = True
    distill_de: bool = True
    distill_col: bool = False
    distill_ce: bool = False
    train_db: bool = True
    train_de: bool = False
    train_col: bool = False
    train_ce: bool = False
    layer_score: bool = True            # per-layer reweighted KL
    attention: bool = False             # VIRT attention MSE
    reweight: bool = True               # LEAD layer reweighting on
    temperature: float = 1.0
    layer_temperature: float = 1.0
    para_task: float = 1.0              # distill_para_db/de/col/ce
    para_dis: float = 1.0               # model-level KL weight
    para_layer: float = 1.0             # per-layer KL weight (no-reweight)
    para_attention: float = 1.0


def make_lead_step(
    models: Dict,                       # keys among db/de/col/ce
    txs: Dict[str, optax.GradientTransformation],
    mesh,
    cfg: LeadConfig,
    num_distill_layers: int = 4,
    frozen_views: Optional[Dict] = None,
) -> Callable:
    """Returns ``step(states, batch, sel_student, sel_teacher) ->
    (states, metrics)`` where ``states`` is a dict of TrainState per model
    and ``sel_*`` are [num_distill_layers] int32 layer-index arrays.

    ``frozen_views`` substitutes an alternate module for a FROZEN model's
    forward while sharing its param tree — e.g. a fused-int8 view of a
    frozen CE teacher (``run.py --fast-teacher``; the reference wraps
    frozen models without DDP, ``LEAD/run_LEAD.py:65-73``). Autodiff
    differentiates only the trained params, so frozen forwards carry no
    JVP tracers and the encode-only quantized guard does not fire (same
    contract as ``make_ar2_retriever_step``'s teacher).
    """
    trained = [k for k in ("db", "de", "col", "ce")
               if getattr(cfg, f"train_{k}") and k in models]
    active = [k for k in ("db", "de", "col", "ce")
              if getattr(cfg, f"distill_{k}") and k in models]
    for k in frozen_views or {}:
        if k in trained:
            raise ValueError(
                f"frozen_views[{k!r}]: model is TRAINED — a quantized view "
                "has zero/failing gradients; views are for frozen models")
    fwd_models = {**models, **(frozen_views or {})}

    def encoder_outputs(name, params, batch, sel):
        """dict with final scores, selected-layer scores, per-layer hiddens
        (db/de) or selected-layer attention maps (ce)."""
        model = fwd_models[name]
        if name == "ce":
            n, m, lj = batch["joint_ids"].shape
            out = model.apply(params, batch["joint_ids"].reshape(n * m, lj),
                              batch["joint_mask"].reshape(n * m, lj),
                              group_size=m, deterministic=True,
                              output_attentions=cfg.attention)
            final = out["logits"]                       # [N, M]
            layer = jnp.take(out["per_layer_logits"], sel, axis=0)
            attn = None
            if cfg.attention:
                attn = jnp.take(jnp.stack(out["attentions"], axis=0),
                                sel, axis=0)            # [Lsel, N*M, H, Lj, Lj]
            return {"final": final, "layer": layer, "q_hid": None,
                    "d_hid": None, "attn": attn}
        if name == "col":
            q_tok, d_tok = model.apply(
                params, batch["q_ids"], batch["q_mask"],
                batch["ctx_ids"], batch["ctx_mask"], deterministic=True)
            final = maxsim_score(q_tok, d_tok)          # [Q, D]
            return {"final": final, "layer": None, "q_hid": None,
                    "d_hid": None, "attn": None}
        # db / de: BiEncoder with per-layer hiddens
        q_emb, q_out = model.apply(
            params, batch["q_ids"], batch["q_mask"], deterministic=True,
            output_hidden_states=True, method="encode_query")
        d_emb, d_out = model.apply(
            params, batch["ctx_ids"], batch["ctx_mask"], deterministic=True,
            output_hidden_states=True, method="encode_passage")
        final = jnp.einsum("qh,dh->qd", q_emb, d_emb,
                           preferred_element_type=jnp.float32)
        q_layers = jnp.stack([h for h in q_out.hidden_states[1:]], axis=0)
        d_layers = jnp.stack([h for h in d_out.hidden_states[1:]], axis=0)
        q_sel = jnp.take(q_layers, sel, axis=0)         # [Lsel, Q, Sq, H]
        d_sel = jnp.take(d_layers, sel, axis=0)
        layer = layer_scores_from_cls(q_sel[:, :, 0], d_sel[:, :, 0])
        return {"final": final, "layer": layer, "q_hid": q_sel,
                "d_hid": d_sel, "attn": None}

    def loss_fn(train_params, frozen_params, batch, sel_s, sel_t):
        params = {**frozen_params, **train_params}
        n = batch["q_ids"].shape[0]
        m = batch["ctx_ids"].shape[0] // n
        target_inbatch = jnp.arange(n, dtype=jnp.int32) * m
        use_grouped = cfg.distill_ce and "ce" in models
        target = (jnp.zeros((n,), jnp.int32) if use_grouped
                  else target_inbatch)

        outs = {}
        for name in active:
            sel = sel_s if name == "db" else sel_t
            p = (jax.lax.stop_gradient(params[name])
                 if name not in trained else params[name])
            o = encoder_outputs(name, p, batch, sel)
            if use_grouped and name != "ce":
                o["final"] = grouped_slice(o["final"], m)
                if o["layer"] is not None:
                    o["layer"] = jax.vmap(grouped_slice,
                                          in_axes=(0, None))(o["layer"], m)
            outs[name] = o

        loss = 0.0
        metrics = {}

        def task_nll(scores):
            logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=1)
            return -jnp.take_along_axis(logp, target[:, None], 1).mean()

        for name in active:
            if name in trained:
                l = task_nll(outs[name]["final"])
                metrics[f"loss_{name}"] = l
                loss = loss + cfg.para_task * l

        teachers = [k for k in active if k != "db"]
        if "db" in active:
            s_final = outs["db"]["final"]
            for t_name in teachers:
                t_final = outs[t_name]["final"]
                l_ts = pair_kl(s_final, t_final, cfg.temperature)
                metrics[f"loss_{t_name}_db_dis"] = l_ts
                term = l_ts
                if t_name in trained:
                    l_st = pair_kl(t_final, s_final, cfg.temperature)
                    metrics[f"loss_db_{t_name}_dis"] = l_st
                    term = term + l_st
                loss = loss + cfg.para_dis * term

                if cfg.layer_score and outs[t_name]["layer"] is not None \
                        and outs["db"]["layer"] is not None:
                    l_layer, per = layer_score_distill_loss(
                        outs[t_name]["layer"], outs["db"]["layer"], target,
                        cfg.temperature, cfg.layer_temperature,
                        cfg.reweight, cfg.para_layer)
                    metrics[f"loss_{t_name}_db_layer_dis"] = l_layer
                    loss = loss + l_layer

                if cfg.attention and outs[t_name]["q_hid"] is not None \
                        and outs["db"]["q_hid"] is not None:
                    q_len = batch["q_mask"].sum(-1)
                    d_len = batch["ctx_mask"].sum(-1)
                    t_maps = query_doc_attention_maps(
                        outs[t_name]["q_hid"], outs[t_name]["d_hid"],
                        q_len, d_len)
                    s_maps = query_doc_attention_maps(
                        outs["db"]["q_hid"], outs["db"]["d_hid"],
                        q_len, d_len)
                    l_att = virt_loss(t_maps, s_maps, cfg.para_attention)
                    metrics[f"loss_{t_name}_db_attention"] = l_att
                    loss = loss + l_att

                if cfg.attention and t_name == "ce" \
                        and outs["ce"]["attn"] is not None \
                        and outs["db"]["q_hid"] is not None:
                    # CE attention -> student q x d map KL
                    # (LEAD/util.py:467-502 attention_map_loss). The
                    # teacher targets index CONTENT tokens (joint row 1+i,
                    # doc col q_len+j); the student towers carry CLS at
                    # position 0 — drop it (and align the doc side the
                    # same way) so student token i faces teacher token i,
                    # matching the reference's [1:qlen-1]/[1:dlen-1] slices.
                    q_hid = outs["db"]["q_hid"][:, :, 1:]   # [Lsel,Q,Sq-1,H]
                    d_hid = outs["db"]["d_hid"][:, :, 1:]   # [Lsel,Q*m,Sd-1,H]
                    lsel, qn, sq, hh = q_hid.shape
                    sd = d_hid.shape[2]
                    d_g = d_hid.reshape(lsel, qn, m, sd, hh)
                    s_maps = jnp.einsum(
                        "lqsh,lqmth->lqmst", q_hid, d_g,
                        preferred_element_type=jnp.float32
                    ).reshape(lsel, qn * m, sq, sd)
                    targets, q_valid, d_valid = ce_attention_targets(
                        outs["ce"]["attn"], batch["q_mask"].sum(-1),
                        batch["ctx_mask"].sum(-1), sq, sd)
                    l_ce_att = attention_map_kl(s_maps, targets,
                                                q_valid, d_valid)
                    l_ce_att = cfg.para_attention * l_ce_att
                    metrics["loss_ce_db_attention_map"] = l_ce_att
                    loss = loss + l_ce_att

        return loss, metrics

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(dp_axes(mesh)))

    def step(states, batch, sel_s, sel_t):
        train_params = {k: states[k].params for k in trained}
        frozen_params = {k: states[k].params for k in states if k not in trained}
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_params, frozen_params, batch, sel_s, sel_t)
        new_states = dict(states)
        for k in trained:
            new_states[k] = states[k].apply_gradients(grads[k], txs[k])
        return new_states, {"loss": loss, **metrics}

    return jax.jit(
        step,
        **sharding_kwargs(mesh, (repl, shard, repl, repl), (repl, repl)),
    )
