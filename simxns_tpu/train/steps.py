"""Jitted training-step factories.

One factory per training mode the reference implements with six separate
script families (SURVEY.md §7.1 item 7). Each returns
``step(state, batch) -> (state, metrics)`` compiled once over the mesh —
batch dims sharded over ``data``, params replicated; XLA inserts the ICI
collectives (grad psum, context all-gathers) from the shardings.

- :func:`make_biencoder_step` — in-batch-negative contrastive training
  (``train_DE_model_marco.py:224-292``). ``grad_mode='full'`` computes the
  global softmax directly (one program, true global gradient);
  ``grad_mode='local'`` reproduces the reference's detach-remote contract
  via ``shard_map`` (SURVEY.md §2.8).
- :func:`make_reranker_step` — grouped CE over (1 pos + n negs)
  (``co_training_wiki_train.py:236-256``).
- :func:`make_ar2_retriever_step` — AR2 KL-to-reranker + adversarial reward
  (``co_training_wiki_train.py:194-235``). The adv term is a per-device sum
  whose gradients DDP *averages* in the reference, i.e. its effective
  scale is (global adv sum) / world_size. By default the divisor is the
  CURRENT mesh's dp size (the same run on the same mesh shape matches the
  reference); to pin the exact 8-GPU recipe scale on a different mesh,
  pass ``adv_world_size=8``. (Published launchers run --normal_loss,
  adv_lambda=0, where the term is off entirely.)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from simxns_tpu.losses.contrastive import grouped_nll, in_batch_nll
from simxns_tpu.losses.distill import ar2_retriever_loss
from simxns_tpu.parallel.collectives import (
    all_gather_full_grad, all_gather_local_grad)
from simxns_tpu.parallel.mesh import (DATA_AXIS, REPLICA_AXIS, dp_axes,
                                      dp_size)

Batch = dict


def with_grad_accum(loss_fn: Callable, micro_steps: int) -> Callable:
    """Wrap ``loss_fn(params, batch) -> (loss, aux)`` to average gradients
    over ``micro_steps`` equal slices of the batch's leading dim.

    The reference's ``--gradient_accumulation_steps``
    (``co_training_wiki_train.py:228,257``) as a ``lax.scan`` over
    microbatches — memory drops by ``micro_steps``. For per-example /
    grouped losses the math is identical to the full batch. For *in-batch*
    losses the negative pool shrinks to the microbatch — exactly the
    reference's accumulation semantics — and ``positive_idx`` MUST be
    microbatch-local (every leading dim is split; a full-batch index goes
    out of range and jit's take_along_axis fills NaN). Violations are
    guarded: concrete batches raise ``ValueError`` eagerly; traced batches
    report ``accum_idx_ok=False`` in the metrics dict.
    """
    if micro_steps <= 1:
        return jax.value_and_grad(loss_fn, has_aux=True)

    def split(x):
        return x.reshape((micro_steps, x.shape[0] // micro_steps)
                         + x.shape[1:])

    def _guard_positive_idx(batch):
        """Catch the full-batch-index footgun instead of NaN-ing silently."""
        pos = batch.get("positive_idx")
        if pos is None or "ctx_ids" not in batch:
            return None
        rows = batch["ctx_ids"].shape[0] // micro_steps
        if not isinstance(pos, jax.core.Tracer):
            if int(jnp.max(pos)) >= rows:
                raise ValueError(
                    f"with_grad_accum(micro_steps={micro_steps}): "
                    f"positive_idx max {int(jnp.max(pos))} >= {rows} ctx "
                    "rows per microbatch — positive_idx must be "
                    "microbatch-LOCAL under accumulation (see docstring)")
            return None
        return (pos < rows).all()  # traced: surface as a metric

    def vg(params, batch):
        idx_ok = _guard_positive_idx(batch)
        micro = jax.tree_util.tree_map(split, batch)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, mb):
            (loss_sum, aux_sum, grads_sum) = carry
            (loss, aux), grads = grad_fn(params, mb)
            return (loss_sum + loss,
                    jax.tree_util.tree_map(jnp.add, aux_sum, aux),
                    jax.tree_util.tree_map(jnp.add, grads_sum, grads)), None

        (l0, a0), g0 = grad_fn(
            params, jax.tree_util.tree_map(lambda x: x[0], micro))
        init = (l0, a0, g0)
        rest = jax.tree_util.tree_map(lambda x: x[1:], micro)
        (loss, aux, grads), _ = jax.lax.scan(body, init, rest)
        scale = 1.0 / micro_steps
        aux = jax.tree_util.tree_map(
            lambda x: x * scale
            if jnp.issubdtype(x.dtype, jnp.floating) else x, aux)
        if idx_ok is not None and isinstance(aux, dict):
            aux = {**aux, "accum_idx_ok": idx_ok}
        return (loss * scale, aux), jax.tree_util.tree_map(
            lambda g: g * scale, grads)

    return vg


def sharding_kwargs(mesh, in_shardings, out_shardings=None) -> dict:
    """jit sharding kwargs — OMITTED on a single-device mesh.

    On one device every sharding is trivial, so explicit in/out
    shardings change nothing semantically — but they are not free on
    every runtime: one tunneled/relay backend ran a BERT-base train step
    with multi-GB state at host-stream speed when explicit shardings
    were present (measured A/B, same program: plain jit 635 ms/step,
    +donate 633 ms, +in/out shardings 40.9 s — 64x). Donation is
    unconditional (it is innocent and halves peak state HBM).
    """
    kw = {"donate_argnums": (0,)}
    if mesh.size > 1:
        kw["in_shardings"] = in_shardings
        if out_shardings is not None:
            kw["out_shardings"] = out_shardings
    return kw


# Back-compat private alias (kd/lead/pretrain imported the underscore name).
_sharding_kwargs = sharding_kwargs


def dropout_rngs(dropout: bool, seed: int, step):
    """Per-step dropout rng derivation shared by every step factory:
    ``({} , True)`` in eval mode, ``({'dropout': fold_in(PRNGKey(seed),
    step)}, False)`` in train mode — reproducible, fresh mask per step."""
    if not dropout:
        return {}, True
    key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
    return {"dropout": key}, False


def _jit_step(fn, mesh, state_like=None, auto_state: bool = False):
    """jit a ``(state, batch) -> (state, metrics)`` step over the mesh.

    ``auto_state=True`` leaves the state's shardings unconstrained so
    tensor-parallel param layouts (``parallel.tp.shard_params``) propagate
    through the step instead of being forced to replicated.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(dp_axes(mesh)))
    if auto_state:
        return jax.jit(fn, **sharding_kwargs(mesh, (None, shard)))
    return jax.jit(fn, **sharding_kwargs(mesh, (repl, shard),
                                          (repl, repl)))


def make_biencoder_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    grad_mode: str = "full",
    score_scale: float = 1.0,
    auto_state: bool = False,
    dropout: bool = False,
    dropout_seed: int = 0,
    negatives_scope: str = "global",
) -> Callable:
    """In-batch contrastive step. Batch keys: q_ids/q_mask [N,Lq],
    ctx_ids/ctx_mask [N*M,Lc], positive_idx [N] (global flat index).

    ``dropout=True`` enables train-mode dropout (the reference trains with
    p=0.1); the rng is folded from ``state.step`` so runs are reproducible
    and every step uses fresh masks.

    On a multi-slice mesh (``create_multislice_mesh``), gradients psum
    across slices (one DCN round per step) while
    ``negatives_scope='slice'`` keeps the in-batch-negative all-gather on
    ICI: each slice's softmax sees only its own slice's contexts (the
    global ``positive_idx`` is shifted into slice space internally).
    ``'global'`` gathers across DCN too — identical math to one big slice.
    """

    dp = dp_axes(mesh)
    multislice = isinstance(dp, tuple)
    if negatives_scope not in ("global", "slice"):
        raise ValueError(f"bad negatives_scope {negatives_scope!r}")
    if grad_mode not in ("full", "local"):
        raise ValueError(f"bad grad_mode {grad_mode!r}")
    slice_scope = negatives_scope == "slice" and multislice

    def _rngs(step):
        return dropout_rngs(dropout, dropout_seed, step)

    def loss_full(params, batch, rngs, det):
        q_emb, ctx_emb = model.apply(
            params, batch["q_ids"], batch["q_mask"],
            batch["ctx_ids"], batch["ctx_mask"], deterministic=det,
            rngs=rngs)
        loss, correct = in_batch_nll(q_emb, ctx_emb, batch["positive_idx"],
                                     score_scale=score_scale)
        return loss, {"correct": correct}

    def loss_sharded(params, batch, rngs, det):
        # Explicit shard_map path: the reference gradient contract
        # (grad_mode='local': softmax over gathered contexts, grads
        # through the local shard only) and/or slice-scoped negatives.
        gather_axis = DATA_AXIS if slice_scope else dp
        gather = (all_gather_local_grad if grad_mode == "local"
                  else all_gather_full_grad)

        def shard_fn(q_ids, q_mask, ctx_ids, ctx_mask, pos_idx):
            # fold the device's dp coordinate into the dropout key: the
            # closed-over key is identical on every shard, and same key +
            # same local shapes would mean bit-identical dropout masks on
            # all shards (the reference's DDP ranks have independent RNG)
            local_rngs = rngs
            if local_rngs:
                idx = jax.lax.axis_index(dp)
                local_rngs = {k: jax.random.fold_in(v, idx)
                              for k, v in rngs.items()}
            q_emb, ctx_emb = model.apply(params, q_ids, q_mask,
                                         ctx_ids, ctx_mask, deterministic=det,
                                         rngs=local_rngs)
            g_ctx = gather(ctx_emb, gather_axis)
            # batch["positive_idx"] is already a *global* flat index and the
            # gathered ctx matrix is in global device-major order, so no
            # rank offset is needed — except under slice scope, where the
            # gathered matrix only spans this slice and the index shifts
            # down by the slice's start offset (rows are replica-major).
            if slice_scope:
                per_slice = ctx_ids.shape[0] * jax.lax.psum(1, DATA_AXIS)
                pos_idx = pos_idx - jax.lax.axis_index(
                    REPLICA_AXIS) * per_slice
            loss, correct = in_batch_nll(q_emb, g_ctx, pos_idx,
                                         score_scale=score_scale,
                                         reduction="sum")
            n_global = q_ids.shape[0] * jax.lax.psum(1, dp)
            return (jax.lax.psum(loss, dp) / n_global,
                    jax.lax.psum(correct, dp))

        loss, correct = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(dp),) * 5, out_specs=(P(), P()),
        )(batch["q_ids"], batch["q_mask"], batch["ctx_ids"],
          batch["ctx_mask"], batch["positive_idx"])
        return loss, {"correct": correct}

    loss_fn = (loss_full if grad_mode == "full" and not slice_scope
               else loss_sharded)

    def step(state, batch):
        rngs, det = _rngs(state.step)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rngs, det)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **aux}

    return _jit_step(step, mesh, auto_state=auto_state)


def make_colbert_step(
    colbert_model,
    tx: optax.GradientTransformation,
    mesh,
    group_size: int = 1,
) -> Callable:
    """ColBERT in-batch contrastive step (LEAD's single-model trainer,
    ``run_single_model.py`` + ``get_loss_dual`` ``util.py:416-451``): MaxSim
    scores of every query against every doc token set, NLL with the positive
    at ``i * group_size``. Masked doc tokens are zero vectors (cosine mode),
    matching the -1e4 fill's effect in the reference.
    """
    from simxns_tpu.models.colbert import maxsim_score

    def loss_fn(params, batch):
        q_tok, d_tok = colbert_model.apply(
            params, batch["q_ids"], batch["q_mask"],
            batch["ctx_ids"], batch["ctx_mask"], deterministic=True)
        scores = maxsim_score(q_tok, d_tok)          # [Q, D]
        n = scores.shape[0]
        target = jnp.arange(n, dtype=jnp.int32) * group_size
        logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=1)
        loss = -jnp.take_along_axis(logp, target[:, None], 1).mean()
        correct = jnp.sum((jnp.argmax(scores, 1) == target).astype(jnp.int32))
        return loss, {"correct": correct}

    def step(state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **aux}

    return _jit_step(step, mesh)


def make_reranker_step(ce_model, tx: optax.GradientTransformation, mesh,
                       group_size: int, dropout: bool = False,
                       dropout_seed: int = 1) -> Callable:
    """Cross-encoder CE step. Batch keys: joint_ids/joint_mask [N, M, Lj];
    positive at column 0 (reference target tensor of zeros)."""

    def loss_fn(params, batch, rngs, det):
        n, m, lj = batch["joint_ids"].shape
        out = ce_model.apply(params, batch["joint_ids"].reshape(n * m, lj),
                             batch["joint_mask"].reshape(n * m, lj),
                             group_size=m, deterministic=det, rngs=rngs)
        logits = out["logits"]
        loss = grouped_nll(logits)
        correct = jnp.sum((jnp.argmax(logits, axis=1) == 0).astype(jnp.int32))
        return loss, {"correct": correct}

    def step(state, batch):
        rngs, det = dropout_rngs(dropout, dropout_seed, state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rngs, det)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **aux}

    return _jit_step(step, mesh)


def make_ar2_retriever_step(
    de_model,
    ce_model,
    tx: optax.GradientTransformation,
    mesh,
    temperature: float = 1.0,
    adv_lambda: float = 0.5,
    scale_scores: Optional[float] = None,
    auto_state: bool = False,
    dropout: bool = False,
    dropout_seed: int = 2,
    adv_world_size: Optional[int] = None,
) -> Callable:
    """AR2 retriever step: KL to frozen reranker + adversarial reward.

    With ``dropout=True`` the trained retriever runs in train mode while the
    frozen reranker stays eval-mode — exactly the reference's
    ``model.train(); reranker_model.eval()`` (:196-197).

    ``step(de_state, ce_params, batch)``; batch needs retriever inputs
    (q/ctx) AND the joint reranker inputs for the frozen teacher forward.

    ``ce_model`` is used ONLY for that frozen (stop-gradient) forward, so
    it may be an encode-only quantized VIEW of the reranker — e.g. a
    ``CrossEncoder`` whose config has ``layer_impl='fused_int8'`` — sharing
    the live reranker's param tree (the compositions interchange). The
    teacher is ~59% of this step's FLOPs at the recipe shape (CE-large
    S=160 fwd vs BERT-base DE fwd+bwd), so a faster teacher forward moves
    the whole step; the quantized teacher's logits stay >0.999-correlated
    with bf16 (measured, ops/fused_layer.py). Autodiff never touches the
    teacher path (its activations carry no JVP tracer), so the encode-only
    guard does not fire.
    """
    # reference scale: global adv sum / DDP world size. Default = this
    # mesh's dp size; adv_world_size pins a specific recipe's world (see
    # module docstring).
    n_data = adv_world_size if adv_world_size is not None else dp_size(mesh)

    def loss_fn(params, ce_params, batch, rngs, det):
        n, m, lj = batch["joint_ids"].shape
        q_emb, ctx_emb = de_model.apply(
            params, batch["q_ids"], batch["q_mask"],
            batch["ctx_ids"], batch["ctx_mask"], deterministic=det,
            rngs=rngs)
        groups = ctx_emb.reshape(n, m, -1)
        scores = jnp.einsum("bh,bmh->bm", q_emb, groups,
                            preferred_element_type=jnp.float32)

        ce_out = ce_model.apply(ce_params, batch["joint_ids"].reshape(n * m, lj),
                                batch["joint_mask"].reshape(n * m, lj),
                                group_size=m, deterministic=True)
        reranker_logits = jax.lax.stop_gradient(ce_out["logits"])

        loss, aux = ar2_retriever_loss(
            scores, reranker_logits, temperature=temperature,
            adv_lambda=adv_lambda, scale_scores=scale_scores)
        # Reference: per-device adv sum, DDP-averaged grads -> divide the
        # global-sum formulation by the data-parallel size.
        if adv_lambda != 0.0:
            loss = (adv_lambda * aux["adv_loss"] / n_data
                    + (1.0 - adv_lambda) * aux["normal_loss"])
        return loss, aux

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(dp_axes(mesh)))

    def step(de_state, ce_params, batch):
        rngs, det = dropout_rngs(dropout, dropout_seed, de_state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            de_state.params, ce_params, batch, rngs, det)
        new_state = de_state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **aux}

    if auto_state:
        return jax.jit(step, **sharding_kwargs(mesh, (None, None, shard)))
    return jax.jit(step, **sharding_kwargs(mesh, (repl, repl, shard),
                                            (repl, repl)))
