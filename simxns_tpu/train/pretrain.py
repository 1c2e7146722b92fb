"""MASTER pretraining step (Condenser 8-loss objective).

Replaces the HF-Trainer wiring of ``MASTER/pretrain/run_pre_training.py`` +
``trainer.py``: one jitted DP step over the mesh; bf16 activations stand in
for the reference's fp16 AMP.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from simxns_tpu.parallel.mesh import dp_axes
from simxns_tpu.train.steps import dropout_rngs, sharding_kwargs


def make_condenser_step(model, tx: optax.GradientTransformation, mesh,
                        dropout: bool = False, dropout_seed: int = 3
                        ) -> Callable:
    """``step(state, batch) -> (state, metrics)`` for the Condenser model.

    Batch = the :class:`simxns_tpu.data.collator.CondenserCollator` output
    (device-put with the batch dim sharded over ``data``).
    """

    def loss_fn(params, batch, rngs, det):
        total, parts = model.apply(params, batch, deterministic=det,
                                   rngs=rngs)
        return total, parts

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(dp_axes(mesh)))

    def step(state, batch):
        rngs, det = dropout_rngs(dropout, dropout_seed, state.step)
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rngs, det)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **parts}

    return jax.jit(step, **sharding_kwargs(mesh, (repl, shard),
                                            (repl, repl)))


def make_electra_step(model, tx: optax.GradientTransformation, mesh,
                      mask_id: int, dropout: bool = False,
                      dropout_seed: int = 4) -> Callable:
    """ELECTRA Condenser step (``MASTER/pretrain/trainer.py:35-93`` +
    ``ELECTRACondenserForPretraining.forward``): each step first generates
    realistic corruptions under stop-grad — masked positions are filled by
    the c_head's argmax predictions conditioned on the in-batch-*nearest*
    example's CLS — then trains the 4-loss ELECTRA objective on the
    replaced inputs. One jitted program per step.
    """
    from simxns_tpu.models.condenser import generate_replaced_ids

    def loss_fn(params, batch, rngs, det):
        total, parts = model.apply(params, batch, deterministic=det,
                                   rngs=rngs, method="electra_forward")
        return total, parts

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(dp_axes(mesh)))

    def step(state, batch):
        replaced_decoder, replaced_input = generate_replaced_ids(
            model, state.params, batch, mask_id)
        b2 = dict(batch)
        b2["decoder_input_ids"] = replaced_decoder
        b2["input_ids"] = replaced_input
        rngs, det = dropout_rngs(dropout, dropout_seed, state.step)
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, b2, rngs, det)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **parts}

    return jax.jit(step, **sharding_kwargs(mesh, (repl, shard),
                                            (repl, repl)))
