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

from simxns_tpu.parallel.mesh import DATA_AXIS


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
    shard = NamedSharding(mesh, P(DATA_AXIS))

    def step(state, batch):
        if dropout:
            rngs = {"dropout": jax.random.fold_in(
                jax.random.PRNGKey(dropout_seed), state.step)}
            det = False
        else:
            rngs, det = {}, True
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rngs, det)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, **parts}

    return jax.jit(step, in_shardings=(repl, shard),
                   out_shardings=(repl, repl), donate_argnums=(0,))
