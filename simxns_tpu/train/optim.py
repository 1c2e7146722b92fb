"""Optimizers and schedules.

Matches the reference's training recipe (``dpr_utils.py:get_optimizer``,
``co_training_wiki_train.py:108-123``): AdamW with weight decay excluded for
bias/LayerNorm params, linear warmup then linear decay
(``get_linear_schedule_with_warmup``), and global-norm gradient clipping
(``max_grad_norm``, ``:260-267``). LAMB is included for parity with the
vendored (unused) ``PROD/ProD_KD/utils/lamb.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def linear_warmup_schedule(lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """HF ``get_linear_schedule_with_warmup``: 0 -> lr over warmup, then
    linear decay to 0 at total_steps."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps))
        return lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def _decay_mask(params) -> dict:
    """True for params that get weight decay (everything except biases and
    LayerNorm scales/biases), mirroring the reference's ``no_decay`` list."""

    def mask(path, _):
        names = [str(getattr(k, "key", k)) for k in path]
        joined = "/".join(names).lower()
        if names and names[-1] in ("bias", "b"):
            return False
        if "layer_norm" in joined or "layernorm" in joined:
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def make_adamw(
    lr: float,
    warmup_steps: int = 0,
    total_steps: int = 1_000_000,
    weight_decay: float = 0.01,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    schedule = (linear_warmup_schedule(lr, warmup_steps, total_steps)
                if total_steps else lr)
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                             weight_decay=weight_decay, mask=_decay_mask))
    return optax.chain(*chain)


def make_lamb(lr: float, warmup_steps: int = 0, total_steps: int = 1_000_000,
              weight_decay: float = 0.01,
              max_grad_norm: Optional[float] = 1.0) -> optax.GradientTransformation:
    schedule = (linear_warmup_schedule(lr, warmup_steps, total_steps)
                if total_steps else lr)
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.lamb(schedule, weight_decay=weight_decay,
                            mask=_decay_mask))
    return optax.chain(*chain)
