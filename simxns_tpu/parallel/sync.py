"""Forced device synchronization for honest phase timing.

On the relay-attached TPU backend this repo targets, ``block_until_ready``
can return at *dispatch* time — long before remote execution completes —
so ``MetricLogger.timed`` phases that end without a host transfer read
dispatch latency, not work (measured round 4: a 2000-step warmup window
"took" 212 s by its timer while ~30 minutes of real execution drained into
the next phase's bucket). The only proof of execution is a host transfer
of data the pending programs produce.

:func:`force_sync` fetches one element per array leaf of the given pytrees,
reduced on device into a single f32 vector, so exactly one tiny transfer
crosses the wire regardless of tree size. Cost: microseconds of wire time
plus whatever execution was genuinely still pending (which is the point).

The reference never needs this — synchronous CUDA timing via
``torch.cuda.synchronize`` is implicit in its per-step logging
(``SimANS/wiki/co_training_wiki_train.py:276-292``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["force_sync"]


def force_sync(*trees) -> None:
    """Block until every pending program producing ``trees`` has executed.

    Accepts any pytrees; non-``jax.Array`` leaves (numpy, python scalars,
    None) are ignored. Probes one element per leaf — never a full copy —
    so syncing a multi-GB sharded index buffer costs one scalar gather.
    """
    leaves = [
        leaf
        for tree in trees
        for leaf in jax.tree.leaves(tree)
        if isinstance(leaf, jax.Array)
    ]
    if not leaves:
        return
    probes = []
    for leaf in leaves:
        probe = leaf[(0,) * leaf.ndim] if leaf.ndim else leaf
        probes.append(probe.astype(jnp.float32))
    # one stacked transfer: completion of this fetch proves completion of
    # every producer (each probe depends on its own leaf's final value)
    np.asarray(jnp.stack(probes))
