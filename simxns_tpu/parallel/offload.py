"""Phase-based HBM budgeting: stash dead pytrees to host RAM between phases.

The AR2 outer loop alternates two HBM regimes with disjoint working sets:

- **train window**: retriever + reranker TrainStates (params + Adam moments)
  live on device; the MIPS index is freed (``MIPSIndex.free``).
- **mine phase**: the index (6.8 GB at the 8.8M-row int8 working point) plus
  the retriever *params* live on device; the reranker state and the
  retriever's optimizer moments are dead weight — at recipe scale
  (BERT-base DE + large CE) ~10 GB of a v5e chip's 16 GB.

The reference never faces this because mining runs in a *separate process*
on other GPUs (``SimANS/train_NQ_AR2.sh:15-50`` alternates train and
generate jobs). The TPU-native single-process loop instead round-trips the
dead tree through host RAM: :class:`HostStash` captures each leaf's
sharding, transfers it to host, and **deletes the device buffer** so HBM is
actually released (dropping the Python reference alone leaves the buffer
alive until GC); ``restore()`` re-materializes the tree with the original
shardings.

Cost: one host round-trip of the stashed bytes per mine — seconds, against
a mine phase measured in minutes. The stash is explicitly NOT a checkpoint:
it lives in process memory and dies with the run (crash recovery is
``io/checkpoint.py``'s job).
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["HostStash"]


class HostStash:
    """Move a pytree of ``jax.Array`` leaves to host, freeing their HBM.

    >>> stash = HostStash(ce_state)      # HBM released here
    >>> ... run the mine phase ...
    >>> ce_state = stash.restore()       # back on device, same shardings

    Non-array leaves (step counters already on host, None, etc.) pass
    through untouched. ``restore()`` may be called once; the stash holds
    the only copy of the data in between — do not drop it.
    """

    def __init__(self, tree):
        leaves, self._treedef = jax.tree.flatten(tree)
        self._shardings = [
            leaf.sharding if isinstance(leaf, jax.Array) else None
            for leaf in leaves
        ]
        host = []
        for leaf in leaves:
            if isinstance(leaf, jax.Array):
                host.append(np.asarray(leaf))   # device -> host transfer
                leaf.delete()                   # release HBM *now*
            else:
                host.append(leaf)
        self._host = host
        self._restored = False

    def numpy_tree(self):
        """The stashed tree with numpy leaves, WITHOUT re-uploading.

        Window-boundary checkpointing uses this to write the Orbax artifact
        straight from the host copy the offload already paid for — the
        device state was pulled ONCE, and the disk write can run on a
        background thread overlapped with the mine phase (see the AR2
        runner's ``checkpoint`` closure). The returned tree shares the
        stash's buffers; callers must treat it as read-only. Capture it
        BEFORE :meth:`restore` (which drops the stash's references) — a
        tree captured earlier stays valid afterwards, numpy refcounts keep
        its leaves alive.
        """
        if self._host is None:
            raise RuntimeError("numpy_tree() after restore(): capture the "
                               "tree before handing the stash back")
        return jax.tree.unflatten(self._treedef, self._host)

    @property
    def nbytes(self) -> int:
        """Host bytes held (== HBM bytes released), for logging."""
        return sum(h.nbytes for h, s in zip(self._host, self._shardings)
                   if s is not None)

    def restore(self):
        """Re-materialize the tree on device with its original shardings."""
        if self._restored:
            raise RuntimeError("HostStash.restore() called twice — the "
                               "host copy was already handed back")
        leaves = [
            jax.device_put(h, s) if s is not None else h
            for h, s in zip(self._host, self._shardings)
        ]
        self._restored = True
        self._host = None  # drop the host copy promptly
        return jax.tree.unflatten(self._treedef, leaves)
