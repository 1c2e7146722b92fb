"""AR2 co-training driver — the outer loop as one Python object.

Replaces the reference's bash relaunch pipeline (``SimANS/train_NQ_AR2.sh:
15-50``: for-loop over global steps re-launching train and generate scripts)
and the in-process ``train_flag`` machine (``co_training_wiki_train.py:
294-306``):

- within each ``iteration_step`` window: first ``iteration_reranker_step``
  global steps train the reranker (grouped CE), the rest train the retriever
  (KL-to-reranker + adv reward);
- at each window boundary: checkpoint, re-encode the corpus, mine top-k with
  the MIPS index, relabel hits, regenerate the training set (scores feed the
  SimANS sampler), continue — no process relaunch, no disk round-trip for
  embeddings.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from simxns_tpu.parallel.mesh import shard_batch

logger = logging.getLogger("simxns_tpu.train")


@dataclasses.dataclass
class AR2Config:
    iteration_step: int = 2000          # window between mining phases
    iteration_reranker_step: int = 500  # reranker steps per window
    max_steps: int = 30_000
    batch_size: int = 64
    log_every: int = 100


def _device_batch(batch: Dict, mesh):
    return shard_batch({k: v for k, v in batch.items() if k != "answers"}, mesh)


MIN_TEACHER_WARM_STEPS = 48


def check_teacher_warmth(ce_warm_steps: int,
                         min_steps: int = MIN_TEACHER_WARM_STEPS) -> bool:
    """Warn when the CE teacher is too cold to distill from.

    AR2's retriever step is a KL toward the reranker's distribution; an
    undertrained teacher actively DESTROYS the retriever. Measured (round
    2, CPU smoke, bench_r2_results.jsonl): 8 CE warm steps -> recall@1
    0.30 -> 0.00 within one 20-step KL window; >= ~48 teacher steps trains
    stably. The reference sidesteps this by loading a finetuned
    ``checkpoint-reranker26000`` before co-training
    (``co_training_wiki_train.py:138-147``). Returns False (and warns) when
    under the measured floor.
    """
    if ce_warm_steps >= min_steps:
        return True
    logger.warning(
        "CE teacher warmed for only %d steps (< %d, the measured adequacy "
        "floor): AR2's KL-to-reranker can collapse the retriever. Warm the "
        "reranker longer or load a finetuned checkpoint (the reference "
        "loads checkpoint-reranker26000).", ce_warm_steps, min_steps)
    return False


class RecallGuard:
    """Watch the co-training recall trajectory; make collapse loud.

    Co-training should never end below its starting recall — when it does,
    the almost-always cause is a cold CE teacher (see
    :func:`check_teacher_warmth`). ``update`` warns on the first reading
    below ``warn_ratio * start`` and returns False (collapse) below
    ``collapse_ratio * start``; ``ok()`` is the end-of-run assertion.
    """

    def __init__(self, warn_ratio: float = 0.8, collapse_ratio: float = 0.5):
        self.warn_ratio = warn_ratio
        self.collapse_ratio = collapse_ratio
        self.trajectory: List[float] = []
        self._warned = False

    @property
    def start(self) -> Optional[float]:
        return self.trajectory[0] if self.trajectory else None

    def update(self, recall: float) -> bool:
        self.trajectory.append(float(recall))
        start = self.trajectory[0]
        if start <= 0:
            return True
        if recall < self.collapse_ratio * start:
            logger.error(
                "co-training recall COLLAPSED: %.3f -> %.3f (trajectory "
                "%s). Likely cause: undertrained CE teacher (see "
                "check_teacher_warmth).", start, recall,
                [round(r, 3) for r in self.trajectory])
            return False
        if not self._warned and recall < self.warn_ratio * start:
            self._warned = True
            logger.warning(
                "co-training recall dropping: %.3f -> %.3f; watch the "
                "trajectory (collapse threshold %.3f).", start, recall,
                self.collapse_ratio * start)
        return True

    def ok(self) -> bool:
        """End-of-run check: final recall must not sit below the start."""
        if len(self.trajectory) < 2 or self.trajectory[0] <= 0:
            return True
        return self.trajectory[-1] >= self.trajectory[0]


class AR2CoTrainer:
    """Alternating retriever/reranker trainer with periodic mining.

    Parameters
    ----------
    retriever_step: ``(de_state, ce_params, batch) -> (de_state, metrics)``
    reranker_step:  ``(ce_state, batch) -> (ce_state, metrics)``
    batches:        callable yielding host batches (one epoch; re-invoked)
    refresh_fn:     called at each window boundary with the current
                    ``(de_state, global_step)``; returns a new ``batches``
                    callable built from freshly mined data (or None to keep)
    checkpoint_fn:  optional ``(de_state, ce_like, global_step) -> None``;
                    ``ce_like`` is the live reranker TrainState — except
                    when ``offload_refresh`` is on, where it is the
                    :class:`~simxns_tpu.parallel.offload.HostStash` holding
                    that state on host (call ``.numpy_tree()``), so the
                    checkpoint reuses the offload's one device->host pull
    offload_refresh: stash the reranker state to host RAM for the duration
                    of each ``refresh_fn`` call (it is dead weight while the
                    corpus re-encodes and the index searches — at recipe
                    scale ~4 GB the mine phase needs; see
                    ``parallel/offload.HostStash``)
    """

    def __init__(
        self,
        mesh,
        cfg: AR2Config,
        de_state,
        ce_state,
        retriever_step: Callable,
        reranker_step: Callable,
        batches: Callable,
        refresh_fn: Optional[Callable] = None,
        checkpoint_fn: Optional[Callable] = None,
        metric_logger=None,
        offload_refresh: bool = False,
    ):
        self.mesh = mesh
        self.cfg = cfg
        self.de_state = de_state
        self.ce_state = ce_state
        self.retriever_step = retriever_step
        self.reranker_step = reranker_step
        self.batches = batches
        self.refresh_fn = refresh_fn
        self.checkpoint_fn = checkpoint_fn
        self.metric_logger = metric_logger
        self.offload_refresh = offload_refresh
        self.global_step = 0
        self.history: List[Dict] = []
        self.batches_dirty = False  # set when a refresh swapped `batches`

    def _flag(self) -> int:
        """1 = train reranker, 0 = train retriever (reference flag values).

        Derived from the reference's post-step transitions
        (``co_training_wiki_train.py:294-306``): step s runs under the flag
        set after step s-1, which is 1 iff ``(s-1) % iteration_step <=
        iteration_reranker_step`` — including the quirky extra reranker step
        at the == boundary, where the reference leaves the flag unchanged.
        """
        r = self.global_step % self.cfg.iteration_step
        return 1 if r <= self.cfg.iteration_reranker_step else 0

    def run(self, num_steps: Optional[int] = None) -> Dict:
        cfg = self.cfg
        target = min(self.cfg.max_steps,
                     self.global_step + (num_steps if num_steps is not None
                                         else self.cfg.max_steps))
        it = iter(self.batches())
        t0 = time.time()
        while self.global_step < target:
            try:
                batch = next(it)
            except StopIteration:
                it = iter(self.batches())
                try:
                    batch = next(it)
                except StopIteration:
                    # a refreshed dataset can come back with < batch_size
                    # usable queries (mining found too few hits); surface a
                    # real error instead of a bare StopIteration from `run`
                    raise RuntimeError(
                        "AR2CoTrainer: batches() yielded no batches "
                        "(mined dataset too small for the batch size)"
                    ) from None
            flag = self._flag()
            dev = _device_batch(batch, self.mesh)
            if flag == 1:
                self.ce_state, metrics = self.reranker_step(self.ce_state, dev)
                which = "reranker"
            else:
                self.de_state, metrics = self.retriever_step(
                    self.de_state, self.ce_state.params, dev)
                which = "retriever"
            self.global_step += 1

            if self.global_step % cfg.log_every == 0:
                rec = {"step": self.global_step, "mode": which,
                       "loss": float(metrics["loss"]),
                       "sec": time.time() - t0}
                self.history.append(rec)
                logger.info("%s", rec)
                if self.metric_logger is not None:
                    self.metric_logger.log(
                        self.global_step,
                        {"loss": rec["loss"]}, phase=which)

            if self.global_step % cfg.iteration_step == 0:
                self._window_boundary()
                if self.batches_dirty:
                    it = iter(self.batches())
                    self.batches_dirty = False
        return {"global_step": self.global_step, "history": self.history}

    def _timed(self, phase: str):
        if self.metric_logger is not None:
            return self.metric_logger.timed(phase)
        import contextlib

        return contextlib.nullcontext()

    def _window_boundary(self) -> None:
        """Checkpoint + refresh at an ``iteration_step`` boundary.

        Order matters on a relay-attached chip (round-4 measurement: the
        naive checkpoint-then-offload sequence cost 548 s per boundary at
        recipe scale, ~25% of the iteration):

        1. ``train_drain``: force pending step execution so the next
           timers charge their own work, not the window's backlog;
        2. offload: ONE device->host pull of the reranker state frees its
           HBM for the index AND doubles as the checkpoint's host copy —
           ``checkpoint_fn`` receives the :class:`HostStash` itself when
           ``offload_refresh`` is on (its ``numpy_tree()`` is the state),
           so the state never crosses the wire twice;
        3. checkpoint (the AR2 runner writes Orbax from host copies on a
           background thread, overlapping the mine phase that follows);
        4. refresh (mine + rebuild the dataset), then restore the stash.
        """
        if self.checkpoint_fn is None and self.refresh_fn is None:
            return
        with self._timed("train_drain"):
            from simxns_tpu.parallel.sync import force_sync

            force_sync(self.de_state, self.ce_state)
        stash = None
        if self.offload_refresh and self.refresh_fn is not None:
            from simxns_tpu.parallel.offload import HostStash

            with self._timed("offload_stash"):
                stash = HostStash(self.ce_state)
        if self.checkpoint_fn is not None:
            self.checkpoint_fn(self.de_state,
                               stash if stash is not None else self.ce_state,
                               self.global_step)
        if self.refresh_fn is not None:
            new_batches = self.refresh_fn(self.de_state, self.global_step)
            if stash is not None:
                with self._timed("offload_restore"):
                    self.ce_state = stash.restore()
            if new_batches is not None:
                self.batches = new_batches
                self.batches_dirty = True
