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
    checkpoint_fn:  optional ``(de_state, ce_state, global_step) -> None``
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
        self.global_step = 0
        self.history: List[Dict] = []

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
                     self.global_step + (num_steps or self.cfg.max_steps))
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
                if self.checkpoint_fn is not None:
                    self.checkpoint_fn(self.de_state, self.ce_state,
                                       self.global_step)
                if self.refresh_fn is not None:
                    new_batches = self.refresh_fn(self.de_state,
                                                  self.global_step)
                    if new_batches is not None:
                        self.batches = new_batches
                        it = iter(self.batches())
        return {"global_step": self.global_step, "history": self.history}
