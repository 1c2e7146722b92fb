"""Metric logging: JSON-lines + optional TensorBoard.

The reference logs scalars to TensorBoard on rank 0 and appends to
``output_dir/log.txt`` (``co_training_wiki_train.py:276-292,665-678``).
Here: a single :class:`MetricLogger` writing JSON-lines (machine-readable,
diffable against the reference's published ``log.txt`` regressions) and, if
TensorBoard is importable, mirroring scalars there. Includes the wall-clock
phase timers the reference lacks (SURVEY.md §5.1) — the 2x end-to-end claim
needs per-phase timing built in.
"""

from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional

logger = logging.getLogger("simxns_tpu")


class MetricLogger:
    def __init__(self, output_dir: Optional[str] = None,
                 tensorboard: bool = False):
        self.output_dir = output_dir
        self._fh = None
        self._tb = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._fh = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        if tensorboard and not output_dir:
            logger.warning("tensorboard=True needs output_dir (an implicit "
                           "./runs/<ts> CWD dump is never wanted); skipped")
        elif tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=output_dir)
            except Exception:
                logger.warning("tensorboard unavailable; JSON-lines only")
        self.phase_times: Dict[str, float] = {}

    def log(self, step: int, scalars: Dict[str, float], phase: str = "train"):
        rec = {"step": step, "phase": phase, "time": time.time(), **scalars}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{phase}/{k}", v, step)
        logger.info("%s", rec)

    @contextmanager
    def timed(self, phase: str):
        """Wall-clock phase timer (train window / corpus encode / search).

        try/finally: a phase that RAISES still records its elapsed time —
        the failed (usually longest) phase is exactly the one the
        per-phase evidence must not lose.
        """
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.phase_times[phase] = self.phase_times.get(phase, 0.0) + dt
            self.log(0, {"seconds": dt}, phase=f"timer/{phase}")

    @contextmanager
    def trace(self, name: str = "trace"):
        """jax.profiler trace scope writing to ``output_dir/traces/<name>``
        (the profiling the reference lacks entirely, SURVEY.md §5.1).
        View with TensorBoard's profile plugin or Perfetto."""
        import jax

        if not self.output_dir:
            raise ValueError("trace() needs MetricLogger(output_dir=...) — "
                             "refusing to scatter ./traces into the CWD")
        path = os.path.join(self.output_dir, "traces", name)
        os.makedirs(path, exist_ok=True)
        with jax.profiler.trace(path):
            yield
        logger.info("profiler trace written to %s", path)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()
