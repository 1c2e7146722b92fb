"""Stall watchdog: bound device-sync waits, abort-and-retry, then raise.

Round-4 evidence: a full-size AR2 run's final whole-corpus eval mine
WEDGED — 58 minutes at 0 CPU, one ESTAB relay socket with empty queues,
main thread parked in ``futex_wait`` under a host transfer — and had to be
killed by hand, gambling the whole run on relay roulette. The reference
never faces this failure mode: its generate phase is a separate
synchronous GPU process that either finishes or crashes
(``SimANS/wiki/co_training_generate_new_train_wiki.py:266-300``).

The only proof of remote execution on this backend is a host transfer
(``parallel/sync.force_sync``), and a transfer against a wedged session
blocks *forever* — it cannot be interrupted, cancelled, or timed out from
the calling thread. So the watchdog inverts control: the transfer runs on
a disposable worker thread and the caller waits with a deadline.

- A sync that beats the deadline: normal path, ~zero overhead.
- A stalled sync: the worker is abandoned (it stays parked; nothing can
  unblock it) and the probe is *re-issued* on a fresh thread. Transient
  relay hiccups recover here — the retry's transfer finds the session
  drained and returns.
- Every attempt stalled: :class:`StallError` is raised with the phase and
  row-range context. The caller can retry the whole phase (the AR2
  runner re-runs a stalled index build from scratch) or let it
  propagate — a bounded loud failure that ``--resume auto`` turns into a
  relaunch-and-continue, instead of an unbounded silent wedge.

Retried callables MUST be idempotent: pure reads (sync probes, result
pulls). Never route a donating dispatch through a retry — a second call
would consume an already-donated buffer.
"""

from __future__ import annotations

import sys
import threading
import time
from typing import Callable, Optional

__all__ = ["StallError", "run_with_deadline", "retry_on_stall"]


class StallError(RuntimeError):
    """Every bounded attempt at a device sync stalled past its deadline."""

    def __init__(self, desc: str, deadline_s: float, attempts: int):
        self.desc = desc
        self.deadline_s = deadline_s
        self.attempts = attempts
        super().__init__(
            f"{desc}: stalled past {deadline_s:.0f}s deadline on all "
            f"{attempts} attempt(s) — device session presumed wedged")


def run_with_deadline(
    fn: Callable,
    deadline_s: Optional[float],
    desc: str = "device sync",
    retries: int = 2,
    backoff_s: float = 1.0,
):
    """Run ``fn()`` bounded by a wall deadline; re-issue it on a stall.

    ``fn`` must be an idempotent read (a ``force_sync`` probe, an
    ``np.asarray`` result pull). ``deadline_s=None`` disables the watchdog
    entirely (direct call — the CPU-mesh test path pays nothing).
    Exceptions raised by ``fn`` propagate unchanged; only a wall-clock
    stall triggers the retry ladder.
    """
    if deadline_s is None:
        return fn()
    for attempt in range(retries + 1):
        box: dict = {}

        def work():
            try:
                box["value"] = fn()
            except BaseException as e:  # noqa: BLE001 — relayed to caller
                box["error"] = e

        t = threading.Thread(
            target=work, name=f"watchdog:{desc}", daemon=True)
        t.start()
        t.join(deadline_s)
        if not t.is_alive():
            if "error" in box:
                raise box["error"]
            return box.get("value")
        print(
            f"[watchdog] {desc}: no completion in {deadline_s:.0f}s "
            f"(attempt {attempt + 1}/{retries + 1})"
            + (" — re-issuing probe" if attempt < retries else ""),
            file=sys.stderr, flush=True)
        if backoff_s and attempt < retries:
            time.sleep(backoff_s)
    raise StallError(desc, deadline_s, retries + 1)


def retry_on_stall(fn: Callable, attempts: int = 2, desc: str = "phase",
                   cleanup: Optional[Callable] = None):
    """Re-run a whole phase when it raises :class:`StallError`.

    For phase-level recovery where the inner probe retries were not
    enough: ``fn`` rebuilds its own state from scratch (e.g. a streaming
    index build re-allocates its buffer), so unlike the probe level it
    need not be a pure read — it must only be safe to run again after
    ``cleanup()``. The last attempt's StallError propagates.
    """
    for attempt in range(attempts):
        try:
            return fn()
        except StallError as e:
            print(f"[watchdog] {desc}: attempt {attempt + 1}/{attempts} "
                  f"aborted ({e})", file=sys.stderr, flush=True)
            if cleanup is not None:
                cleanup()
            if attempt == attempts - 1:
                raise
