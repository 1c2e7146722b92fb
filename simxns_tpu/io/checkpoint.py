"""Orbax checkpointing with the reference's step-indexed layout.

The reference writes ``checkpoint-<step>`` / ``checkpoint-reranker<step>``
files holding ``CheckpointState`` via ``torch.save``
(``co_training_wiki_train.py:319-367``); the outer loop resumes from the
highest step it can find (``run_progressive_distill_marco.py:167-180``).
Here: Orbax sharded checkpoints under ``<dir>/<name>-<step>/`` with the same
(params, opt_state, step) contract, plus MASTER's export path that drops the
Condenser decoder heads so the released artifact is a plain encoder
(``MASTER/pretrain/modeling.py:199-207``).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _path(directory: str, name: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"{name}-{step}")


# one shared checkpointer: constructing a StandardCheckpointer per save
# rebuilds its thread pool every call; blocking stays — save->immediate
# restore (mid-run resume tests, refresh exports consumed in-process) must
# see a complete artifact. Orbax's async overlap is a later opt-in.
_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_checkpoint(directory: str, state: Any, step: int,
                    name: str = "checkpoint") -> str:
    path = _path(directory, name, step)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str, target: Any, step: int,
                       name: str = "checkpoint") -> Any:
    path = _path(directory, name, step)
    return _checkpointer().restore(path, target=target)


def latest_step(directory: str, name: str = "checkpoint") -> Optional[int]:
    """Highest checkpointed step (the reference's resume scan)."""
    if not os.path.isdir(directory):
        return None
    pat = re.compile(rf"^{re.escape(name)}-(\d+)$")
    steps = [int(m.group(1)) for f in os.listdir(directory)
             if (m := pat.match(f))]
    return max(steps) if steps else None


def export_encoder_only(params: dict,
                        drop_prefixes: Optional[tuple] = None) -> dict:
    """MASTER artifact export: strip decoder-head params, keep the encoder.

    Mirrors ``save_pretrained`` deleting head weights so the released
    checkpoint is a plain BERT (``MASTER/pretrain/modeling.py:199-207``).
    Default prefixes come from the Condenser model itself (HEAD_NAMES) so
    a new head is never silently shipped in the "encoder-only" artifact.
    """
    if drop_prefixes is None:
        from simxns_tpu.models.condenser import HEAD_NAMES
        drop_prefixes = HEAD_NAMES

    def keep(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: keep(v) for k, v in tree.items()
                if not any(k.startswith(p) for p in drop_prefixes)}

    return keep(params)
