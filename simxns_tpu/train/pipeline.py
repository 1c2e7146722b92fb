"""Multi-stage training pipelines (PROD progressive distillation, MASTER
finetune) as host-level drivers.

The reference runs these as hand-executed sequences of shell commands
(``PROD/README.md:69-399``: warm-up DE -> inference + data refresh -> CE
training -> KD stage 1 -> rerank refresh -> KD stage 2 -> dataset division
-> LwF round; ``MASTER/finetune/ft_MS_MASTER.sh``: BM25 warmup -> hardneg
refresh -> retrain -> CE -> co-training). Here a pipeline is a list of
:class:`Stage` objects executed in-process, sharing the mesh, the
HBM-resident index, and checkpoints — no process relaunches, no disk
embedding round-trips.

Each stage is deliberately thin: ``run(ctx) -> dict`` receives a mutable
context carrying states/datasets/index and returns metrics. Prebuilt stage
constructors cover the reference's recurring phases:

- :func:`train_stage`   — N steps of any ``(state, batch) -> (state, m)``
  step function over a dataset (optionally with teacher params).
- :func:`refresh_stage` — re-encode corpus, mine top-k, rebuild the dataset
  from the mined examples (the "data refresh" / ``--write_hardneg`` phase).
- :func:`division_stage`— PROD's teacher-good/student-bad subset selection
  feeding the final LwF round.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, List, Optional

logger = logging.getLogger("simxns_tpu.pipeline")


@dataclasses.dataclass
class Stage:
    name: str
    run: Callable[[Dict[str, Any]], Dict[str, Any]]


class Pipeline:
    """Execute stages sequentially over a shared mutable context."""

    def __init__(self, stages: List[Stage], ctx: Optional[Dict] = None):
        self.stages = stages
        self.ctx: Dict[str, Any] = ctx or {}
        self.history: List[Dict] = []

    def run(self) -> Dict[str, Any]:
        for stage in self.stages:
            t0 = time.time()
            metrics = stage.run(self.ctx) or {}
            rec = {"stage": stage.name, "seconds": time.time() - t0,
                   **{k: v for k, v in metrics.items()
                      if isinstance(v, (int, float, str))}}
            self.history.append(rec)
            logger.info("%s", rec)
        self.ctx["history"] = self.history
        return self.ctx


def train_stage(name: str, state_key: str, step_fn: Callable,
                batches: Callable, num_steps: int,
                teacher_keys: Optional[List[str]] = None,
                device_batch: Optional[Callable] = None) -> Stage:
    """Run ``num_steps`` of ``step_fn`` updating ``ctx[state_key]``.

    ``teacher_keys`` selects frozen param trees from the context to pass as
    the step's teacher dict (KD steps); ``device_batch`` maps host batches
    to device (defaults to ``parallel.shard_batch`` w/o 'answers').
    """

    def run(ctx):
        from simxns_tpu.train.driver import _device_batch

        put = device_batch or (lambda b: _device_batch(b, ctx["mesh"]))
        state = ctx[state_key]
        it = iter(batches(ctx))
        last = {}
        for i in range(num_steps):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(batches(ctx))
                batch = next(it)
            dev = put(batch)
            if teacher_keys:
                teachers = {k: ctx[k] for k in teacher_keys}
                state, metrics = step_fn(state, teachers, dev)
            else:
                state, metrics = step_fn(state, dev)
            last = metrics
        ctx[state_key] = state
        return {"steps": num_steps,
                "loss": float(last.get("loss", float("nan")))}

    return Stage(name, run)


def refresh_stage(name: str, encode_corpus: Callable, encode_queries: Callable,
                  questions, answers, k: int = 100,
                  dataset_key: str = "dataset",
                  build_dataset: Optional[Callable] = None) -> Stage:
    """Re-encode -> mine -> rebuild dataset (the generate phase)."""

    def run(ctx):
        engine = ctx["engine"]
        index = ctx["index"]
        corpus_emb = encode_corpus(ctx)
        index.build(corpus_emb)
        q_emb = encode_queries(ctx)
        res = engine.mine(q_emb, questions, answers, k=k)
        ctx["last_mining"] = res
        if build_dataset is not None:
            ctx[dataset_key] = build_dataset(ctx, res)
        return {"top1": res.top_k_hits[0] if res.top_k_hits else 0.0,
                "mined": len(res.train_examples)}

    return Stage(name, run)


def division_stage(name: str, student_ranked_key: str, teacher_ranked_key: str,
                   qrels, out_key: str = "lwf_qids",
                   student_bucket: str = "2t15",
                   teacher_bucket: str = "top1") -> Stage:
    """PROD dataset division: select teacher-good/student-bad queries."""

    def run(ctx):
        from simxns_tpu.data.division import teacher_better_qids

        qids = teacher_better_qids(ctx[student_ranked_key],
                                   ctx[teacher_ranked_key], qrels,
                                   student_bucket, teacher_bucket)
        ctx[out_key] = qids
        return {"selected": len(qids)}

    return Stage(name, run)
