"""AR2 co-training soak at 100k+ passages with per-phase wall-clock split.

The round-1 on-chip demo used a 128-passage corpus; this is the first
credible end-to-end envelope for the reference's iteration structure
(``SimANS/train_NQ_AR2.sh:15-50``: train window -> re-encode -> search ->
refresh, repeated): a >=100k synthetic corpus, >=3 mining refreshes, and the
wall-clock share of every phase via ``MetricLogger.timed``.

    python scripts/soak_ar2.py             # real chip
    python scripts/soak_ar2.py --cpu       # small smoke on the CPU mesh

Prints a phase-time table and the recall trajectory; appends a JSON line to
bench_r2_results.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--corpus", type=int, default=120_000)
parser.add_argument("--queries", type=int, default=1024)
parser.add_argument("--windows", type=int, default=4)
parser.add_argument("--window-steps", type=int, default=60)
parser.add_argument("--mode", default="fused",
                    help="MIPS index mode: fused|approx|exact")
parser.add_argument("--int8", action="store_true",
                    help="SQ8-analog int8 index storage (half HBM)")
parser.add_argument("--fast-teacher", action="store_true",
                    help="retriever-step frozen reranker forward through "
                         "the fused int8 view (same params)")
parser.add_argument("--fast-encode", action="store_true",
                    help="mine through the whole-layer fused int8 encode "
                         "kernel (shared params; training stays bf16)")
args = parser.parse_args()

if args.cpu:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    args.corpus = min(args.corpus, 4096)
    args.queries = min(args.queries, 128)

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simxns_tpu.models import (  # noqa: E402
    BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder, CrossEncoderConfig)
from simxns_tpu.parallel import create_mesh, shard_batch  # noqa: E402
from simxns_tpu.index import MIPSIndex, CorpusEncoder, RetrievalEngine  # noqa: E402
from simxns_tpu.data import from_mining_result  # noqa: E402
from simxns_tpu.io.logging import MetricLogger  # noqa: E402
from simxns_tpu.train import (  # noqa: E402
    TrainState, make_adamw, make_biencoder_step, make_reranker_step,
    make_ar2_retriever_step, AR2Config, AR2CoTrainer)
from simxns_tpu.train.driver import (  # noqa: E402
    RecallGuard, check_teacher_warmth)

if args.cpu:
    import simxns_tpu.ops.mips_kernel as mk
    import simxns_tpu.ops.fused_layer as fl

    mk.INTERPRET = True
    fl.INTERPRET = True      # --fast-encode/--fast-teacher smoke on CPU

mesh = create_mesh()
print("mesh:", dict(mesh.shape), "on", jax.devices()[0].platform, flush=True)

# ---- synthetic corpus: vectorized token arrays (no Python tokenizer loop).
# Passage i carries a unique 3-token signature (base-64 digits of i) that its
# query repeats, over a COMMON 16-token background (diagnosed on the CPU
# mesh: a high-entropy random background drowns the signature in CLS
# variance and the warm-up stays at chance; a shared background makes the
# signature the dominant variance direction, like topic words over common
# prose). Answer string "fact{i}" labels hits.
N, Q = args.corpus, args.queries
V, LC, LQ, LJ, NEG = 4096, 64, 16, 80, 3
CLS, SEP, BASE = 1, 3, 5
JUNK_LO, JUNK_HI = 256 + BASE, 256 + BASE + 16
rng = np.random.default_rng(0)

def signature(idx):
    d0 = idx % 64
    d1 = (idx // 64) % 64
    d2 = idx // 4096
    return np.stack([BASE + d0, BASE + 64 + d1, BASE + 128 + d2], axis=-1)

corpus_ids = rng.integers(JUNK_LO, JUNK_HI, size=(N, LC)).astype(np.int32)
corpus_ids[:, 0] = CLS
corpus_ids[:, 1:4] = signature(np.arange(N))
corpus_ids[:, LC - 1] = SEP
corpus_mask = np.ones_like(corpus_ids)

q_perm = rng.permutation(N)[:Q]                  # which passages get queries
query_ids = rng.integers(JUNK_LO, JUNK_HI, size=(Q, LQ)).astype(np.int32)
query_ids[:, 0] = CLS
query_ids[:, 1:4] = signature(q_perm)
query_ids[:, 4: LQ - 1] = corpus_ids[q_perm, 4: 4 + LQ - 5]
query_ids[:, LQ - 1] = SEP
query_mask = np.ones_like(query_ids)

passages = {i: (f"fact{i}", f"t{i}") for i in range(N)}
questions = [f"which fact{p}" for p in q_perm]
answers = [[f"fact{p}"] for p in q_perm]

cfg = BertConfig(
    vocab_size=V, hidden_size=256, num_layers=4, num_heads=4,
    intermediate_size=1024, max_position_embeddings=128,
    hidden_dropout=0.0, attention_dropout=0.0,
    dtype=jnp.float32 if args.cpu else jnp.bfloat16)
de = BiEncoder(BiEncoderConfig(bert=cfg))
ce = CrossEncoder(CrossEncoderConfig(bert=cfg))
# 3e-3 collapses this 4L post-LN model in epoch 0 (loss pins at ln(C),
# grads vanish — diagnosed on the CPU mesh); 5e-4 trains stably.
tx = make_adamw(5e-4, total_steps=0)
de_state = TrainState.create(
    de.init(jax.random.PRNGKey(0), query_ids[:2], query_mask[:2],
            corpus_ids[:2], corpus_mask[:2]), tx)
ce_state = TrainState.create(
    ce.init(jax.random.PRNGKey(1), np.ones((2, LJ), np.int32),
            np.ones((2, LJ), np.int32)), tx)

log = MetricLogger()
store = (jnp.int8 if args.int8
         else jnp.float32 if args.cpu else jnp.bfloat16)
index = MIPSIndex(mesh, block_size=2048, mode=args.mode, store_dtype=store)
engine = RetrievalEngine(index, passages, logger=log)
chunk = 1024 if args.cpu else 4096
# --fast-encode: a fused-int8-layer VIEW of the same params for mining
# (param trees interchange across layer_impl; training stays bf16)
enc_de = de
if args.fast_encode:
    enc_de = BiEncoder(BiEncoderConfig(
        bert=cfg.replace(layer_impl="fused_int8")))
p_enc = CorpusEncoder(
    lambda p, i, m: enc_de.apply(p, i, m, method="encode_passage"), mesh,
    chunk)
q_enc = CorpusEncoder(
    lambda p, i, m: enc_de.apply(p, i, m, method="encode_query"), mesh,
    chunk)

K = 100


def mine(state):
    with log.timed("encode_corpus"):
        emb = p_enc(state.params, corpus_ids, corpus_mask)
        index.build(emb)
    with log.timed("encode_queries"):
        q_emb = q_enc(state.params, query_ids, query_mask)
    return engine.mine(q_emb, questions, answers, k=K)


def dataset_from(res, seed):
    with log.timed("dataset_build"):
        return from_mining_result(
            corpus_ids, query_ids, res, num_negatives=NEG,
            max_joint_length=LJ, sep_id=SEP, seed=seed,
            simans_mode="quadratic", simans_a=0.5)


t_start = time.time()
# ---- warm-up: gold-pair contrastive DE + grouped-CE reranker --------------
gold = type("R", (), {
    "topk_ids": np.concatenate(
        [q_perm[:, None], rng.integers(0, N, (Q, K - 1))], axis=1),
    "topk_scores": np.tile(np.linspace(5, 1, K, dtype=np.float32), (Q, 1)),
    "hits": [[j == 0 for j in range(K)] for _ in range(Q)]})()
warm_ds = dataset_from(gold, 0)
warm = make_biencoder_step(de, tx, mesh, grad_mode="full")
ce_warm = make_reranker_step(ce, tx, mesh, group_size=1 + NEG)
# The CE teacher must be genuinely warm before AR2's KL step: distilling
# an undertrained reranker COLLAPSES the retriever (measured: the 128-query
# CPU smoke gave the CE only 8 warm steps and recall fell 0.30 -> 0.00
# within one 20-step KL window, for bf16 and int8 indexes alike). Scale CE
# warm epochs so small runs still see >= ~48 teacher steps.
ce_epochs = max(4, -(-48 * 64 // max(Q, 1)))
ce_steps = 0
with log.timed("warmup"):
    for epoch in range(16):
        for b in warm_ds.batches(batch_size=64, with_joint=False):
            de_state, wm = warm(de_state, shard_batch(b, mesh))
    for epoch in range(ce_epochs):
        for b in warm_ds.batches(batch_size=64):
            dev = shard_batch({"joint_ids": b["joint_ids"],
                               "joint_mask": b["joint_mask"]}, mesh)
            ce_state, cm = ce_warm(ce_state, dev)
            ce_steps += 1
check_teacher_warmth(ce_steps)   # library-level adequacy floor (48 steps)

guard = RecallGuard()
res = mine(de_state)
recalls = [res.top_k_hits[0]]
guard.update(res.top_k_hits[0])
print(f"after warm-up: top1={res.top_k_hits[0]:.3f} "
      f"top100={res.top_k_hits[K - 1]:.3f}", flush=True)

# ---- co-training windows ---------------------------------------------------
tx_r = make_adamw(3e-4, total_steps=0)
tx_c = make_adamw(1e-4, total_steps=0)
de_state = TrainState.create(de_state.params, tx_r)
ce_state = TrainState.create(ce_state.params, tx_c)
# --fast-teacher: the frozen reranker fwd inside the retriever step
# through the fused int8 view (params shared with the trained ce)
ce_teacher = ce
if args.fast_teacher:
    from simxns_tpu.models import CrossEncoderConfig as _CEC
    ce_teacher = CrossEncoder(_CEC(bert=cfg.replace(
        layer_impl="fused_int8")))
r_step = make_ar2_retriever_step(de, ce_teacher, tx_r, mesh, adv_lambda=0.0)
c_step = make_reranker_step(ce, tx_c, mesh, group_size=1 + NEG)

current = dataset_from(res, 1)


def refresh(state, gstep):
    r = mine(state)
    recalls.append(r.top_k_hits[0])
    guard.update(r.top_k_hits[0])
    print(f"  refresh@{gstep}: top1={r.top_k_hits[0]:.3f}", flush=True)
    ds = dataset_from(r, gstep)
    return (lambda: ds.batches(batch_size=64)) if len(ds) >= 64 else None


trainer = AR2CoTrainer(
    mesh,
    AR2Config(iteration_step=args.window_steps,
              iteration_reranker_step=args.window_steps // 3,
              max_steps=args.windows * args.window_steps, log_every=50),
    de_state, ce_state, r_step, c_step,
    batches=lambda: current.batches(batch_size=64),
    refresh_fn=refresh, metric_logger=log)
trainer.run()

total_s = time.time() - t_start
final = mine(trainer.de_state)
recalls.append(final.top_k_hits[0])
guard.update(final.top_k_hits[0])

phases = dict(log.phase_times)
phases["train_steps"] = total_s - sum(phases.values())
print("\n=== phase wall-clock split ===")
for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
    print(f"  {k:16s} {v:8.1f}s  {100 * v / total_s:5.1f}%")
print(f"  {'TOTAL':16s} {total_s:8.1f}s")
print("recall@1 trajectory:", [round(r, 3) for r in recalls])
print(f"final: top1={final.top_k_hits[0]:.3f} "
      f"top5={final.top_k_hits[4]:.3f} MRR@10={final.metrics['MRR_n@_10']:.3f}")

rec = {"stage": "soak_ar2", "corpus": N, "queries": Q,
       "windows": args.windows, "mode": args.mode,
       "store": "int8" if args.int8 else "bf16",
       "encode": "fused_layer" if args.fast_encode else "bf16",
       "teacher": "fused_int8" if args.fast_teacher else "bf16",
       "recall_trajectory": [round(r, 4) for r in recalls],
       "total_s": round(total_s, 1),
       "phase_times_s": {k: round(v, 1) for k, v in phases.items()}}
with open("/root/repo/bench_r2_results.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print("RESULT", json.dumps(rec), flush=True)

# co-training must never END below its starting recall (VERDICT r2 weak #5:
# two CPU-smoke rows collapsed silently — cold CE teacher; the guard above
# now warns at the drop and this assertion makes the soak itself fail)
assert guard.ok(), (
    f"co-training recall ended below its start: {recalls} — see "
    "check_teacher_warmth / RecallGuard (train/driver.py)")
