"""Runnable end-to-end AR2+SimANS demo on a synthetic corpus.

Covers the full reference pipeline in one process (SURVEY.md §3.1-3.2):
contrastive warm-up -> build the HBM index -> alternating reranker/retriever
co-training with SimANS-sampled negatives -> periodic re-encode + mine +
dataset refresh on the token-array fast path -> final eval.

Runs on the virtual 8-device CPU mesh by default (~2 min); pass --tpu to run
on real chips.

    python examples/ar2_synthetic.py [--tpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--tpu", action="store_true")
parser.add_argument("--corpus", type=int, default=128)
parser.add_argument("--queries", type=int, default=64)
parser.add_argument("--steps", type=int, default=60)
args = parser.parse_args()

if not args.tpu:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if not args.tpu:
    jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simxns_tpu.models import (  # noqa: E402
    BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder, CrossEncoderConfig)
from simxns_tpu.parallel import create_mesh, shard_batch  # noqa: E402
from simxns_tpu.index import (  # noqa: E402
    MIPSIndex, CorpusEncoder, RetrievalEngine)
from simxns_tpu.data import HashTokenizer, from_mining_result  # noqa: E402
from simxns_tpu.train import (  # noqa: E402
    TrainState, make_adamw, make_biencoder_step, make_reranker_step,
    make_ar2_retriever_step, AR2Config, AR2CoTrainer)

mesh = create_mesh()
print("mesh:", dict(mesh.shape), "on", jax.devices()[0].platform)

tok = HashTokenizer(vocab_size=2048)
rng = np.random.default_rng(0)
N, Q, LC, LQ, LJ, NEG = args.corpus, args.queries, 20, 12, 28, 3
M = 1 + NEG

passages = {i: (f"document {i} mentions fact{i} and topic{i % 7}", f"t{i}")
            for i in range(N)}
corpus_ids = np.zeros((N, LC), np.int32)
for i in range(N):
    enc = tok.encode(passages[i][1], text_pair=passages[i][0], max_length=LC)
    corpus_ids[i, : len(enc)] = enc
corpus_mask = (corpus_ids != 0).astype(np.int32)

questions = [f"document {i} fact{i}" for i in range(Q)]
answers = [[f"fact{i}"] for i in range(Q)]
query_ids = np.zeros((Q, LQ), np.int32)
for i, q in enumerate(questions):
    enc = tok.encode(q, max_length=LQ)
    query_ids[i, : len(enc)] = enc
query_mask = (query_ids != 0).astype(np.int32)

cfg = BertConfig.tiny(vocab_size=2048)
de = BiEncoder(BiEncoderConfig(bert=cfg))
ce = CrossEncoder(CrossEncoderConfig(bert=cfg))
tx = make_adamw(3e-3, total_steps=0)
de_state = TrainState.create(
    de.init(jax.random.PRNGKey(0), query_ids[:2], query_mask[:2],
            corpus_ids[:2], corpus_mask[:2]), tx)
ce_state = TrainState.create(
    ce.init(jax.random.PRNGKey(1), np.ones((2, LJ), np.int32),
            np.ones((2, LJ), np.int32)), tx)

index = MIPSIndex(mesh, block_size=32,
                  store_dtype=jnp.float32 if not args.tpu else jnp.bfloat16)
engine = RetrievalEngine(index, passages)
p_enc = CorpusEncoder(
    lambda p, i, m: de.apply(p, i, m, method="encode_passage"), mesh, 64)
q_enc = CorpusEncoder(
    lambda p, i, m: de.apply(p, i, m, method="encode_query"), mesh, 64)


def mine(state, k=10):
    index.build(p_enc(state.params, corpus_ids, corpus_mask))
    return engine.mine(q_enc(state.params, query_ids, query_mask),
                       questions, answers, k=k)


def dataset_from(res, seed):
    return from_mining_result(corpus_ids, query_ids, res,
                              num_negatives=NEG, max_joint_length=LJ,
                              sep_id=tok.sep_token_id, seed=seed,
                              simans_mode="quadratic", simans_a=0.5)


# ---- phase 1: contrastive warm-up on gold pairs --------------------------
gold = type("R", (), {
    "topk_ids": np.stack([np.r_[i, rng.permutation(N)[:9]] for i in range(Q)]),
    "topk_scores": np.tile(np.linspace(5, 1, 10, dtype=np.float32), (Q, 1)),
    "hits": [[j == 0 for j in range(10)] for _ in range(Q)]})()
warm_ds = dataset_from(gold, 0)
warm = make_biencoder_step(de, tx, mesh, grad_mode="full")
for epoch in range(25):
    for b in warm_ds.batches(batch_size=16, with_joint=False):
        de_state, wm = warm(de_state, shard_batch(b, mesh))
res = mine(de_state)
print(f"after DE warm-up: top1={res.top_k_hits[0]:.2f} "
      f"top5={res.top_k_hits[4]:.2f} MRR@10={res.metrics['MRR_n@_10']:.2f}")

# warm the reranker too — AR2 assumes BOTH models start from trained
# checkpoints (the reference loads a finetuned DE and checkpoint-reranker26000;
# co-training a retriever against a random reranker degrades it).
ce_warm = make_reranker_step(ce, tx, mesh, group_size=M)
for epoch in range(40):
    for b in warm_ds.batches(batch_size=16):
        dev = shard_batch({"joint_ids": b["joint_ids"],
                           "joint_mask": b["joint_mask"]}, mesh)
        ce_state, cm = ce_warm(ce_state, dev)
print(f"after CE warm-up: reranker acc {int(cm['correct'])}/16")

# ---- phase 2: AR2 co-training with periodic mining refresh ---------------
# launcher recipe: adv_lambda=0 (--normal_loss), temperature 1; the
# co-training learning rates are much smaller than warm-up (the reference
# uses 1e-5 retriever / 1e-6 reranker on warm checkpoints)
tx_r = make_adamw(3e-4, total_steps=0)
tx_c = make_adamw(1e-4, total_steps=0)
de_state = TrainState.create(de_state.params, tx_r)
ce_state = TrainState.create(ce_state.params, tx_c)
r_step = make_ar2_retriever_step(de, ce, tx_r, mesh, adv_lambda=0.0)
c_step = make_reranker_step(ce, tx_c, mesh, group_size=M)
recalls = [res.top_k_hits[0]]


def refresh(state, gstep):
    r = mine(state)
    recalls.append(r.top_k_hits[0])
    print(f"  refresh@{gstep}: top1={r.top_k_hits[0]:.2f} "
          f"usable={len(dataset_from(r, gstep))}")
    ds = dataset_from(r, gstep)
    if len(ds) < 16:
        return None
    return lambda: ds.batches(batch_size=16)


trainer = AR2CoTrainer(
    mesh,
    AR2Config(iteration_step=20, iteration_reranker_step=8,
              max_steps=args.steps, log_every=20),
    de_state, ce_state, r_step, c_step,
    batches=refresh(de_state, 0) or (lambda: warm_ds.batches(batch_size=16)),
    refresh_fn=refresh)
out = trainer.run()

final = mine(trainer.de_state, k=20)
print(f"final: top1={final.top_k_hits[0]:.2f} top5={final.top_k_hits[4]:.2f} "
      f"MRR@10={final.metrics['MRR_n@_10']:.2f} "
      f"nDCG@10={final.metrics['nDCG_n@_10']:.3f}")
print("recall@1 across refreshes:", [round(r, 2) for r in recalls])
