"""Headline benchmark: corpus-encode throughput (the mining-phase hot loop).

The only wall-clock number the reference publishes is "Evaluation 3h totally"
for the 8-GPU MARCO corpus encode + search (``MASTER/finetune/
ft_MS_MASTER.sh:23``, SURVEY.md §6): 8.8M passages / 8 A100s / 3h
~= 102 passages/s per A100 for the encode-dominated mine phase. That is the
``vs_baseline`` denominator (per-chip).

This benchmark encodes a synthetic corpus with the flagship BERT-base dual
encoder (bf16, seq 128, CLS pooling) through the real
``simxns_tpu.index.CorpusEncoder`` path on whatever chips are present, then
runs a sharded MIPS top-100 search over the encoded corpus to include the
search share of the phase, and reports passages/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_REF_PASSAGES_PER_SEC_PER_GPU = 8_800_000 / 8 / (3 * 3600)  # ~101.9


def main():
    import jax
    import jax.numpy as jnp

    from simxns_tpu.index import CorpusEncoder, MIPSIndex
    from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
    from simxns_tpu.parallel import create_mesh

    mesh = create_mesh()
    n_chips = int(np.prod(list(mesh.shape.values())))

    cfg = BiEncoderConfig(
        bert=BertConfig(num_layers=12, hidden_size=768, num_heads=12,
                        intermediate_size=3072, dtype=jnp.bfloat16))
    model = BiEncoder(cfg)

    seq, chunk = 128, 1024 * n_chips  # 1024/chip measured best (2830 p/s vs 2456 at 512)
    n_passages = 16 * chunk
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, size=(n_passages, seq)).astype(np.int32)
    mask = np.ones_like(ids)

    params = model.init(jax.random.PRNGKey(0), ids[:2, :32], mask[:2, :32],
                        ids[:2], mask[:2])

    enc = CorpusEncoder(
        lambda p, i, m: model.apply(p, i, m, method="encode_passage"),
        mesh, chunk_size=chunk)

    # warmup / compile
    enc(params, ids[:chunk], mask[:chunk])

    t0 = time.time()
    emb = enc(params, ids, mask)
    encode_s = time.time() - t0

    # search share: MARCO dev is ~7k queries over 8.8M passages; scale the
    # query count to this corpus size so the mix matches the reference phase.
    # production mine-phase config: approx_max_k selection (measured on
    # v5e-1: 36.6k qps @ recall@100=0.992 vs 4.9k qps exact @ 0.995 at
    # 0.5M x 768 bf16, block 64k — both recall-limited by bf16 storage like
    # FAISS fp16; block size here sized to the bench corpus)
    index = MIPSIndex(mesh, block_size=8192, mode="approx",
                      recall_target=0.95)
    index.build(emb)
    n_queries = max(64, int(n_passages * 7000 / 8_800_000))
    q = emb[:n_queries] + 0.01
    index.search(q[:64], 100)  # compile
    t1 = time.time()
    index.search(q, 100)
    search_s = time.time() - t1

    total_s = encode_s + search_s
    per_chip = n_passages / total_s / n_chips
    result = {
        "metric": "mine_phase_passages_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "passages/s/chip (BERT-base bf16 seq128 encode + top-100 search)",
        "vs_baseline": round(per_chip / A100_REF_PASSAGES_PER_SEC_PER_GPU, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
