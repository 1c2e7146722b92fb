"""simxns_tpu — a TPU-native dense-retrieval engine.

A single JAX/XLA/Pallas framework with the capabilities of microsoft/SimXNS
(SimANS, PROD, MASTER, LEAD, CAPSTONE, ALLIES), re-designed TPU-first:

- ``parallel``  — device mesh, sharding specs, in-batch-negative collectives.
- ``models``    — BERT-family encoders (dual-encoder, cross-encoder, ColBERT,
                  Condenser bottlenecked-MAE) in flax.linen.
- ``ops``       — Pallas TPU kernels (flash attention, blocked MIPS top-k)
                  with XLA fallbacks.
- ``losses``    — contrastive / distillation / layer-reweighted / MLM losses.
- ``index``     — HBM-sharded exact-MIPS encode->index->search engine
                  (replaces FAISS in the reference).
- ``data``      — data contracts, SimANS ambiguity-weighted negative sampling,
                  MASTER multi-stream masking collator, CAPSTONE curriculum.
- ``train``     — step factories (DE/CE/AR2 co-training/KD/LEAD) + phase driver.
- ``evals``     — retrieval metrics (top-k hits, MRR/MAP/nDCG/P@k, MARCO, TREC).
- ``io``        — Orbax checkpoints, metric logging, config trees.
- ``allies``    — LLM beam-search retrieval orchestration.
"""

__version__ = "0.1.0"
