"""Command-line launcher: run any published recipe from one command.

The reference's public interface is shell launchers feeding 60-80 argparse
flags into per-project entry scripts (``SimANS/train_NQ_AR2.sh:15-50``,
``SimANS/wiki/co_training_wiki_train.py:370-586``,
``MASTER/finetune/ft_MS_MASTER.sh``, ``PROD/README.md``). Here every
published configuration is a named recipe over the typed config tree
(:data:`simxns_tpu.config.RECIPES`) and this module is the one entry point:

    python -m simxns_tpu.run --recipe nq_ar2_simans --synthetic
    python -m simxns_tpu.run --recipe nq_ar2_simans \
        --corpus corpus.npz --queries queries.npz \
        --passages-tsv psgs_w100.tsv --output-dir runs/nq
    python -m simxns_tpu.run --recipe marco_ar2_simans \
        --corpus corpus.npz --queries queries.npz \
        --qrels qrels.train.tsv --output-dir runs/marco
    python -m simxns_tpu.run --recipe master_pretrain --synthetic --steps 50

Real data comes from ``scripts/prepare_data.py`` (packed ``.npz`` token
arrays + a ``.qa.json`` sidecar for queries). Mining labels need one of:

- ``--passages-tsv`` (``psgs_w100.tsv``) or ``--para``/``--titles`` (MARCO
  ``para.txt``) — the original text, for ``has_answer`` string matching
  (wiki/NQ/TQ contract);
- ``--qrels`` — gold (qid, pid) relevance for id-based labeling (the MARCO
  contract; positives come from qrels, not string match).

Without ``--corpus`` the launcher generates a synthetic corpus (the
reference datasets are not redistributable), so every recipe runs out of
the box; add ``--tpu`` to run on real chips instead of the virtual CPU
mesh.

Outputs land in ``--output-dir``: ``metrics.jsonl`` (step + phase logs),
Orbax checkpoints, and a final ``eval.json`` for retrieval recipes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from simxns_tpu.config import (
    AlliesRecipeConfig, AR2RecipeConfig, CapstoneRecipeConfig,
    KDRecipeConfig, LeadRecipeConfig, MasterPretrainConfig, RECIPES)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m simxns_tpu.run",
        description="Run a SimXNS recipe (AR2/SimANS co-training, PROD "
                    "distillation, MASTER pretraining) on TPU or the "
                    "virtual CPU mesh.")
    ap.add_argument("--recipe", required=True, choices=sorted(RECIPES),
                    help="named configuration from simxns_tpu.config.RECIPES")
    ap.add_argument("--corpus", default=None,
                    help="packed corpus .npz from scripts/prepare_data.py")
    ap.add_argument("--queries", default=None,
                    help="packed queries .npz (+ .qa.json sidecar)")
    ap.add_argument("--passages-tsv", default=None,
                    help="original psgs_w100.tsv (id/text/title) for "
                         "has_answer hit labeling on a prepared corpus")
    ap.add_argument("--para", default=None,
                    help="MARCO para.txt (id\\ttext) for hit labeling")
    ap.add_argument("--titles", default=None,
                    help="MARCO para.title.txt (id\\ttitle)")
    ap.add_argument("--qrels", default=None,
                    help="qrels file (qid\\tpid or TREC 4-col): label mined "
                         "hits by gold ids instead of string match")
    ap.add_argument("--query-tsv", default=None,
                    help="doc2query TSV (psg_id\\tq1\\tq2...) for the "
                         "capstone_curriculum recipe (seq2seq output)")
    ap.add_argument("--synthetic", action="store_true",
                    help="force the synthetic corpus even if --corpus given")
    ap.add_argument("--output-dir", default=None,
                    help="metrics.jsonl + checkpoints directory")
    ap.add_argument("--tpu", action="store_true",
                    help="run on real chips (default: 8-device CPU mesh)")
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count for the CPU mesh")
    ap.add_argument("--steps", type=int, default=None,
                    help="override the recipe's max_steps")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the recipe's global batch")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the primary learning rate")
    ap.add_argument("--topk", type=int, default=None,
                    help="override mining depth k")
    ap.add_argument("--full-size", action="store_true",
                    help="use the recipe's full model shapes even on the "
                         "synthetic corpus (default: tiny models there)")
    ap.add_argument("--tiny-models", action="store_true",
                    help="force tiny model shapes even with a real corpus "
                         "(smoke-testing a data pipeline end-to-end)")
    ap.add_argument("--corpus-size", type=int, default=256,
                    help="synthetic corpus passage count")
    ap.add_argument("--num-queries", type=int, default=64,
                    help="synthetic query count")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--int8-index", action="store_true",
                    help="SQ8-analog int8 index storage (half HBM; "
                         "16.7M rows/v5e chip)")
    ap.add_argument("--index-mode", choices=["exact", "approx", "fused"],
                    default=None,
                    help="MIPS search mode for every recipe's index "
                         "(default: fused Pallas kernel on TPU, exact scan "
                         "on the CPU mesh)")
    ap.add_argument("--stall-timeout", type=float, default=None,
                    help="stall-watchdog deadline in seconds for index "
                         "build/search syncs: a sync that beats it is "
                         "free, a stalled one is re-probed and the phase "
                         "aborted-and-retried instead of wedging for "
                         "hours (round-4 relay failure mode). Default: "
                         "600 for --full-size runs, off otherwise; 0 "
                         "disables")
    ap.add_argument("--max-resident-rows", type=int, default=None,
                    help="index rows resident in HBM per search pass; a "
                         "larger corpus is searched in build->search->free "
                         "passes with a host top-k merge (the single-chip "
                         "21M-row wiki path; int8 at ~10.5M rows/pass). "
                         "Requires the streaming build; update_rows paths "
                         "(AR2 incremental re-encode) re-encode from "
                         "tokens instead")
    ap.add_argument("--fast-encode", action="store_true",
                    help="mine through the whole-layer fused int8 encode "
                         "kernel (TPU; params shared with the bf16 "
                         "training model)")
    ap.add_argument("--stream-build", choices=["auto", "on", "off"],
                    default="auto",
                    help="build the MIPS index with the device-resident "
                         "encode->quantize->scatter path (uint16 ids on "
                         "the wire, no host round-trip of embeddings); "
                         "auto = on (off is the A/B escape hatch)")
    ap.add_argument("--offload-mine",
                    choices=["auto", "on", "off", "overlap"],
                    default="auto",
                    help="reranker state during mine phases: 'on' = "
                         "synchronous host stash (dead HBM weight next "
                         "to the index; ~250 s/pull on the relay wire); "
                         "'overlap' = the stash pull rides a worker "
                         "thread under the index build (wire time hides "
                         "in the encode; only the restore stays "
                         "exposed); 'off' = fully resident (smaller "
                         "corpora only — the 8.8M int8 search does not "
                         "fit next to CE-large). auto = overlap for "
                         "full-size runs")
    ap.add_argument("--fast-teacher", action="store_true",
                    help="run frozen-teacher forwards (AR2 retriever step, "
                         "PROD KD, LEAD frozen teachers) through the "
                         "whole-layer fused int8 view of the live teacher "
                         "params")
    ap.add_argument("--freeze-teachers", action="store_true",
                    help="LEAD: freeze the CE teacher (train only the "
                         "student — the reference's frozen-model "
                         "configuration, LEAD/run_LEAD.py:65-73); combine "
                         "with --fast-teacher for the int8 teacher view")
    ap.add_argument("--warm-epochs", type=int, default=None,
                    help="override the warm-up epoch count (AR2 runners). "
                         "0 skips warm-up entirely — a timing run's "
                         "stand-in for the reference's pre-trained "
                         "checkpoint loads (co_training_wiki_train.py:"
                         "138-147); quality runs should keep the default")
    ap.add_argument("--remat", choices=["recipe", "de", "ce", "both", "none"],
                    default="recipe",
                    help="activation-checkpointing override per model: "
                         "'ce' remats only the reranker (the BERT-large "
                         "train step at 128x160 joint rows needs ~14 GB "
                         "of no-remat activations — it cannot share one "
                         "v5e chip with an 8.8M-row index), 'de'/'both'/"
                         "'none' analogous, 'recipe' keeps the config")
    ap.add_argument("--t5-tokenizer", default=None,
                    help="local HF T5 tokenizer dir for decoding doc2query "
                         "generations (capstone_curriculum with a T5 "
                         "--init-checkpoint)")
    ap.add_argument("--resume", choices=["auto", "never"], default="auto",
                    help="auto (default): scan --output-dir for the highest "
                         "saved *_state checkpoint and continue from it "
                         "(the reference's outer-loop contract, "
                         "run_progressive_distill_marco.py:167-180); "
                         "never: always start fresh")
    ap.add_argument("--init-checkpoint", default=None,
                    help="HF PyTorch checkpoint (pytorch_model.bin or a "
                         "directory holding one) to warm-start encoders "
                         "from; the architecture is sniffed from the "
                         "state_dict (BERT/RoBERTa/ELECTRA/DistilBERT)")
    return ap


def _setup_platform(args) -> None:
    """Pin the backend BEFORE first use (tests/conftest.py recipe).

    Guard added after a silent failure: a module-level jnp constant
    (ops/topk.py NEG_INF, since fixed) initialized the TPU backend during
    *import*, making the config update below a no-op — every "CPU" launcher
    run actually ran through the TPU relay. If CPU can't be forced, fail
    loudly instead of quietly grabbing the chip.
    """
    if args.tpu:
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.devices}").strip()
    import jax

    try:
        jax.config.update("jax_platform_name", "cpu")
    except RuntimeError:
        pass  # backend already initialized (e.g. under pytest's conftest)
    platform = jax.devices()[0].platform
    if platform != "cpu":
        raise SystemExit(
            f"could not force the CPU mesh (backend already initialized as "
            f"{platform!r} before _setup_platform ran — an import touched "
            "a jax array). Pass --tpu to run on real chips deliberately.")


def _stall_timeout(args):
    timeout = args.stall_timeout
    if timeout is None:
        timeout = 600.0 if args.full_size else None
    elif timeout <= 0:
        timeout = None
    return timeout


def _index_kwargs(args) -> dict:
    """Shared MIPSIndex knobs for every recipe's index — the --index-mode
    flag applies to ALL runners (it used to be silently AR2-only), and the
    stall watchdog defaults on for full-size runs (deadline 600 s; the
    round-4 wedge burned 58 min before a manual kill)."""
    timeout = _stall_timeout(args)
    return {
        "mode": args.index_mode or ("fused" if args.tpu else "exact"),
        "stall_timeout_s": timeout,
        "max_resident_rows": args.max_resident_rows,
    }


def _build_index(index, encode_fn, params, token_ids, mask, mesh, vocab_size,
                 args) -> None:
    """Build a MIPS index from token ids: device-resident streaming path
    (encode->quantize->scatter, uint16 ids on the wire) unless
    ``--stream-build off``. All call sites derive ``mask`` as
    ``token_ids != 0`` — the contract the streaming path re-derives on
    device — so the two paths are interchangeable (A/B-tested in
    tests/test_run.py)."""
    from simxns_tpu.index import CorpusEncoder

    chunk = min(1024, max(64, len(token_ids) // 4))
    if args.stream_build != "off":
        index.build_streaming(
            encode_fn, params, token_ids, chunk_size=chunk,
            wire_dtype=np.uint16 if vocab_size <= 0xFFFF else np.int32)
    else:
        enc = CorpusEncoder(encode_fn, mesh, chunk_size=chunk,
                            stall_timeout_s=_stall_timeout(args))
        index.build(enc(params, token_ids, mask))


def _bert_cfg(recipe_bert, tiny: bool, vocab: int, joint: bool = False):
    from simxns_tpu.models import BertConfig

    if tiny:
        # 256 positions: the vectorized synthetic corpus keeps the recipe's
        # real token lengths (joint rows reach 160), past tiny()'s 128
        return BertConfig.tiny(vocab_size=vocab,
                               max_position_embeddings=256)
    cfg = recipe_bert.replace(vocab_size=max(recipe_bert.vocab_size, vocab))
    if joint and cfg.small_s_attn is None:
        # joint (cross-encoder) towers run S=160 rows — 128+32, neither
        # VPU-lane- nor MXU-half-pass-aligned, where XLA's padded attention
        # loses to the grouped VMEM-resident Pallas kernel: CE-large step
        # 476 vs 597 ms same-session (1.25x, remat-neutral custom VJP;
        # bench_r5 ce_attack). Encode towers keep the measured XLA default
        # (the same kernel LOST in-model at BERT-base S=128, round 2).
        cfg = cfg.replace(small_s_attn="group")
    return cfg


class _Corpus:
    """Token arrays + QA labels, from prepared .npz files or synthesized.

    ``positive_rows`` (optional) carries per-query gold row ids (qrels
    labeling mode); ``passages`` maps corpus ROW index -> (text, title).
    """

    def __init__(self, corpus_ids, query_ids, questions, answers, passages,
                 vocab_size, sep_id, positive_rows=None, tokenizer=None):
        self.corpus_ids = corpus_ids
        self.query_ids = query_ids
        self.questions = questions
        self.answers = answers
        self.passages = passages
        self.vocab_size = vocab_size
        self.sep_id = sep_id
        self.positive_rows = positive_rows
        self.tokenizer = tokenizer       # set for synthetic corpora (text
                                         # re-tokenization: capstone/allies)

    @property
    def corpus_mask(self):
        return (self.corpus_ids != 0).astype(np.int32)

    @property
    def query_mask(self):
        return (self.query_ids != 0).astype(np.int32)


def _load_prepared(args, data_cfg) -> _Corpus:
    """Prepared token arrays + the labeling source for real mining.

    Mined hit labels are real in either of the reference's two modes:
    original text alongside the packed tokens (``has_answer`` string match,
    ``co_training_generate_new_train_wiki.py:334-358``) or qrels gold ids
    (``inference_DE_marco.py:446-560``). A token-only corpus with neither
    labels every hit False — warn loudly instead of mining garbage.
    """
    from simxns_tpu.data.datasets import (
        load_id_text, load_passages_tsv, load_qrels)

    corpus = np.load(args.corpus)
    queries = np.load(args.queries)
    corpus_ids = corpus["ids"].astype(np.int32)
    query_ids = queries["ids"].astype(np.int32)
    corpus_pids = (corpus["pids"] if "pids" in corpus
                   else np.arange(len(corpus_ids)))
    qa_path = args.queries + ".qa.json"
    if os.path.exists(qa_path):
        with open(qa_path, encoding="utf-8") as f:
            qa = json.load(f)
        questions = [r["question"] for r in qa]
        answers = [r["answers"] for r in qa]
    else:
        questions = [f"q{i}" for i in range(len(query_ids))]
        answers = [[] for _ in range(len(query_ids))]

    # --- labeling source 1: original passage text (string matching) -------
    text_by_pid = None
    if args.passages_tsv:
        text_by_pid = {pid: (text, title)
                       for pid, text, title in load_passages_tsv(
                           args.passages_tsv)}
    elif args.para:
        body = load_id_text(args.para)
        titles = load_id_text(args.titles) if args.titles else {}
        text_by_pid = {pid: (t, titles.get(pid, ""))
                       for pid, t in body.items()}
    if text_by_pid is not None:
        passages = {row: text_by_pid.get(int(pid), ("", ""))
                    for row, pid in enumerate(corpus_pids)}
    else:
        passages = {}

    # --- labeling source 2: qrels gold ids (MARCO contract) ----------------
    positive_rows = None
    if args.qrels:
        qrels = load_qrels(args.qrels)
        pid_to_row = {int(p): r for r, p in enumerate(corpus_pids)}
        qids = (queries["pids"] if "pids" in queries
                else np.arange(len(query_ids)))
        positive_rows = [
            [pid_to_row[p] for p in qrels.get(str(int(q)), [])
             if p in pid_to_row]
            for q in qids]
        n_labeled = sum(1 for r in positive_rows if r)
        print(f"qrels: {n_labeled}/{len(positive_rows)} queries have gold "
              "passages in this corpus", file=sys.stderr)

    if text_by_pid is None and positive_rows is None:
        print("WARNING: corpus is token-only and no --passages-tsv/--para "
              "or --qrels was given — mined hit labels will be ALL-FALSE "
              "(no usable training pairs). Pass the original text for "
              "has_answer matching or qrels for id labeling.",
              file=sys.stderr)

    vocab = int(max(corpus_ids.max(), query_ids.max())) + 1
    # the packer records its separator id (scripts/prepare_data.py); older
    # npz files predate the field — they were packed with sep=2 tokenizers
    sep_id = int(corpus["sep_id"]) if "sep_id" in corpus else 2
    return _Corpus(corpus_ids, query_ids, questions, answers, passages,
                   vocab_size=max(vocab, 512), sep_id=sep_id,
                   positive_rows=positive_rows)


def _int8_view_cfg(bert_cfg):
    """Fused-int8 encode view of a training config, or None if the config
    is incompatible (the fused kernels hardcode exact erf GELU —
    BertConfig refuses gelu='tanh' with fused impls)."""
    if bert_cfg.gelu != "exact":
        print("WARNING: --fast-encode/--fast-teacher need gelu='exact' "
              "(the fused kernels compute erf in-kernel); staying on the "
              "bf16 composition.", file=sys.stderr)
        return None
    return bert_cfg.replace(layer_impl="fused_int8", ffn_impl="xla",
                            proj_impl="xla")


def _load_init_checkpoint(args):
    """--init-checkpoint: load + convert a HF PyTorch checkpoint once.

    The reference's published configs all warm-start from HF artifacts
    (ERNIE-2.0/BERT for PROD and SimANS wiki, RoBERTa for MS-Doc, ELECTRA
    for the MASTER CE, DistilBERT for the LEAD student — SURVEY.md
    §2.3-2.6); the family is sniffed from the state_dict so one flag
    covers them all.
    """
    if not args.init_checkpoint:
        return None
    import torch

    from simxns_tpu.models import convert_hf_auto

    path = args.init_checkpoint
    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_model.bin")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    from simxns_tpu.models import sniff_hf_family

    if sniff_hf_family(sd) == "t5":
        # not an encoder warm start: the docT5query GENERATOR
        # (CAPSTONE/models/generate_query.py) — only run_capstone
        # consumes it, to produce the expansion query TSV
        print("init-checkpoint: t5 (doc2query generator)", file=sys.stderr)
        return {"family": "t5", "encoder": None, "mlm": None, "sd": sd}
    family, enc, mlm = convert_hf_auto(sd)
    n = sum(1 for k in enc if k.startswith("layer_"))
    print(f"init-checkpoint: {family} encoder, {n} layers",
          file=sys.stderr)
    return {"family": family, "encoder": enc, "mlm": mlm, "sd": sd}


def _init_bert_cfg(init, base_cfg, data_vocab: int):
    """Reshape a recipe BertConfig around the warm-start artifact.

    Keeps the recipe's depth when it is SHALLOWER than the checkpoint
    (the PROD truncated-student init, ``ProD_KD/model/models.py:52-60``);
    every other shape comes from the checkpoint.
    """
    from simxns_tpu.models.hf_import import config_from_hf_params

    if init["family"] == "t5":
        raise SystemExit(
            "--init-checkpoint is a T5 (doc2query generator) artifact — "
            "it cannot warm-start a BERT-family encoder. Only "
            "capstone_curriculum consumes T5 checkpoints (to generate "
            "the expansion query TSV).")
    new = config_from_hf_params(init["encoder"], init["family"],
                                base=base_cfg)
    if base_cfg.num_layers < new.num_layers:
        new = new.replace(num_layers=base_cfg.num_layers)
    if new.hidden_size % new.num_heads:
        raise SystemExit(
            f"--init-checkpoint hidden_size {new.hidden_size} is not "
            f"divisible by the recipe's num_heads {new.num_heads}")
    if data_vocab > new.vocab_size:
        raise SystemExit(
            f"--init-checkpoint vocab ({new.vocab_size}) is smaller than "
            f"the corpus vocab ({data_vocab}) — the data was packed with a "
            "different tokenizer than the checkpoint's")
    return new


def _graft_encoder(params: dict, init, paths, num_layers: int) -> dict:
    """Replace encoder subtrees in an initialized param tree in place."""
    import copy

    import jax

    from simxns_tpu.models.bert import truncate_layers

    enc = truncate_layers(init["encoder"], num_layers)
    enc = jax.tree_util.tree_map(np.asarray, enc)
    p = params["params"] if "params" in params else params
    for path in paths:
        node = p
        for key in path[:-1]:
            node = node[key]
        node[path[-1]] = copy.deepcopy(enc)
    return params


def _gold_warm(data, k: int):
    """Synthetic "gold" mining result for model warm-up (the reference
    warms from separately-trained checkpoints, e.g.
    ``co_training_wiki_train.py:138-147``; here both models warm on
    labeled pairs before co-training/distillation).

    With real labels (``data.positive_rows`` from ``--qrels``) each query
    leads with its actual gold row; without them the synthetic corpora's
    diagonal contract (query i <-> passage i) applies. Indices wrap
    modulo the corpus size, so a query set larger than the corpus cannot
    index out of range. Queries with no gold get all-False hits and are
    dropped by ``MinedDataset`` (no usable positive).
    """
    n_c = len(data.corpus_ids)
    nq = len(data.query_ids)
    pos = getattr(data, "positive_rows", None)
    leads, labeled = [], []
    for i in range(nq):
        if pos is not None:
            leads.append(int(pos[i][0]) if pos[i] else 0)
            labeled.append(bool(pos[i]))
        else:
            leads.append(i % n_c)
            labeled.append(True)
    return type("R", (), {
        "topk_ids": np.stack(
            [np.r_[p, (np.arange(1, k) + p) % n_c] for p in leads]),
        "topk_scores": np.tile(np.linspace(5, 1, k, dtype=np.float32),
                               (nq, 1)),
        "hits": [[j == 0 and lab for j in range(k)] for lab in labeled]})()


class _FactPassages:
    """Lazy row -> (text, title) mapping for the vectorized synthetic corpus.

    At reference scale (8.8M rows) an eager dict of formatted strings costs
    gigabytes and a minute of one-core time; mining only ever reads the
    top-k rows per query (``index/engine.py`` uses ``passages.get``), so
    the text is fabricated on access instead.
    """

    def __init__(self, n: int):
        self.n = n

    def _make(self, i: int):
        return (f"document {i} mentions fact{i} and topic{i % 7}",
                f"title{i}")

    def __getitem__(self, i):
        if not 0 <= i < self.n:
            raise KeyError(i)
        return self._make(int(i))

    def get(self, i, default=("", "")):
        return self._make(int(i)) if 0 <= i < self.n else default

    def __len__(self):
        return self.n

    def __contains__(self, i):
        return 0 <= i < self.n


def _synthesize_vectorized(args, data_cfg) -> _Corpus:
    """Signature-scheme synthetic corpus at FULL recipe token shapes.

    The per-passage ``HashTokenizer.encode`` loop in :func:`_synthesize`
    is fine at demo sizes but takes hours at 8.8M rows on this one-core
    host, and caps contexts at 32 tokens. This path generates the token
    arrays vectorized at the recipe's real lengths (``max_ctx_length`` /
    ``max_q_length``): passage i carries a unique 4-digit base-64 token
    signature its query repeats over a common low-entropy background
    (the scheme validated by scripts/soak_ar2.py — a shared background
    keeps the signature the dominant CLS variance direction), and the
    lazy text view carries ``fact{i}`` so mined hits label through the
    same ``has_answer`` string match as a real corpus.
    """
    n, q = args.corpus_size, min(args.num_queries, args.corpus_size)
    lc = data_cfg.max_ctx_length
    lq = data_cfg.max_q_length
    CLS, SEP, BASE = 1, 3, 5
    JUNK_LO, JUNK_HI = BASE + 4 * 64, BASE + 4 * 64 + 16
    rng = np.random.default_rng(args.seed)

    def signature(idx):
        digits = [(idx // 64 ** d) % 64 for d in range(4)]
        return np.stack([BASE + d * 64 + dig
                         for d, dig in enumerate(digits)], axis=-1)

    corpus_ids = rng.integers(JUNK_LO, JUNK_HI, size=(n, lc)).astype(np.int32)
    corpus_ids[:, 0] = CLS
    corpus_ids[:, 1:5] = signature(np.arange(n))
    corpus_ids[:, lc - 1] = SEP
    q_rows = rng.permutation(n)[:q]
    query_ids = rng.integers(JUNK_LO, JUNK_HI, size=(q, lq)).astype(np.int32)
    query_ids[:, 0] = CLS
    query_ids[:, 1:5] = signature(q_rows)
    # queries share a slice of their passage's background (soak_ar2 scheme)
    take = min(lq - 6, lc - 5)
    if take > 0:
        query_ids[:, 5:5 + take] = corpus_ids[q_rows, 5:5 + take]
    query_ids[:, lq - 1] = SEP
    questions = [f"document {p} fact{p}" for p in q_rows]
    answers = [[f"fact{p}"] for p in q_rows]
    # golds are permuted across the corpus (unlike the demo path's
    # diagonal), so carry them explicitly for _gold_warm / gold-score-update
    return _Corpus(corpus_ids, query_ids, questions, answers,
                   _FactPassages(n), vocab_size=512, sep_id=SEP,
                   positive_rows=[[int(p)] for p in q_rows])


def _synthesize(args, data_cfg) -> _Corpus:
    """Topic-structured synthetic corpus: query i's answer is `facti`."""
    from simxns_tpu.data import HashTokenizer

    if args.corpus_size > 20_000:
        return _synthesize_vectorized(args, data_cfg)
    tok = HashTokenizer(vocab_size=2048)
    n, q = args.corpus_size, min(args.num_queries, args.corpus_size)
    lc = min(data_cfg.max_ctx_length, 32)
    lq = min(data_cfg.max_q_length, 16)
    passages = {i: (f"document {i} mentions fact{i} and topic{i % 7}",
                    f"title{i}") for i in range(n)}
    corpus_ids = np.zeros((n, lc), np.int32)
    for i in range(n):
        enc = tok.encode(passages[i][1], text_pair=passages[i][0],
                         max_length=lc)
        corpus_ids[i, : len(enc)] = enc
    questions = [f"document {i} fact{i}" for i in range(q)]
    answers = [[f"fact{i}"] for i in range(q)]
    query_ids = np.zeros((q, lq), np.int32)
    for i, text in enumerate(questions):
        enc = tok.encode(text, max_length=lq)
        query_ids[i, : len(enc)] = enc
    return _Corpus(corpus_ids, query_ids, questions, answers, passages,
                   vocab_size=2048, sep_id=tok.sep_token_id, tokenizer=tok)


def _get_corpus(args, data_cfg) -> _Corpus:
    if args.corpus and args.queries and not args.synthetic:
        return _load_prepared(args, data_cfg)
    if args.corpus or args.queries:
        print("note: --corpus/--queries incomplete; using synthetic corpus",
              file=sys.stderr)
    return _synthesize(args, data_cfg)


def _resume_step(args, name: str):
    """Highest saved ``<name>-<step>`` in --output-dir, or None.

    The reference's launchers resume by scanning the output directory for
    the newest step-indexed checkpoint (PROD:
    ``run_progressive_distill_marco.py:167-180``; SimANS passes the step
    through the bash loop, ``train_NQ_AR2.sh:15-50`` +
    ``co_training_wiki_train.py:138-147``). ``--resume never`` disables.
    """
    if not args.output_dir or args.resume == "never":
        return None
    from simxns_tpu.io import latest_step

    # resume only a run of the SAME recipe: output dirs are reused across
    # recipes (and restoring another recipe's states is silent corruption)
    meta_path = os.path.join(args.output_dir, "run_meta.json")
    prev = None
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            prev = json.load(f).get("recipe")
    step = latest_step(args.output_dir, name=name)
    if step is not None and prev != args.recipe:
        print(f"note: {args.output_dir} holds checkpoints from recipe "
              f"{prev!r}, not {args.recipe!r} — starting fresh",
              file=sys.stderr)
        step = None
    with open(meta_path, "w", encoding="utf-8") as f:
        json.dump({"recipe": args.recipe}, f)
    return step


def _restore_state(args, target, step: int, name: str, mesh):
    """Restore a TrainState and replicate it over the mesh.

    Orbax restores to the target's placement (a fresh ``TrainState.create``
    commits to ONE device); train/encode jits expect params replicated
    across the mesh like the warm states they were traced with — mixing a
    1-device state with 8-device-sharded batch args is a placement error.
    """
    import jax

    from simxns_tpu.io import restore_checkpoint
    from simxns_tpu.parallel.mesh import replicated_sharding

    state = restore_checkpoint(args.output_dir, target, step, name=name)
    if mesh.size > 1:
        state = jax.device_put(state, replicated_sharding(mesh))
    return state


def _make_optim(optim_cfg, lr_override=None, steps=None):
    from simxns_tpu.train import make_adamw, make_lamb

    lr = lr_override if lr_override is not None else optim_cfg.learning_rate
    total = steps if steps is not None else optim_cfg.total_steps
    factory = make_lamb if optim_cfg.optimizer == "lamb" else make_adamw
    return factory(lr, warmup_steps=min(optim_cfg.warmup_steps, total // 4),
                   total_steps=total,
                   weight_decay=optim_cfg.weight_decay,
                   max_grad_norm=optim_cfg.max_grad_norm)


def run_ar2(name: str, cfg: AR2RecipeConfig, args) -> dict:
    """AR2/SimANS co-training: warmup -> mine -> alternating co-training.

    Phase structure from ``SimANS/train_NQ_AR2.sh:15-50`` /
    ``co_training_wiki_train.py:606-693``; master_ms_ft reuses the same
    loop with BM25-warmup hyperparameters (``ft_MS_MASTER.sh:10-22``).
    """
    import jax

    from simxns_tpu.data import from_mining_result
    from simxns_tpu.index import CorpusEncoder, MIPSIndex, RetrievalEngine
    from simxns_tpu.io import MetricLogger, save_checkpoint
    from simxns_tpu.models import (
        BiEncoder, BiEncoderConfig, CrossEncoder, CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import (
        AR2Config, AR2CoTrainer, TrainState, make_ar2_retriever_step,
        make_biencoder_step, make_reranker_step)

    t_start = time.time()
    data = _get_corpus(args, cfg.data)
    tiny = args.tiny_models or (
        not args.full_size and not (args.corpus and not args.synthetic))
    mesh = create_mesh()
    logger = MetricLogger(args.output_dir)
    steps = args.steps if args.steps is not None else (
        60 if tiny else cfg.max_steps)
    batch_size = args.batch if args.batch is not None else cfg.global_batch
    batch_size = min(batch_size, len(data.query_ids))
    topk = args.topk if args.topk is not None else cfg.topk
    topk = min(topk, len(data.corpus_ids))
    # tiny models can't rank 15 hard negatives from scratch; the measured
    # working point of the synthetic demo (examples/ar2_synthetic.py) is 3
    negs = min(cfg.data.num_negatives, topk - 1, 3 if tiny else 10**9)

    de_cfg = _bert_cfg(cfg.retriever.bert, tiny, data.vocab_size)
    ce_cfg = _bert_cfg(cfg.reranker.bert, tiny, data.vocab_size,
                       joint=True)
    if args.remat != "recipe":
        de_cfg = de_cfg.replace(remat=args.remat in ("de", "both"))
        ce_cfg = ce_cfg.replace(remat=args.remat in ("ce", "both"))
    # --init-checkpoint warms the RETRIEVER towers (the reference's DE warm
    # starts: ERNIE/BERT for wiki/MARCO, RoBERTa for MS-Doc); the reranker
    # keeps the recipe config (its warm start is a separately-trained CE)
    init = _load_init_checkpoint(args)
    if init is not None:
        de_cfg = _init_bert_cfg(init, de_cfg, data.vocab_size)
    # the RobertaDot-style projection head is for full-size runs only: on
    # the tiny from-scratch synthetic demo an extra random layer stalls the
    # short warm-up (measured: warmup top1 0.71 bare vs 0.08 with the head,
    # LN or not) — the reference never trains RobertaDot from scratch either
    # (it warms from the adore-star checkpoint, train_MS_Doc_AR2.sh:12)
    proj = None if tiny else cfg.retriever.projection_dim
    de = BiEncoder(BiEncoderConfig(
        bert=de_cfg, share_weight=cfg.retriever.share_weight,
        pooling=cfg.retriever.pooling,
        projection_dim=proj))
    ce = CrossEncoder(CrossEncoderConfig(
        bert=ce_cfg, binary_head=cfg.reranker.binary_head))

    max_joint = min(cfg.data.max_joint_length,
                    data.query_ids.shape[1] + data.corpus_ids.shape[1] + 1)
    lj = max_joint
    de_params = de.init(jax.random.PRNGKey(args.seed),
                        data.query_ids[:2], data.query_mask[:2],
                        data.corpus_ids[:2], data.corpus_mask[:2])
    ce_params = ce.init(jax.random.PRNGKey(args.seed + 1),
                        np.ones((2, lj), np.int32),
                        np.ones((2, lj), np.int32))
    if init is not None:
        towers = ([("question_model", "encoder")]
                  if cfg.retriever.share_weight else
                  [("question_model", "encoder"), ("ctx_model", "encoder")])
        de_params = _graft_encoder(de_params, init, towers,
                                   de_cfg.num_layers)
    # the recipe learning rates assume warm full-size checkpoints; the
    # tiny synthetic fallback trains from scratch and needs warmup-scale lrs
    de_lr = args.lr if args.lr is not None else (3e-3 if tiny else None)
    ce_lr = (args.lr if args.lr is not None else 1e-3) if tiny else None
    # co-training lrs sit well below warm-up lrs (reference: 1e-5/1e-6 on
    # warm checkpoints vs 1e-5..2e-5 warm-up at full scale; 10x down and
    # constant for the from-scratch tiny demo)
    from simxns_tpu.train import make_adamw

    if tiny:
        tx_de = make_adamw(de_lr * 0.1, total_steps=0)
        tx_ce = make_adamw(ce_lr * 0.1, total_steps=0)
    else:
        tx_de = _make_optim(cfg.retriever_optim, de_lr, steps)
        tx_ce = _make_optim(cfg.reranker_optim, ce_lr, steps)
    # warm-up runs on its own constant-lr optimizers (the reference's
    # warm-up is a separate job with its own schedule; sharing the
    # co-training schedule would decay it to zero before co-training starts)
    tx_warm_de = make_adamw(de_lr or cfg.retriever_optim.learning_rate,
                            total_steps=0)
    tx_warm_ce = make_adamw(ce_lr or cfg.reranker_optim.learning_rate,
                            total_steps=0)
    # resume scan BEFORE warmup: a relaunch with saved window-boundary
    # checkpoints skips warmup entirely and continues the co-training loop
    # at the saved global step (co_training_wiki_train.py:138-147,357-367)
    resume_step = _resume_step(args, "retriever_state")
    de_state = TrainState.create(de_params, tx_warm_de)
    ce_state = TrainState.create(ce_params, tx_warm_ce)

    import jax.numpy as jnp

    store = (jnp.int8 if args.int8_index
             else jnp.bfloat16 if args.tpu else jnp.float32)
    index = MIPSIndex(
        mesh, block_size=min(8192, max(32, len(data.corpus_ids) // 4)),
        store_dtype=store, **_index_kwargs(args))
    engine = RetrievalEngine(index, data.passages, logger=logger)
    # --fast-encode: mine through a fused-int8-layer view of the SAME
    # params (the param trees interchange across layer_impl); training
    # stays on the bf16 composition.
    enc_model = de
    if args.fast_encode:
        view = _int8_view_cfg(de_cfg)
        if view is not None:
            enc_model = BiEncoder(BiEncoderConfig(
                bert=view,
                share_weight=cfg.retriever.share_weight,
                pooling=cfg.retriever.pooling,
                projection_dim=proj))
    corpus_chunk = min(1024, max(64, len(data.corpus_ids) // 4))
    p_enc_fn = lambda p, i, m: enc_model.apply(p, i, m,
                                               method="encode_passage")
    p_enc = CorpusEncoder(p_enc_fn, mesh, chunk_size=corpus_chunk,
                          stall_timeout_s=_stall_timeout(args))
    q_enc = CorpusEncoder(
        lambda p, i, m: enc_model.apply(p, i, m, method="encode_query"),
        mesh, chunk_size=min(1024, max(64, len(data.query_ids))),
        stall_timeout_s=_stall_timeout(args))
    stream_build = args.stream_build != "off"
    # token ids travel the wire every refresh — uint16 when the vocab fits
    wire_dtype = np.uint16 if data.vocab_size <= 0xFFFF else np.int32
    # the mine phase holds the index + DE params; the reranker state is
    # dead weight there (~4 GB at recipe scale on a 16 GB chip).
    # Modes (measured at the 8.8M int8 working point, round 5):
    # - "on":      synchronous stash before the mine (~250 s/pull on the
    #              relay wire) — always memory-safe;
    # - "off":     fully resident — the BUILD fits next to DE+CE (13.5 of
    #              15.75 GB) but the SEARCH does not (RESOURCE_EXHAUSTED
    #              at the brink, iter_r5b run) — only for smaller corpora;
    # - "overlap": the stash pull rides on a worker thread UNDER the
    #              index build (CE resident through the build, gone
    #              before the search) — the wire time hides inside the
    #              minutes-long encode, leaving only the restore exposed.
    offload_mode = (args.offload_mine if args.offload_mine != "auto"
                    else ("overlap" if args.full_size else "off"))
    offload_mine = offload_mode == "on"     # driver-managed sync stash

    import queue as _queue
    import threading

    from simxns_tpu.parallel.watchdog import retry_on_stall

    def mine(state, pre_search=None):
        # phase-level abort-and-retry: when the index's stall watchdog
        # gives up on a wedged sync (StallError), the whole build/search
        # is re-run from scratch — build_streaming re-allocates its buffer
        # and search is a pure read, so both are safe to repeat. A stall
        # that survives both attempts raises, bounding the round-4
        # failure mode (58 min silent wedge) to ~2x the phase deadline.
        def build():
            with logger.timed("encode_corpus"):
                if stream_build:
                    index.build_streaming(
                        p_enc_fn, state.params, data.corpus_ids,
                        chunk_size=corpus_chunk, wire_dtype=wire_dtype)
                else:
                    index.build(p_enc(state.params, data.corpus_ids,
                                      data.corpus_mask))

        retry_on_stall(build, attempts=2, desc="index build",
                       cleanup=index.free)
        if pre_search is not None:
            pre_search()   # overlap mode: CE must leave HBM before search

        def encode_queries():
            with logger.timed("encode_queries"):
                return q_enc(state.params, data.query_ids, data.query_mask)

        q_emb = retry_on_stall(encode_queries, attempts=2,
                               desc="query encode")
        # engine.mine times its own "search" / "hit_labeling" phases
        return retry_on_stall(
            lambda: engine.mine(q_emb, data.questions, data.answers, k=topk,
                                positive_ids=data.positive_rows),
            attempts=2, desc="mine search")

    from simxns_tpu.parallel.offload import HostStash
    from simxns_tpu.parallel.sync import force_sync

    # checkpoint <-> refresh rendezvous for overlap mode: the boundary's
    # checkpoint writer consumes the stash's host copy the refresh pulled
    # (numpy trees — valid regardless of when restore() runs)
    stash_for_ckpt: _queue.Queue = _queue.Queue()

    def start_stash_overlap(ce_s):
        """Pull ``ce_s`` to host (freeing its HBM) on a worker thread.
        Returns join() -> HostStash; join blocks until the pull landed."""
        box = {"stash": None, "err": None}
        done = threading.Event()

        def pull():
            try:
                box["stash"] = HostStash(ce_s)
            except BaseException as e:  # re-raised at join()
                box["err"] = e
            finally:
                done.set()

        threading.Thread(target=pull, name="stash-overlap",
                         daemon=True).start()

        def join():
            with logger.timed("offload_stash_join"):
                done.wait()
            if box["err"] is not None:
                raise box["err"]
            return box["stash"]

        return join

    def mine_offloaded(state, ce_s):
        """mine() with the reranker state stashed to host for the duration
        (the in-window refreshes get the same treatment from
        ``AR2CoTrainer(offload_refresh=...)`` or the overlap-aware
        ``refresh`` below)."""
        if offload_mode == "off":
            return mine(state), ce_s
        if offload_mode == "overlap":
            join = start_stash_overlap(ce_s)
            holder = {}

            def pre_search():
                holder["stash"] = join()

            r = mine(state, pre_search=pre_search)
            index.free()
            with logger.timed("offload_restore"):
                return r, holder["stash"].restore()
        with logger.timed("offload_stash"):
            stash = HostStash(ce_s)
        r = mine(state)
        # free the just-built index BEFORE pulling the reranker back: the
        # mining result is host-side already, and restoring first would
        # put peak HBM at index + DE + CE (~6 GB avoidable — would OOM at
        # the 16.7M-row int8 capacity). The in-window boundary path
        # already orders it this way (refresh_fn frees via dataset_from
        # before the driver restores); this aligns the warmup/resume/
        # final-eval sites. dataset_from's own free() is then a no-op.
        index.free()
        with logger.timed("offload_restore"):
            restored = stash.restore()
        return r, restored

    def dataset_from(res, seed):
        with logger.timed("dataset_build"):
            ds = from_mining_result(
                data.corpus_ids, data.query_ids, res, num_negatives=negs,
                max_joint_length=lj, sep_id=data.sep_id, seed=seed,
                simans_mode=cfg.data.simans_mode, simans_a=cfg.data.simans_a,
                simans_b=cfg.data.simans_b, simans_tau=cfg.data.simans_tau)
        # between refreshes the (rebuilt-every-mine) index is dead HBM
        # weight next to the train window — see MIPSIndex.free
        index.free()
        return ds

    # -- warmup: both models must start trained (the reference loads
    #    finetuned DE + reranker checkpoints before co-training) -----------
    gold = _gold_warm(data, topk)
    warm_ds = dataset_from(gold, args.seed)
    from simxns_tpu.train.driver import RecallGuard, check_teacher_warmth

    guard = RecallGuard()
    if resume_step is None:
        warm_de = make_biencoder_step(de, tx_warm_de, mesh, grad_mode="full")
        warm_ce = make_reranker_step(ce, tx_warm_ce, mesh,
                                     group_size=1 + negs)
        warm_epochs = (args.warm_epochs if args.warm_epochs is not None
                       else 40 if tiny else max(1, min(25, steps // 4)))
        with logger.timed("warmup"):
            for _ in range(warm_epochs):
                for b in warm_ds.batches(batch_size=batch_size,
                                         with_joint=False):
                    de_state, wm = warm_de(de_state, shard_batch(b, mesh))
            # the reranker must be a competent teacher before co-training
            # (the reference loads checkpoint-reranker26000); warm it harder
            ce_warm_steps = 0
            # the +20 tiny bonus must not resurrect warm-up when the user
            # asked for none (--warm-epochs 0 skips BOTH models)
            for _ in range(warm_epochs + 20 if (tiny and warm_epochs)
                           else warm_epochs):
                for b in warm_ds.batches(batch_size=batch_size):
                    dev = shard_batch({"joint_ids": b["joint_ids"],
                                       "joint_mask": b["joint_mask"]}, mesh)
                    ce_state, cm = warm_ce(ce_state, dev)
                    ce_warm_steps += 1
            # relay dispatch is async: prove the warm steps EXECUTED so
            # this timer (and not the first mine's) carries their cost
            force_sync(de_state, ce_state)
        if warm_epochs:
            check_teacher_warmth(ce_warm_steps)
        res, ce_state = mine_offloaded(de_state, ce_state)
        guard.update(res.top_k_hits[0])
        logger.log(0, {"top1": res.top_k_hits[0],
                       "mrr10": res.metrics.get("MRR_n@_10", 0.0)},
                   phase="warmup_eval")
        print(f"[{name}] warmup: top1={res.top_k_hits[0]:.3f}")

        # -- co-training (fresh opt states on the recipe schedule) ---------
        de_state = TrainState.create(de_state.params, tx_de)
        ce_state = TrainState.create(ce_state.params, tx_ce)
        first_seed = 0
    else:
        # relaunch: restore full TrainStates (params + opt state + step)
        # from the last window boundary and skip warmup — the co-training
        # loop continues exactly where the dead run's window ended
        de_state = _restore_state(args, TrainState.create(de_params, tx_de),
                                  resume_step, "retriever_state", mesh)
        ce_state = _restore_state(args, TrainState.create(ce_params, tx_ce),
                                  resume_step, "reranker_state", mesh)
        res, ce_state = mine_offloaded(de_state, ce_state)
        guard.update(res.top_k_hits[0])
        logger.log(resume_step, {"top1": res.top_k_hits[0]},
                   phase="resume_eval")
        print(f"[{name}] resumed at step {resume_step}: "
              f"top1={res.top_k_hits[0]:.3f}")
        first_seed = resume_step
    # --fast-teacher: the retriever step's frozen reranker forward (~59%
    # of step FLOPs at the recipe shape) runs through the whole-layer
    # fused int8 VIEW of the live reranker params; the reranker's own
    # training step stays on the differentiable bf16 composition.
    ce_teacher = ce
    if args.fast_teacher:
        view = _int8_view_cfg(ce_cfg)
        if view is not None:
            ce_teacher = CrossEncoder(CrossEncoderConfig(
                bert=view, binary_head=cfg.reranker.binary_head))
    r_step = make_ar2_retriever_step(
        de, ce_teacher, tx_de, mesh, adv_lambda=cfg.adv_lambda,
        temperature=cfg.temperature_normal,
        # --scale_simmila: softmax(scores / sqrt(H))
        # (co_training_wiki_train.py:203-205)
        scale_scores=(1.0 / float(de_cfg.hidden_size) ** 0.5
                      if cfg.scale_simmila else None))
    c_step = make_reranker_step(ce, tx_ce, mesh, group_size=1 + negs)
    history = [res.top_k_hits[0]]

    def refresh(state, gstep):
        pre_search = None
        holder = {}
        if offload_mode == "overlap":
            # boundary stash rides under the index build; its host copy
            # feeds the checkpoint writer (stash_for_ckpt), so the CE
            # state crosses the wire exactly ONCE per boundary and none
            # of it is exposed wall-clock except the restore
            join = start_stash_overlap(trainer.ce_state)

            def pre_search():
                stash = join()
                if args.output_dir:
                    stash_for_ckpt.put(stash.numpy_tree())
                holder["stash"] = stash

        r = mine(state, pre_search=pre_search)
        history.append(r.top_k_hits[0])
        guard.update(r.top_k_hits[0])      # warns/errors on collapse
        logger.log(gstep, {"top1": r.top_k_hits[0]}, phase="refresh")
        ds = dataset_from(r, gstep)
        if "stash" in holder:
            with logger.timed("offload_restore"):
                trainer.ce_state = holder["stash"].restore()
        # resident/overlap checkpoints pull states on the writer thread,
        # overlapped with the mine above; the barrier (defined below,
        # resolved at call time) must land before training resumes
        join_pulls()
        if len(ds) < batch_size:
            return None
        return lambda: ds.batches(batch_size=batch_size)

    iteration = min(cfg.iteration_step, max(4, steps // 2) if tiny
                    else cfg.iteration_step)
    # first window: reuse the warmup/resume-eval mining result (the params
    # have not changed since `res = mine(de_state)` above — a second
    # full-corpus mine here would be pure duplicate work). The dataset
    # seed is the global step the window starts at, matching what
    # `refresh` would have built at that boundary in an unbroken run.
    first_ds = dataset_from(res, first_seed)
    first_batches = (
        (lambda: first_ds.batches(batch_size=batch_size))
        if len(first_ds) >= batch_size
        else (lambda: warm_ds.batches(batch_size=batch_size)))

    pending_saves: list = []
    save_errors: list = []

    def join_saves():
        # a silently failed background Orbax write would report a
        # successful run whose --resume auto falls back to an older step —
        # surface the first writer exception loudly instead
        while pending_saves:
            pending_saves.pop().join()
        if save_errors:
            err = save_errors[0]
            print(f"[{name}] FATAL: background checkpoint write failed: "
                  f"{err!r}", file=sys.stderr, flush=True)
            raise RuntimeError(
                "background checkpoint write failed") from err

    pending_pulls: list = []

    def join_pulls():
        # overlapped checkpoint pulls MUST land before training resumes:
        # the next window's steps DONATE their state arg, invalidating the
        # very buffers a still-running device_get would read
        with logger.timed("checkpoint_pull_join"):
            while pending_pulls:
                pending_pulls.pop().wait()

    def checkpoint(de_s, ce_s, gstep):
        # full-state window-boundary checkpoints: what the resume scan
        # restores (the reference writes checkpoint-<step> /
        # checkpoint-reranker<step> at each break-out,
        # co_training_wiki_train.py:300-306,319-354).
        #
        # Wall cost by mode:
        # - offload on: ONE device->host pull of the retriever state — the
        #   driver hands the reranker state over as the HostStash the mine
        #   needed anyway;
        # - offload off (index + states fit HBM, e.g. int8 at the 8.8M
        #   working point): ZERO synchronous pulls — both states are
        #   stable reads during the mine, so the writer thread pulls them
        #   overlapped with it; `join_pulls` (called by `refresh` after
        #   the mine) gates training resume on the pulls having landed.
        # Either way the Orbax writes run on a background thread under the
        # minutes-long mine (Orbax's tmp-dir + rename keeps a crash
        # mid-write from ever surfacing as a resumable artifact).
        if not args.output_dir:
            return
        with logger.timed("checkpoint"):
            join_saves()   # one write in flight at a time
            stashed = isinstance(ce_s, HostStash)
            de_host = jax.device_get(de_s) if stashed else None
            ce_host = ce_s.numpy_tree() if stashed else None
            pulled = threading.Event()
            if stashed:
                pulled.set()
            else:
                pending_pulls.append(pulled)

            def write():
                try:
                    d = de_host if stashed else jax.device_get(de_s)
                    if stashed:
                        c = ce_host
                        pulled.set()
                    elif offload_mode == "overlap":
                        # DE landed; CE arrives as the refresh's stash host
                        # copy — never a device pull from this thread (the
                        # stash thread deletes those buffers mid-mine)
                        pulled.set()
                        c = stash_for_ckpt.get(timeout=7200)
                    else:              # fully resident: both pulls gate
                        c = jax.device_get(ce_s)
                        pulled.set()
                    save_checkpoint(args.output_dir, d, gstep,
                                    name="retriever_state")
                    save_checkpoint(args.output_dir, c, gstep,
                                    name="reranker_state")
                except BaseException as e:  # surfaced by join_saves()
                    save_errors.append(e)
                finally:
                    pulled.set()   # never leave join_pulls waiting

            t = threading.Thread(target=write, name=f"ckpt-{gstep}")
            t.start()
            pending_saves.append(t)

    trainer = AR2CoTrainer(
        mesh,
        AR2Config(iteration_step=iteration,
                  iteration_reranker_step=min(cfg.iteration_reranker_step,
                                              max(2, (2 * iteration) // 5)),
                  max_steps=steps, batch_size=batch_size,
                  log_every=max(1, steps // 10)),
        de_state, ce_state, r_step, c_step,
        batches=first_batches,
        refresh_fn=refresh, checkpoint_fn=checkpoint, metric_logger=logger,
        offload_refresh=offload_mine)
    if resume_step is not None:
        trainer.global_step = resume_step
    trainer.run()

    final, trainer.ce_state = mine_offloaded(trainer.de_state,
                                             trainer.ce_state)
    # per-phase wall-clock split (the continuous-iteration evidence the
    # composed bench_r3 envelope cannot capture: host collation, dataset
    # refresh, jit transitions, labeling all land in these buckets)
    total_s = time.time() - t_start
    phases = {k: round(v, 1) for k, v in logger.phase_times.items()}
    phases["train_steps_and_overhead"] = round(
        max(0.0, total_s - sum(logger.phase_times.values())), 1)
    print(f"[{name}] phase split ({total_s:.1f}s total):")
    for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"    {k:24s} {v:9.1f}s  {100 * v / total_s:5.1f}%")
    out = {"recipe": name, "steps": steps,
           "top1": final.top_k_hits[0],
           "top5": final.top_k_hits[min(4, topk - 1)],
           "mrr10": final.metrics.get("MRR_n@_10", 0.0),
           "history_top1": history,
           "total_s": round(total_s, 1),
           "phase_times_s": phases}
    if args.output_dir:
        save_checkpoint(args.output_dir,
                        {"params": trainer.de_state.params}, steps,
                        name="retriever")
        save_checkpoint(args.output_dir,
                        {"params": trainer.ce_state.params}, steps,
                        name="reranker")
        with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
            json.dump(out, f, indent=1)
    # the last boundary's async write must land before exit — joined AFTER
    # eval.json so a boundary-write failure (which raises here) cannot
    # also lose the final artifacts
    join_saves()
    print(f"[{name}] final: top1={out['top1']:.3f} mrr10={out['mrr10']:.3f}")
    return out


def run_kd(name: str, cfg: KDRecipeConfig, args) -> dict:
    """PROD progressive distillation stage (``PROD/README.md`` pipeline):
    student dual-encoder distilled from a (warmed) cross-encoder teacher."""
    import jax

    from simxns_tpu.data import from_mining_result
    from simxns_tpu.io import MetricLogger, save_checkpoint
    from simxns_tpu.models import (
        BiEncoder, BiEncoderConfig, CrossEncoder, CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import (
        TrainState, make_kd_step, make_reranker_step)

    data = _get_corpus(args, cfg.data)
    tiny = args.tiny_models or (
        not args.full_size and not (args.corpus and not args.synthetic))
    mesh = create_mesh()
    logger = MetricLogger(args.output_dir)
    steps = args.steps if args.steps is not None else (
        60 if tiny else cfg.max_steps)
    batch_size = min(args.batch or cfg.global_batch, len(data.query_ids))
    negs = min(cfg.data.num_negatives, 7, len(data.corpus_ids) - 1)
    lj = min(cfg.data.max_joint_length,
             data.query_ids.shape[1] + data.corpus_ids.shape[1] + 1)

    s_cfg = _bert_cfg(cfg.student.bert, tiny, data.vocab_size)
    t_cfg = _bert_cfg(cfg.student.bert.replace(num_layers=12), tiny,
                      data.vocab_size, joint=True)
    # --init-checkpoint: the PROD student init — first n layers of a deeper
    # HF checkpoint (ERNIE-2.0, ProD_KD/model/models.py:33-41,52-60)
    init = _load_init_checkpoint(args)
    if init is not None:
        s_cfg = _init_bert_cfg(init, s_cfg, data.vocab_size)
    student = BiEncoder(BiEncoderConfig(bert=s_cfg))
    teacher = CrossEncoder(CrossEncoderConfig(bert=t_cfg))
    s_params = student.init(jax.random.PRNGKey(args.seed),
                            data.query_ids[:2], data.query_mask[:2],
                            data.corpus_ids[:2], data.corpus_mask[:2])
    if init is not None:
        s_params = _graft_encoder(
            s_params, init,
            [("question_model", "encoder"), ("ctx_model", "encoder")],
            s_cfg.num_layers)
    t_params = teacher.init(jax.random.PRNGKey(args.seed + 1),
                            np.ones((2, lj), np.int32),
                            np.ones((2, lj), np.int32))
    kd_lr = args.lr if args.lr is not None else (1e-3 if tiny else None)
    tx = _make_optim(cfg.optim, kd_lr, steps)
    state = TrainState.create(s_params, tx)

    k = negs + 1
    gold = _gold_warm(data, k)
    ds = from_mining_result(data.corpus_ids, data.query_ids, gold,
                            num_negatives=negs, max_joint_length=lj,
                            sep_id=data.sep_id, seed=args.seed,
                            simans_mode=None)

    # teacher warmup (the pipeline's CE stage precedes distillation);
    # on resume the warmed teacher is restored instead of re-trained
    # (the reference reloads --teacher_model_path each relaunch)
    t_tx = _make_optim(cfg.optim, kd_lr, steps)
    t_state = TrainState.create(t_params, t_tx)
    resume_step = _resume_step(args, "student_state")
    if resume_step is not None:
        t_state = _restore_state(args, t_state, 0, "kd_teacher_state",
                                 mesh)
        print(f"[{name}] resumed at step {resume_step}")
    else:
        ce_step = make_reranker_step(teacher, t_tx, mesh,
                                     group_size=1 + negs)
        for _ in range(max(1, steps // 8)):
            for b in ds.batches(batch_size=batch_size):
                dev = shard_batch({"joint_ids": b["joint_ids"],
                                   "joint_mask": b["joint_mask"]}, mesh)
                t_state, _ = ce_step(t_state, dev)
        if args.output_dir:
            save_checkpoint(args.output_dir, t_state, 0,
                            name="kd_teacher_state")

    # --fast-teacher: distillation teacher forwards are frozen -> run them
    # through the fused int8 view of the warmed teacher params.
    kd_teacher = teacher
    if args.fast_teacher:
        view = _int8_view_cfg(t_cfg)
        if view is not None:
            kd_teacher = CrossEncoder(CrossEncoderConfig(bert=view))
    step = make_kd_step(student, tx, mesh, cfg.teacher_type,
                        kd_type=cfg.kd_type, temperature=cfg.temperature,
                        ce_weight=cfg.ce_weight, kd_weight=cfg.kd_weight,
                        lwf_weight=cfg.lwf_weight, dkd_alpha=cfg.dkd_alpha,
                        dkd_beta=cfg.dkd_beta, ce_teacher_model=kd_teacher)
    teachers = {"ce": t_state.params}
    done, last = 0, float("nan")
    save_every = max(1, steps // 5)
    if resume_step is not None:
        state = _restore_state(args, state, resume_step, "student_state",
                               mesh)
        done = resume_step
    while done < steps:
        for b in ds.batches(batch_size=batch_size):
            state, m = step(state, teachers, shard_batch(b, mesh))
            done += 1
            last = float(m["loss"])
            if done % max(1, steps // 10) == 0:
                logger.log(done, {"loss": last}, phase="kd")
            if done % save_every == 0 and args.output_dir:
                save_checkpoint(args.output_dir, state, done,
                                name="student_state")
            if done >= steps:
                break
    out = {"recipe": name, "steps": done, "final_loss": last}
    if args.output_dir:
        save_checkpoint(args.output_dir, {"params": state.params}, done,
                        name="student")
        with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(f"[{name}] distilled {done} steps, loss={last:.4f}")
    return out


def run_pretrain(name: str, cfg: MasterPretrainConfig, args) -> dict:
    """MASTER bottlenecked-MAE pretraining (``MASTER/pretrain``): 8-stream
    masking collator -> Condenser multi-decoder objective -> encoder export.
    """
    import jax

    from simxns_tpu.data import CondenserCollator, HashTokenizer, TokenMeta
    from simxns_tpu.io import (
        MetricLogger, export_encoder_only, save_checkpoint)
    from simxns_tpu.models import Condenser, CondenserConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_condenser_step

    if args.corpus or args.queries:
        print("WARNING: master_pretrain trains on generated synthetic "
              "token streams; --corpus/--queries are ignored by this "
              "recipe (the reference pretrains from its own preprocessed "
              "MASTER corpus format).", file=sys.stderr)
    tiny = not args.full_size          # --tiny-models adds nothing here:
    #                                    the synthetic config is already tiny
    mesh = create_mesh()
    logger = MetricLogger(args.output_dir)
    steps = args.steps if args.steps is not None else (
        50 if tiny else cfg.optim.total_steps)
    batch_size = args.batch if args.batch is not None else cfg.global_batch
    if tiny and args.batch is None:
        batch_size = min(batch_size, 16)   # never clamp an explicit --batch

    tok = HashTokenizer(vocab_size=2048)
    meta = TokenMeta.for_hash_tokenizer(tok)
    seq = min(cfg.max_seq_length, 64 if tiny else cfg.max_seq_length)
    coll = CondenserCollator(meta, max_seq_length=seq,
                             mlm_probability=cfg.mlm_probability,
                             decoder_mlm_probability=(
                                 cfg.decoder_mlm_probability),
                             seed=args.seed)
    rng = np.random.default_rng(args.seed)

    def examples(n):
        out = []
        for _ in range(n):
            out.append({
                "text": rng.integers(5, 2000, size=int(
                    rng.integers(24, seq - 4))).tolist(),
                "queries": [rng.integers(5, 2000, size=6).tolist()],
                "next": [rng.integers(5, 2000, size=20).tolist()],
            })
        return out

    bert = _bert_cfg(cfg.bert, tiny, 2048)
    if tiny:
        bert = bert.replace(max_position_embeddings=max(seq, 64))
    # --init-checkpoint: MASTER pretrains FROM bert-base-uncased
    # (MASTER/README.md run_pre_training --model_name_or_path) — graft the
    # encoder and, when the artifact is an MLM checkpoint, the shared head
    init = _load_init_checkpoint(args)
    if init is not None:
        bert = _init_bert_cfg(init, bert, 2048)
    model = Condenser(CondenserConfig(bert=bert,
                                      n_head_layers=cfg.n_head_layers))
    params = model.init(jax.random.PRNGKey(args.seed), coll(examples(2)),
                        deterministic=True)
    if init is not None:
        params = _graft_encoder(params, init, [("encoder",)],
                                bert.num_layers)
        if init["mlm"] is not None:
            import jax.tree_util as jtu

            params["params"]["mlm"] = jtu.tree_map(np.asarray, init["mlm"])
    pt_lr = args.lr if args.lr is not None else (1e-3 if tiny else None)
    tx = _make_optim(cfg.optim, pt_lr, steps)
    state = TrainState.create(params, tx)
    step = make_condenser_step(model, tx, mesh)

    start = 0
    resume_step = _resume_step(args, "pretrain_state")
    if resume_step is not None:
        # resume restores params/opt/step; the synthetic example stream is
        # reseeded (not replayed) — matching HF Trainer's resume semantics
        # minus the batch-skip replay, which a random corpus doesn't need
        state = _restore_state(args, state, resume_step, "pretrain_state",
                               mesh)
        start = resume_step
        rng = np.random.default_rng(args.seed + resume_step)
        print(f"[{name}] resumed at step {resume_step}")
    save_every = max(1, steps // 5)
    last = float("nan")
    for i in range(start, steps):
        batch = shard_batch(coll(examples(batch_size)), mesh)
        state, m = step(state, batch)
        last = float(m["loss"])
        if (i + 1) % max(1, steps // 10) == 0:
            logger.log(i + 1, {"loss": last}, phase="pretrain")
        if (i + 1) % save_every == 0 and args.output_dir:
            save_checkpoint(args.output_dir, state, i + 1,
                            name="pretrain_state")
    out = {"recipe": name, "steps": steps, "final_loss": last}
    if args.output_dir:
        encoder = export_encoder_only(state.params)
        save_checkpoint(args.output_dir, {"params": encoder}, steps,
                        name="encoder")
        with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(f"[{name}] pretrained {steps} steps, loss={last:.4f}")
    return out


def run_lead(name: str, cfg, args) -> dict:
    """LEAD joint distillation: warm db + ce single-model stages, then the
    joint step with layer-score reweighting and periodic layer re-draws.

    Phase structure from ``LEAD/run_LEAD.py:43-276`` with the
    ``distill_from_12ce_to_6de.sh:40-71`` flag set (--distill_ce --train_ce
    --distill_db --train_db --distill_ce_db_layer_score
    --layer_selection_random --layer_score_reweight).
    """
    import jax
    import jax.numpy as jnp

    from simxns_tpu.data import from_mining_result
    from simxns_tpu.index import CorpusEncoder, MIPSIndex, RetrievalEngine
    from simxns_tpu.io import MetricLogger, save_checkpoint
    from simxns_tpu.losses.lead import select_layers
    from simxns_tpu.models import (
        BiEncoder, BiEncoderConfig, CrossEncoder, CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import (
        LeadConfig, TrainState, make_adamw, make_biencoder_step,
        make_lead_step, make_reranker_step)

    data = _get_corpus(args, cfg.data)
    tiny = args.tiny_models or (
        not args.full_size and not (args.corpus and not args.synthetic))
    mesh = create_mesh()
    logger = MetricLogger(args.output_dir)
    steps = args.steps if args.steps is not None else (
        30 if tiny else cfg.max_steps)
    batch_size = min(args.batch or cfg.global_batch, len(data.query_ids))
    negs = min(cfg.data.num_negatives, len(data.corpus_ids) - 1)
    m = 1 + negs
    lj = min(cfg.data.max_joint_length,
             data.query_ids.shape[1] + data.corpus_ids.shape[1] + 1)

    db_cfg = _bert_cfg(cfg.student.bert, tiny, data.vocab_size)
    ce_cfg = _bert_cfg(cfg.teacher_ce.bert, tiny, data.vocab_size,
                       joint=True)
    # --init-checkpoint: the LEAD student warm start (DistilBERT,
    # LEAD/modeling_distilbert.py + distill_from_12ce_to_6de.sh)
    init = _load_init_checkpoint(args)
    if init is not None:
        db_cfg = _init_bert_cfg(init, db_cfg, data.vocab_size)
    db = BiEncoder(BiEncoderConfig(bert=db_cfg,
                                   share_weight=cfg.student.share_weight))
    ce = CrossEncoder(CrossEncoderConfig(bert=ce_cfg, per_layer_logits=True))
    db_params = db.init(jax.random.PRNGKey(args.seed),
                        data.query_ids[:2], data.query_mask[:2],
                        data.corpus_ids[:2], data.corpus_mask[:2])
    if init is not None:
        towers = ([("question_model", "encoder")]
                  if cfg.student.share_weight else
                  [("question_model", "encoder"), ("ctx_model", "encoder")])
        db_params = _graft_encoder(db_params, init, towers,
                                   db_cfg.num_layers)
    ce_params = ce.init(jax.random.PRNGKey(args.seed + 1),
                        np.ones((2, lj), np.int32),
                        np.ones((2, lj), np.int32))
    lr = args.lr if args.lr is not None else (
        1e-3 if tiny else cfg.optim.learning_rate)

    # gold warm dataset (the reference initializes both models from trained
    # single-model checkpoints, run_LEAD.py DISTILL_CE_PATH/DISTILL_DB_PATH)
    nq = len(data.query_ids)
    gold = _gold_warm(data, m)
    ds = from_mining_result(data.corpus_ids, data.query_ids, gold,
                            num_negatives=negs, max_joint_length=lj,
                            sep_id=data.sep_id, seed=args.seed,
                            simans_mode=None)

    resume_step = _resume_step(args, "lead_db_state")
    tx_warm = make_adamw(lr, total_steps=0)
    db_state = TrainState.create(db_params, tx_warm)
    ce_state = TrainState.create(ce_params, tx_warm)
    if resume_step is None:
        warm_db = make_biencoder_step(db, tx_warm, mesh, grad_mode="full")
        warm_ce = make_reranker_step(ce, tx_warm, mesh, group_size=m)
        warm_epochs = 30 if tiny else max(1, steps // 10)
        for _ in range(warm_epochs):
            for b in ds.batches(batch_size=batch_size, with_joint=False):
                db_state, _ = warm_db(db_state, shard_batch(b, mesh))
        for _ in range(warm_epochs):
            for b in ds.batches(batch_size=batch_size):
                dev = shard_batch({"joint_ids": b["joint_ids"],
                                   "joint_mask": b["joint_mask"]}, mesh)
                ce_state, _ = warm_ce(ce_state, dev)

    # joint phase: fresh per-model optimizers on the recipe schedule
    warmup = int(cfg.warmup_ratio * steps)
    tx_db = make_adamw(lr * (0.1 if tiny else 1.0), warmup_steps=warmup,
                       total_steps=steps)
    tx_ce = make_adamw(lr * (0.1 if tiny else 1.0), warmup_steps=warmup,
                       total_steps=steps)
    states = {"db": TrainState.create(db_state.params, tx_db),
              "ce": TrainState.create(ce_state.params, tx_ce)}
    if resume_step is not None:
        states = {
            "db": _restore_state(args, states["db"], resume_step,
                                 "lead_db_state", mesh),
            "ce": _restore_state(args, states["ce"], resume_step,
                                 "lead_ce_state", mesh)}
        print(f"[{name}] resumed at step {resume_step}")
    train_ce = cfg.train_ce and not args.freeze_teachers
    lead_cfg = LeadConfig(
        distill_db=True, distill_ce=True, train_db=True, train_ce=train_ce,
        layer_score=True, reweight=cfg.reweight,
        temperature=cfg.temperature,
        layer_temperature=cfg.layer_temperature)
    k = min(cfg.num_distill_layers, db_cfg.num_layers, ce_cfg.num_layers)
    # --fast-teacher on a FROZEN CE: its forwards run through the
    # whole-layer fused int8 view of the live (warmed) params
    frozen_views = None
    if args.fast_teacher and not train_ce:
        view = _int8_view_cfg(ce_cfg)
        if view is not None:
            frozen_views = {"ce": CrossEncoder(CrossEncoderConfig(
                bert=view, per_layer_logits=True))}
    step = make_lead_step({"db": db, "ce": ce},
                          {"db": tx_db, "ce": tx_ce}, mesh, lead_cfg,
                          num_distill_layers=k, frozen_views=frozen_views)
    rng = np.random.default_rng(args.seed)
    sel_s, sel_t = select_layers(rng, db_cfg.num_layers, ce_cfg.num_layers,
                                 k, cfg.layer_selection)
    done, last = 0, float("nan")
    if resume_step is not None:
        # replay the layer draws the dead run consumed so the resumed
        # run's selection stream continues deterministically
        # (run_LEAD.py:260 re-draws every save_steps)
        for _ in range(resume_step // cfg.save_steps):
            sel_s, sel_t = select_layers(
                rng, db_cfg.num_layers, ce_cfg.num_layers, k,
                cfg.layer_selection)
        done = resume_step
    while done < steps:
        for b in ds.batches(batch_size=batch_size):
            if (done % cfg.save_steps == 0 and done > 0
                    and done != resume_step):
                # layer re-draw (run_LEAD.py:260) — traced, no recompile.
                # The resume boundary itself is excluded: its draw was
                # already replayed above, and re-saving it is pointless.
                sel_s, sel_t = select_layers(
                    rng, db_cfg.num_layers, ce_cfg.num_layers, k,
                    cfg.layer_selection)
                if args.output_dir:
                    save_checkpoint(args.output_dir, states["db"], done,
                                    name="lead_db_state")
                    save_checkpoint(args.output_dir, states["ce"], done,
                                    name="lead_ce_state")
            states, metrics = step(states, shard_batch(b, mesh),
                                   jnp.asarray(sel_s, jnp.int32),
                                   jnp.asarray(sel_t, jnp.int32))
            done += 1
            last = float(metrics["loss"])
            if done % max(1, steps // 10) == 0:
                logger.log(done, {"loss": last}, phase="lead")
            if done >= steps:
                break

    # final: retrieval eval with the distilled student
    index = MIPSIndex(mesh, block_size=min(
        8192, max(32, len(data.corpus_ids) // 4)), **_index_kwargs(args))
    engine = RetrievalEngine(index, data.passages, logger=logger)
    db_enc_fn = lambda p, i, msk: db.apply(p, i, msk, method="encode_passage")
    q_enc = CorpusEncoder(
        lambda p, i, msk: db.apply(p, i, msk, method="encode_query"),
        mesh, chunk_size=min(1024, max(64, nq)),
        stall_timeout_s=_stall_timeout(args))
    _build_index(index, db_enc_fn, states["db"].params, data.corpus_ids,
                 data.corpus_mask, mesh, data.vocab_size, args)
    res = engine.mine(q_enc(states["db"].params, data.query_ids,
                            data.query_mask),
                      data.questions, data.answers,
                      k=min(args.topk or 10, len(data.corpus_ids)),
                      positive_ids=data.positive_rows)
    out = {"recipe": name, "steps": done, "final_loss": last,
           "top1": res.top_k_hits[0],
           "mrr10": res.metrics.get("MRR_n@_10", 0.0)}
    if args.output_dir:
        save_checkpoint(args.output_dir, {"params": states["db"].params},
                        done, name="student")
        save_checkpoint(args.output_dir, {"params": states["ce"].params},
                        done, name="teacher_ce")
        with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(f"[{name}] joint-distilled {done} steps, loss={last:.4f} "
          f"top1={out['top1']:.3f}")
    return out


def _doc2query_generate(t5_init, data, args, cfg) -> str:
    """Generate the docT5query expansion TSV from a T5 checkpoint — the
    reference's standalone generation stage
    (``CAPSTONE/models/generate_query.py:115-235``), run inline when
    ``--init-checkpoint`` is a T5 artifact. Decoding generated ids back
    to text needs the T5 tokenizer (``--t5-tokenizer`` dir; the corpus'
    BERT-family tokenizer cannot decode T5 ids)."""
    from simxns_tpu.models import (
        T5, convert_hf_t5, doc2query_tsv, t5_config_from_state_dict)

    if not args.t5_tokenizer:
        raise SystemExit(
            "--init-checkpoint is a T5 (doc2query) artifact; pass "
            "--t5-tokenizer <local dir> so generated ids can be decoded")
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.t5_tokenizer)
    model = T5(t5_config_from_state_dict(t5_init["sd"]))
    params = convert_hf_t5(t5_init["sd"])
    out = os.path.join(args.output_dir or ".", "doc2query.tsv")
    n = len(data.corpus_ids)
    doc2query_tsv(
        model, params, tok,
        ((i, data.passages.get(i, ("", ""))[0]) for i in range(n)),
        out, num_queries=cfg.total_part, seed=args.seed)
    print(f"[capstone] doc2query TSV written: {out} ({n} passages x "
          f"{cfg.total_part} queries)", file=sys.stderr)
    return out


def run_capstone(name: str, cfg, args) -> dict:
    """CAPSTONE curriculum DE training over doc2query-expanded passages.

    Faithful to ``CAPSTONE/models/run_de_model_ernie.py:56-396``: every
    positive/negative passage is expanded with one generated query chosen
    by the gradual curriculum (least -> most gold-similar as training
    progresses); at eval the corpus is expanded with the top-k queries.
    Generated queries come from ``--query-tsv`` (``psg_id\\tq1\\tq2...``,
    the docT5query output — ``models/seq2seq.queries_to_tsv``); the
    synthetic fallback fabricates per-passage queries.
    """
    import jax

    from simxns_tpu.data.curriculum import QueryExpander, gradual_bucket
    from simxns_tpu.index import CorpusEncoder, MIPSIndex, RetrievalEngine
    from simxns_tpu.io import MetricLogger, save_checkpoint
    from simxns_tpu.models import BiEncoder, BiEncoderConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_biencoder_step

    data = _get_corpus(args, cfg.data)
    if data.tokenizer is None:
        raise SystemExit(
            "capstone_curriculum re-tokenizes expanded passage text per "
            "batch; prepared token-only corpora are not supported — run "
            "--synthetic at demo scale (<= 20000 passages; larger synthetic "
            "corpora are vectorized token-only), or extend _load_prepared "
            "with a text corpus + tokenizer")
    tok = data.tokenizer
    tiny = not args.full_size
    mesh = create_mesh()
    logger = MetricLogger(args.output_dir)
    steps = args.steps if args.steps is not None else (
        40 if tiny else cfg.max_steps)
    batch_size = min(args.batch or cfg.global_batch, len(data.query_ids))
    negs = min(cfg.data.num_negatives, 3 if tiny else 10**9,
               len(data.corpus_ids) - 1)
    m = 1 + negs
    lc = data.corpus_ids.shape[1]

    # --init-checkpoint: CAPSTONE inits the DE from coCondenser
    # (run_de_model_ernie.sh --model_name_or_path co-condenser-marco);
    # a T5 checkpoint is instead the docT5query GENERATOR — it produces
    # the expansion query TSV (generate_query.py:115-235)
    init = _load_init_checkpoint(args)
    t5_init = None
    if init is not None and init["family"] == "t5":
        t5_init, init = init, None

    delim = " [SEP] " if cfg.delimiter == "sep" else " "
    if args.query_tsv:
        expander = QueryExpander.from_tsv(
            args.query_tsv, total_part=cfg.total_part, delimiter=delim)
    elif t5_init is not None:
        tsv = _doc2query_generate(t5_init, data, args, cfg)
        expander = QueryExpander.from_tsv(
            tsv, total_part=cfg.total_part, delimiter=delim)
    else:
        # synthetic doc2query output: per-passage queries of varying
        # gold-similarity so the curriculum has something to order
        queries = {
            i: [f"document {i} fact{i}",          # near-gold
                f"what does document {i} say",    # mid
                f"unrelated noise {i * 7 % 97}"]  # far
            for i in range(len(data.corpus_ids))}
        expander = QueryExpander(
            queries=queries, total_part=cfg.total_part, delimiter=delim)

    bert = _bert_cfg(cfg.retriever.bert, tiny, data.vocab_size)
    if init is not None:
        bert = _init_bert_cfg(init, bert, data.vocab_size)
    model = BiEncoder(BiEncoderConfig(
        bert=bert, share_weight=cfg.retriever.share_weight,
        pooling=cfg.retriever.pooling))
    params = model.init(jax.random.PRNGKey(args.seed),
                        data.query_ids[:2], data.query_mask[:2],
                        data.corpus_ids[:2], data.corpus_mask[:2])
    if init is not None:
        towers = ([("question_model", "encoder")]
                  if cfg.retriever.share_weight else
                  [("question_model", "encoder"), ("ctx_model", "encoder")])
        params = _graft_encoder(params, init, towers, bert.num_layers)
    lr = args.lr if args.lr is not None else (
        3e-3 if tiny else cfg.optim.learning_rate)
    tx = make_adamw(lr, warmup_steps=min(cfg.optim.warmup_steps, steps // 4),
                    total_steps=steps)
    state = TrainState.create(params, tx)
    step = make_biencoder_step(model, tx, mesh, grad_mode="full")

    rng = np.random.default_rng(args.seed)
    nq = len(data.query_ids)
    start = 0
    resume_step = _resume_step(args, "curriculum_state")
    if resume_step is not None:
        # the curriculum bucket is a pure function of the step index, so a
        # resumed run re-enters the same bucket; the sampling rng is
        # reseeded (fresh draws, same distribution)
        state = _restore_state(args, state, resume_step, "curriculum_state",
                               mesh)
        start = resume_step
        rng = np.random.default_rng(args.seed + resume_step)
        print(f"[{name}] resumed at step {resume_step}")
    save_every = max(1, steps // 5)

    def expanded_ctx_row(row: int, question: str, bucket: int,
                         gold_prob: float) -> np.ndarray:
        text, title = data.passages.get(row, ("", ""))
        mode = (f"{max(bucket, 1)}-part" if bucket > 0 else "first")
        q_sel = (question if bucket == 0
                 else expander.select_query(row, question, mode, rng,
                                            gold_query_prob=gold_prob))
        body = expander.expand_passage(text, q_sel)
        enc = tok.encode(title, text_pair=body, max_length=lc)
        out = np.zeros((lc,), np.int32)
        out[: len(enc)] = enc
        return out

    last = float("nan")
    for it in range(start, steps):
        bucket, gold_prob = gradual_bucket(
            it, steps, cfg.total_part, cfg.select_generated_query)
        # batch_size is clamped to <= nq above, so no-replacement is safe
        q_idx = rng.choice(nq, size=batch_size, replace=False)
        ctx_ids = np.zeros((batch_size * m, lc), np.int32)
        for bi, qi in enumerate(q_idx):
            neg_rows = [(int(qi) + 1 + int(r)) % len(data.corpus_ids)
                        for r in rng.choice(len(data.corpus_ids) - 1,
                                            size=negs, replace=False)]
            for j, row in enumerate([int(qi)] + neg_rows):
                ctx_ids[bi * m + j] = expanded_ctx_row(
                    row, data.questions[qi], bucket, gold_prob)
        q = data.query_ids[q_idx]
        batch = {
            "q_ids": q, "q_mask": (q != 0).astype(np.int32),
            "ctx_ids": ctx_ids,
            "ctx_mask": (ctx_ids != 0).astype(np.int32),
            "positive_idx": (np.arange(batch_size) * m).astype(np.int32),
        }
        state, metrics = step(state, shard_batch(batch, mesh))
        last = float(metrics["loss"])
        if (it + 1) % max(1, steps // 10) == 0:
            logger.log(it + 1, {"loss": last, "bucket": bucket},
                       phase="curriculum")
        if (it + 1) % save_every == 0 and args.output_dir:
            save_checkpoint(args.output_dir, state, it + 1,
                            name="curriculum_state")

    # eval over the top-k-query expanded corpus
    # (run_de_model_expand_corpus_cocondenser.sh:44-60 --top_k_query)
    exp_corpus = np.zeros_like(data.corpus_ids)
    for i in range(len(data.corpus_ids)):
        text, title = data.passages.get(i, ("", ""))
        body = expander.expand_corpus_entry(i, text, cfg.top_k_query)
        enc = tok.encode(title, text_pair=body, max_length=lc)
        exp_corpus[i, : len(enc)] = enc
    index = MIPSIndex(mesh, block_size=min(
        8192, max(32, len(data.corpus_ids) // 4)), **_index_kwargs(args))
    engine = RetrievalEngine(index, data.passages, logger=logger)
    enc_fn = lambda p, i, msk: model.apply(p, i, msk, method="encode_passage")
    q_enc = CorpusEncoder(
        lambda p, i, msk: model.apply(p, i, msk, method="encode_query"),
        mesh, chunk_size=min(1024, max(64, nq)),
        stall_timeout_s=_stall_timeout(args))
    _build_index(index, enc_fn, state.params, exp_corpus,
                 (exp_corpus != 0).astype(np.int32), mesh,
                 data.vocab_size, args)
    res = engine.mine(q_enc(state.params, data.query_ids, data.query_mask),
                      data.questions, data.answers,
                      k=min(args.topk or 10, len(data.corpus_ids)),
                      positive_ids=data.positive_rows)
    out = {"recipe": name, "steps": steps, "final_loss": last,
           "top1": res.top_k_hits[0],
           "mrr10": res.metrics.get("MRR_n@_10", 0.0)}
    if args.qrels:
        # the reference's TREC comparison surface: nDCG@10 + map_cut_10 +
        # recip_rank + recall_N from graded qrels
        # (CAPSTONE/utils/evaluate_trec.py:72-107)
        from simxns_tpu.data import load_trec_qrels
        from simxns_tpu.evals import trec_eval_all

        graded = load_trec_qrels(args.qrels)
        topk_ids = np.asarray(res.topk_ids)
        ranked = {str(i): [int(p) for p in topk_ids[i]]
                  for i in range(len(data.query_ids))}
        out["trec"] = trec_eval_all(ranked, graded, k=10,
                                    recall_k=topk_ids.shape[1])
    if args.output_dir:
        save_checkpoint(args.output_dir, {"params": state.params}, steps,
                        name="retriever")
        with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(f"[{name}] curriculum-trained {steps} steps, "
          f"top1={out['top1']:.3f}")
    return out


def run_allies(name: str, cfg, args) -> dict:
    """ALLIES beam-search QA over a trained retriever + (scripted) LLM.

    Mirrors ``ALLIES/main.py:11-160``: per-question beam search with
    retrieval-grounded answering and EM/F1 scoring. The LLM is the
    deterministic :class:`simxns_tpu.allies.EvidenceLLM` (no network in
    this image); inject a real client for production.
    """
    import jax

    from simxns_tpu.allies import (
        ALLIESConfig, EvidenceLLM, allies_answer, exact_match, f1_score)
    from simxns_tpu.index import CorpusEncoder, MIPSIndex
    from simxns_tpu.io import MetricLogger
    from simxns_tpu.models import BiEncoder, BiEncoderConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_biencoder_step
    from simxns_tpu.data import from_mining_result

    from simxns_tpu.config import DataConfig

    data = _get_corpus(args, DataConfig())
    if data.tokenizer is None:
        raise SystemExit("allies_qa needs a text corpus with a tokenizer; "
                         "run --synthetic at demo scale (<= 20000 passages)")
    tok = data.tokenizer
    mesh = create_mesh()
    logger = MetricLogger(args.output_dir)
    lq = data.query_ids.shape[1]

    # warm a tiny retriever on the gold pairs (the reference loads a
    # finetuned DPR checkpoint + 60GB of precomputed embeddings)
    bert = _bert_cfg(None, True, data.vocab_size)
    model = BiEncoder(BiEncoderConfig(bert=bert))
    params = model.init(jax.random.PRNGKey(args.seed),
                        data.query_ids[:2], data.query_mask[:2],
                        data.corpus_ids[:2], data.corpus_mask[:2])
    tx = make_adamw(3e-3, total_steps=0)
    state = TrainState.create(params, tx)
    step = make_biencoder_step(model, tx, mesh, grad_mode="full")
    nq = len(data.query_ids)
    m = 2
    gold = _gold_warm(data, m)
    ds = from_mining_result(data.corpus_ids, data.query_ids, gold,
                            num_negatives=1, sep_id=data.sep_id,
                            seed=args.seed, simans_mode=None)
    batch_size = min(args.batch or 16, nq)
    for _ in range(30):
        for b in ds.batches(batch_size=batch_size, with_joint=False):
            state, _ = step(state, shard_batch(b, mesh))

    index = MIPSIndex(mesh, block_size=min(
        8192, max(32, len(data.corpus_ids) // 4)), **_index_kwargs(args))
    _build_index(index,
                 lambda p, i, msk: model.apply(p, i, msk,
                                               method="encode_passage"),
                 state.params, data.corpus_ids, data.corpus_mask, mesh,
                 data.vocab_size, args)

    q_encode = jax.jit(
        lambda p, i, msk: model.apply(p, i, msk, method="encode_query"))

    def retrieve(question: str, k: int):
        enc = tok.encode(question, max_length=lq)
        ids = np.zeros((1, lq), np.int32)
        ids[0, : len(enc)] = enc
        emb = np.asarray(q_encode(state.params, ids,
                                  (ids != 0).astype(np.int32)), np.float32)
        _, top = index.search(emb, min(k, len(data.corpus_ids)),
                              query_batch=8)
        return [data.passages.get(int(p), ("", ""))[0] for p in top[0]]

    llm = EvidenceLLM()
    allies_cfg = ALLIESConfig(
        beam_size=cfg.beam_size, beam_depth=cfg.beam_depth,
        threshold=cfg.threshold, top_k=cfg.topk,
        retrieval_type=cfg.retrieval_type, summarize=cfg.summarize)
    n_eval = min(len(data.questions),
                 args.steps if args.steps is not None else 16)
    ems, f1s, api_calls, retrievals = [], [], 0, 0
    for qi in range(n_eval):
        answer, _, counters = allies_answer(
            data.questions[qi], llm, allies_cfg, retrieve)
        ems.append(exact_match(answer, data.answers[qi]))
        f1s.append(f1_score(answer, data.answers[qi]))
        api_calls += counters["api_calls"]
        retrievals += counters["retrievals"]
    out = {"recipe": name, "questions": n_eval,
           "em": float(np.mean(ems)), "f1": float(np.mean(f1s)),
           "api_calls_per_q": api_calls / max(n_eval, 1),
           "retrievals_per_q": retrievals / max(n_eval, 1)}
    if args.output_dir:
        with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
            json.dump(out, f, indent=1)
    logger.log(n_eval, {"em": out["em"], "f1": out["f1"]}, phase="allies")
    print(f"[{name}] {n_eval} questions: EM={out['em']:.3f} "
          f"F1={out['f1']:.3f}")
    return out


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    _setup_platform(args)
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    cfg = RECIPES[args.recipe]
    if isinstance(cfg, AR2RecipeConfig):
        return run_ar2(args.recipe, cfg, args)
    if isinstance(cfg, KDRecipeConfig):
        return run_kd(args.recipe, cfg, args)
    if isinstance(cfg, MasterPretrainConfig):
        return run_pretrain(args.recipe, cfg, args)
    if isinstance(cfg, LeadRecipeConfig):
        return run_lead(args.recipe, cfg, args)
    if isinstance(cfg, CapstoneRecipeConfig):
        return run_capstone(args.recipe, cfg, args)
    if isinstance(cfg, AlliesRecipeConfig):
        return run_allies(args.recipe, cfg, args)
    raise SystemExit(f"recipe {args.recipe} has no runner")


if __name__ == "__main__":
    main()
