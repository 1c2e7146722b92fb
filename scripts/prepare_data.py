"""Pre-tokenize reference-format corpora into packed token arrays.

The TPU pipeline consumes fixed-shape int32 token arrays (SURVEY.md §7.1
item 6: "pre-tokenized packed arrays"); this tool converts the reference's
file formats once, offline:

    python scripts/prepare_data.py corpus  --passages psgs_w100.tsv \
        --out corpus.npz --max-length 128 [--tokenizer <hf path>]
    python scripts/prepare_data.py marco-corpus --para para.txt \
        --titles para.title.txt --out corpus.npz
    python scripts/prepare_data.py msdoc --docs msmarco-docs.tsv --out corpus.npz
    python scripts/prepare_data.py queries --qa nq-train.qa.csv --out q.npz
    python scripts/prepare_data.py marco-queries --queries-tsv \
        queries.train.tsv --out q.npz      # qid\\tquery; pids carry the qids

Outputs an ``.npz`` with ``ids [N, L] int32`` (CLS...SEP, pad 0),
``pids [N] int64`` and, for queries, a JSON sidecar with questions/answers.
Without ``--tokenizer`` the deterministic HashTokenizer is used (synthetic/
dev runs); pass a local HF tokenizer path for real corpora.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simxns_tpu.data import HashTokenizer, load_qa_csv, load_passages_tsv
from simxns_tpu.data.datasets import load_id_text, load_msdoc_tsv
from simxns_tpu.data.tokenization import load_hf_tokenizer


def get_tokenizer(path):
    if path and path.startswith("star:"):
        # MS-Doc reproduction: the pinned transformers-2.8 Roberta BPE
        # (SimANS/Doc_training/star_tokenizer.py contract); pass a directory
        # holding roberta-base vocab.json + merges.txt
        from simxns_tpu.data import load_star_tokenizer

        d = path[len("star:"):]
        return load_star_tokenizer(os.path.join(d, "vocab.json"),
                                   os.path.join(d, "merges.txt"))
    if path:
        return load_hf_tokenizer(path)
    return HashTokenizer()


def pack(tok, texts, pairs, max_length, chunk=50_000):
    ids = np.zeros((len(texts), max_length), np.int32)
    if hasattr(tok, "encode_batch"):
        # HF fast path: Rust-side batched encoding, chunked for memory
        for s in range(0, len(texts), chunk):
            rows = tok.encode_batch(
                texts[s: s + chunk],
                pairs[s: s + chunk] if pairs else None, max_length)
            for i, enc in enumerate(rows):
                ids[s + i, : len(enc)] = enc
            print(f"  tokenized {min(s + chunk, len(texts))}/{len(texts)}",
                  flush=True)
        return ids
    for i, text in enumerate(texts):
        enc = tok.encode(text, text_pair=pairs[i] if pairs else None,
                         max_length=max_length)
        ids[i, : len(enc)] = enc
        if (i + 1) % 100_000 == 0:
            print(f"  tokenized {i + 1}/{len(texts)}", flush=True)
    return ids


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["corpus", "marco-corpus", "msdoc",
                                     "queries", "marco-queries"])
    ap.add_argument("--passages")
    ap.add_argument("--para")
    ap.add_argument("--titles")
    ap.add_argument("--docs")
    ap.add_argument("--qa")
    ap.add_argument("--queries-tsv")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--tokenizer", default=None)
    args = ap.parse_args(argv)
    required = {"corpus": "passages", "marco-corpus": "para",
                "msdoc": "docs", "queries": "qa",
                "marco-queries": "queries_tsv"}
    if getattr(args, required[args.mode]) is None:
        flag = "--" + required[args.mode].replace("_", "-")
        ap.error(f"mode '{args.mode}' requires {flag}")
    # np.savez_compressed appends .npz when missing; normalize up-front so
    # the qa sidecar is derived from the REAL npz path (run.py looks up
    # <queries-arg> + '.qa.json')
    if not args.out.endswith(".npz"):
        args.out += ".npz"
    tok = get_tokenizer(args.tokenizer)

    if args.mode == "corpus":
        rows = load_passages_tsv(args.passages)
        pids = np.asarray([r[0] for r in rows], np.int64)
        ids = pack(tok, [r[2] for r in rows], [r[1] for r in rows],
                   args.max_length)   # title as text, body as pair
    elif args.mode == "marco-corpus":
        text = load_id_text(args.para)
        titles = load_id_text(args.titles) if args.titles else {}
        keys = sorted(text)
        pids = np.asarray(keys, np.int64)
        ids = pack(tok, [titles.get(k, "-") for k in keys],
                   [text[k] for k in keys], args.max_length)
    elif args.mode == "msdoc":
        rows = load_msdoc_tsv(args.docs)
        pids = np.asarray([r[0] for r in rows], np.int64)
        ids = pack(tok, [r[1] for r in rows], None, args.max_length)
    elif args.mode == "marco-queries":
        # MARCO queries.train.tsv (qid\tquery): pids carry the REAL qids so
        # run.py --qrels can join rows to qrels (inference_DE_marco.py:446+)
        by_qid = load_id_text(args.queries_tsv)   # qid -> query, file order
        qids, texts = list(by_qid), list(by_qid.values())
        pids = np.asarray(qids, np.int64)
        ids = pack(tok, texts, None, args.max_length)
        with open(args.out + ".qa.json", "w", encoding="utf-8") as f:
            json.dump([{"question": q, "answers": []} for q in texts], f)
    else:  # queries
        qa = load_qa_csv(args.qa)
        pids = np.arange(len(qa), dtype=np.int64)
        ids = pack(tok, [q for q, _ in qa], None, args.max_length)
        with open(args.out + ".qa.json", "w", encoding="utf-8") as f:
            json.dump([{"question": q, "answers": a} for q, a in qa], f)

    # record the packer's separator id so run.py splices joint inputs with
    # the SAME token the corpus was packed with (a BERT-vocab corpus packed
    # here has sep=102; RoBERTa/Hash use 2 — run.py must not assume)
    sep_raw = getattr(tok, "sep_token_id", None)
    if sep_raw is None:
        ap.error(f"tokenizer {args.tokenizer!r} has no sep_token_id — joint "
                 "cross-encoder inputs cannot be packed with this vocab")
    sep_id = int(sep_raw)
    np.savez_compressed(args.out, ids=ids, pids=pids,
                        sep_id=np.asarray(sep_id, np.int64))
    print(f"wrote {args.out}: ids {ids.shape}, pids {pids.shape}, "
          f"sep_id {sep_id}")


if __name__ == "__main__":
    main()
