import pytest

# whole-module: multi-minute trainer e2e runs
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from simxns_tpu.models import (
    BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder, CrossEncoderConfig)
from simxns_tpu.parallel import create_mesh
from simxns_tpu.index import MIPSIndex, CorpusEncoder, RetrievalEngine
from simxns_tpu.data import (HashTokenizer, RetrievalCollator,
                             RetrievalDataset, load_wiki_json)
from simxns_tpu.data.datasets import RetrievalExample, Passage
from simxns_tpu.train import (
    TrainState, make_adamw, make_biencoder_step, make_kd_step,
    Pipeline, train_stage, refresh_stage, division_stage)

CFG = BertConfig.tiny(vocab_size=512)


def test_prod_style_pipeline_end_to_end(tmp_path):
    """warmup DE -> mine/refresh -> CE-teacher KD -> division, in-process."""
    mesh = create_mesh()
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.default_rng(0)

    n_corpus = 64
    passages = {i: (f"body {i} ans{i} end", f"t{i}") for i in range(n_corpus)}
    corpus_tok = np.stack([
        np.array((tok.encode(passages[i][1], text_pair=passages[i][0],
                             max_length=16) + [0] * 16)[:16], np.int32)
        for i in range(n_corpus)])
    corpus_mask = (corpus_tok != 0).astype(np.int32)

    qids = list(range(32))
    questions = [f"body {i} ans{i}" for i in qids]  # strong lexical overlap
    answers = [[f"ans{i}"] for i in qids]
    q_tok = np.stack([np.array((tok.encode(q, max_length=12) + [0] * 12)[:12],
                               np.int32) for q in questions])
    q_mask = (q_tok != 0).astype(np.int32)

    student = BiEncoder(BiEncoderConfig(bert=CFG))
    teacher_ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    coll = RetrievalCollator(tokenizer=tok, num_negatives=2, max_q_length=12,
                             max_ctx_length=16, max_joint_length=28,
                             simans_mode=None)

    def initial_examples():
        out = []
        for qi, i in enumerate(qids):
            negs = [j for j in rng.permutation(n_corpus)[:6] if j != i][:4]
            out.append(RetrievalExample(
                str(i), questions[qi], answers[qi],
                [Passage(i, 5.0, passages[i][1], passages[i][0])],
                [Passage(j, 4.0, passages[j][1], passages[j][0])
                 for j in negs]))
        return out

    dataset = RetrievalDataset(initial_examples(), coll, seed=0)
    dummy = coll(dataset.examples[:2], dataset.rng)
    tx = make_adamw(3e-3, total_steps=0)
    s_params = student.init(jax.random.PRNGKey(0), dummy["q_ids"],
                            dummy["q_mask"], dummy["ctx_ids"],
                            dummy["ctx_mask"])
    ce_params = teacher_ce.init(
        jax.random.PRNGKey(1), dummy["joint_ids"].reshape(-1, 28),
        dummy["joint_mask"].reshape(-1, 28))

    index = MIPSIndex(mesh, block_size=16, store_dtype=jnp.float32)
    engine = RetrievalEngine(index, passages)
    p_encoder = CorpusEncoder(
        lambda p, i, m: student.apply(p, i, m, method="encode_passage"),
        mesh, chunk_size=32)
    q_encoder = CorpusEncoder(
        lambda p, i, m: student.apply(p, i, m, method="encode_query"),
        mesh, chunk_size=32)

    ctx = {
        "mesh": mesh, "index": index, "engine": engine,
        "de": TrainState.create(s_params, tx),
        "ce_teacher": {"ce": ce_params},
        "dataset": dataset,
    }

    warm_step = make_biencoder_step(student, tx, mesh, grad_mode="full")
    kd_step = make_kd_step(student, tx, mesh, "cross_encoder",
                           kd_type="KD_softmax", ce_weight=1.0, kd_weight=0.5,
                           ce_teacher_model=teacher_ce)

    def de_batches(ctx):
        for b in ctx["dataset"].batches(batch_size=16):
            yield {k: v for k, v in b.items()
                   if k not in ("joint_ids", "joint_mask", "answers")}

    def kd_batches(ctx):
        yield from ctx["dataset"].batches(batch_size=16)

    def rebuild(ctx, res):
        import json
        path = str(tmp_path / "mined.json")
        with open(path, "w") as f:
            json.dump(res.train_examples, f)
        exs = load_wiki_json(path)
        return RetrievalDataset(exs, coll, seed=1) if len(exs) >= 16 \
            else ctx["dataset"]

    pipe = Pipeline([
        train_stage("warmup_de", "de", warm_step, de_batches, num_steps=40),
        refresh_stage("mine_refresh",
                      lambda c: p_encoder(c["de"].params, corpus_tok,
                                          corpus_mask),
                      lambda c: q_encoder(c["de"].params, q_tok, q_mask),
                      questions, answers, k=10, build_dataset=rebuild),
        train_stage("kd_ce_teacher", "de", kd_step, kd_batches,
                    num_steps=6, teacher_keys=["ce"]),
    ], ctx={**ctx, "ce": ce_params})
    out = pipe.run()

    names = [h["stage"] for h in out["history"]]
    assert names == ["warmup_de", "mine_refresh", "kd_ce_teacher"]
    assert out["history"][1]["mined"] == 32
    assert np.isfinite(out["history"][2]["loss"])
    # warmup gave useful retrieval before KD
    assert out["history"][1]["top1"] > 0.2


def test_master_finetune_pipeline_five_stages(tmp_path):
    """The full ``MASTER/finetune/ft_MS_MASTER.sh:1-135`` sequence as one
    in-process Pipeline: BM25-negative DE warmup -> inference with hard-neg
    writing (the ``train_ce_hardneg.tsv`` contract) -> hard-neg DE retrain
    -> CE (reranker) train -> DE/CE co-training window + final eval."""
    from simxns_tpu.data import from_mining_result
    from simxns_tpu.train import (
        Stage, make_ar2_retriever_step, make_reranker_step)
    from simxns_tpu.parallel import shard_batch

    mesh = create_mesh()
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.default_rng(3)

    n_corpus, n_q, lc, lq, lj, negs = 64, 32, 16, 12, 24, 2
    m = 1 + negs
    passages = {i: (f"body {i} ans{i} end", f"t{i}") for i in range(n_corpus)}
    corpus_tok = np.stack([
        np.array((tok.encode(passages[i][1], text_pair=passages[i][0],
                             max_length=lc) + [0] * lc)[:lc], np.int32)
        for i in range(n_corpus)])
    corpus_mask = (corpus_tok != 0).astype(np.int32)
    questions = [f"body {i} ans{i}" for i in range(n_q)]
    answers = [[f"ans{i}"] for i in range(n_q)]
    q_tok = np.stack([np.array((tok.encode(q, max_length=lq) + [0] * lq)[:lq],
                               np.int32) for q in questions])
    q_mask = (q_tok != 0).astype(np.int32)

    de = BiEncoder(BiEncoderConfig(bert=CFG))
    ce = CrossEncoder(CrossEncoderConfig(bert=CFG))
    tx = make_adamw(3e-3, total_steps=0)
    tx_co = make_adamw(3e-4, total_steps=0)
    de_params = de.init(jax.random.PRNGKey(0), q_tok[:2], q_mask[:2],
                        corpus_tok[:2], corpus_mask[:2])
    ce_params = ce.init(jax.random.PRNGKey(1), np.ones((2, lj), np.int32),
                        np.ones((2, lj), np.int32))

    index = MIPSIndex(mesh, block_size=16, store_dtype=jnp.float32)
    engine = RetrievalEngine(index, passages)
    p_enc = CorpusEncoder(
        lambda p, i, mk: de.apply(p, i, mk, method="encode_passage"),
        mesh, chunk_size=32)
    q_enc = CorpusEncoder(
        lambda p, i, mk: de.apply(p, i, mk, method="encode_query"),
        mesh, chunk_size=32)

    # stage-1 data: "BM25" negatives (lexical neighbors i±1, i±2 share the
    # `body`/`end` frame, like BM25's high-overlap false positives)
    def bm25_dataset(seed):
        gold = type("R", (), {
            "topk_ids": np.stack([
                np.r_[i, (i + 1) % n_corpus, (i + 2) % n_corpus,
                      (i + 5) % n_corpus] for i in range(n_q)]),
            "topk_scores": np.tile(np.linspace(4, 1, 4, dtype=np.float32),
                                   (n_q, 1)),
            "hits": [[j == 0 for j in range(4)] for _ in range(n_q)]})()
        return from_mining_result(corpus_tok, q_tok, gold,
                                  num_negatives=negs, max_joint_length=lj,
                                  sep_id=tok.sep_token_id, seed=seed,
                                  simans_mode=None)

    warm_step = make_biencoder_step(de, tx, mesh, grad_mode="full")
    ce_step = make_reranker_step(ce, tx, mesh, group_size=m)
    ar2_step = make_ar2_retriever_step(de, ce, tx_co, mesh, adv_lambda=0.0)
    co_ce_step = make_reranker_step(ce, tx_co, mesh, group_size=m)

    def de_batches(ctx):
        for b in ctx["dataset"].batches(batch_size=16, with_joint=False):
            yield b

    def joint_batches(ctx):
        for b in ctx["dataset"].batches(batch_size=16):
            yield {"joint_ids": b["joint_ids"], "joint_mask": b["joint_mask"]}

    def full_batches(ctx):
        yield from ctx["dataset"].batches(batch_size=16)

    def rebuild(ctx, res):
        # the --write_hardneg contract: hard negatives come from the mined
        # top-k; also persist the tsv-like artifact the reference writes
        with open(tmp_path / "train_ce_hardneg.tsv", "w") as f:
            for qi in range(len(res.topk_ids)):
                for rank, pid in enumerate(res.topk_ids[qi]):
                    f.write(f"{qi}\t{pid}\t{rank}\n")
        return from_mining_result(corpus_tok, q_tok, res,
                                  num_negatives=negs, max_joint_length=lj,
                                  sep_id=tok.sep_token_id, seed=7,
                                  simans_mode=None)

    def ar2_adapter(state, teachers, dev):
        return ar2_step(state, teachers["ce_state"].params, dev)

    def co_train(ctx):
        # one co-training window: reranker steps then retriever steps
        # (AR2CoTrainer's flag machine, compressed to a single window)
        for i, b in enumerate(joint_batches(ctx)):
            if i >= 4:
                break
            ctx["ce_state"], _ = co_ce_step(
                ctx["ce_state"], shard_batch(b, mesh))
        last = {}
        for i, b in enumerate(full_batches(ctx)):
            if i >= 8:
                break
            dev = shard_batch({k: v for k, v in b.items() if k != "answers"},
                              mesh)
            ctx["de"], last = ar2_adapter(ctx["de"],
                                          {"ce_state": ctx["ce_state"]}, dev)
        return {"loss": float(last.get("loss", float("nan")))}

    ctx = {
        "mesh": mesh, "index": index, "engine": engine,
        "de": TrainState.create(de_params, tx),
        "ce_state": TrainState.create(ce_params, tx),
        "dataset": bm25_dataset(0),
    }
    refresh = lambda name: refresh_stage(
        name,
        lambda c: p_enc(c["de"].params, corpus_tok, corpus_mask),
        lambda c: q_enc(c["de"].params, q_tok, q_mask),
        questions, answers, k=8, build_dataset=rebuild)
    pipe = Pipeline([
        train_stage("bm25_warmup_de", "de", warm_step, de_batches,
                    num_steps=60),
        refresh("write_hardneg"),
        train_stage("hardneg_de_retrain", "de", warm_step, de_batches,
                    num_steps=20),
        train_stage("ce_train", "ce_state", ce_step, joint_batches,
                    num_steps=20,
                    device_batch=lambda b: shard_batch(b, mesh)),
        Stage("co_training", co_train),
        refresh("final_eval"),
    ], ctx=ctx)
    out = pipe.run()
    names = [h["stage"] for h in out["history"]]
    assert names == ["bm25_warmup_de", "write_hardneg", "hardneg_de_retrain",
                     "ce_train", "co_training", "final_eval"]
    assert (tmp_path / "train_ce_hardneg.tsv").exists()
    hard_top1 = out["history"][1]["top1"]
    final_top1 = out["history"][5]["top1"]
    assert hard_top1 > 0.2          # warmup retrieves
    assert final_top1 >= hard_top1 - 0.05   # co-training holds/improves
    assert np.isfinite(out["history"][4]["loss"])


def test_division_stage():
    qrels = {"a": [1], "b": [1]}
    ctx = {"student_rank": {"a": [9, 1], "b": [1, 9]},
           "teacher_rank": {"a": [1, 9], "b": [1, 9]}}
    stage = division_stage("div", "student_rank", "teacher_rank", qrels)
    metrics = stage.run(ctx)
    assert ctx["lwf_qids"] == {"a"} and metrics["selected"] == 1
