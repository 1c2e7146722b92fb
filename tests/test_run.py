"""The launcher (simxns_tpu.run) runs every published recipe end-to-end.

The reference's equivalent surface is its shell launchers
(``SimANS/train_NQ_AR2.sh``, ``MASTER/finetune/ft_MS_MASTER.sh``,
``PROD/README.md``); here one command covers each (SURVEY.md §1 L0/L1).
"""

import json
import os

import numpy as np
import pytest

# whole-module: multi-minute trainer e2e runs
pytestmark = pytest.mark.slow

from simxns_tpu import run as run_mod


def _ar2_args(tmp_path, recipe, extra=()):
    return ["--recipe", recipe, "--synthetic", "--steps", "12",
            "--batch", "8", "--corpus-size", "64", "--num-queries", "24",
            "--topk", "8", "--output-dir", str(tmp_path), *extra]


def test_ar2_recipe_runs_and_writes_outputs(tmp_path):
    # --lr on a tiny run once crashed (ce_lr None * 0.1); keep it covered
    out = run_mod.main(_ar2_args(tmp_path, "nq_ar2_simans",
                                 extra=("--lr", "2e-3")))
    assert out["recipe"] == "nq_ar2_simans"
    assert np.isfinite(out["top1"]) and np.isfinite(out["mrr10"])
    assert 0.0 <= out["top1"] <= 1.0
    with open(os.path.join(tmp_path, "eval.json")) as f:
        assert json.load(f)["steps"] == 12
    assert os.path.exists(os.path.join(tmp_path, "metrics.jsonl"))
    # checkpoints for both co-trained models
    names = os.listdir(tmp_path)
    assert any(n.startswith("retriever-") for n in names)
    assert any(n.startswith("reranker-") for n in names)


def test_marco_recipe_uses_abs_sampler(tmp_path):
    out = run_mod.main(_ar2_args(tmp_path, "marco_ar2_simans"))
    assert np.isfinite(out["top1"])


def test_kd_recipe_trains_student(tmp_path):
    out = run_mod.main([
        "--recipe", "prod_kd_marco", "--synthetic", "--steps", "8",
        "--batch", "8", "--corpus-size", "48", "--num-queries", "16",
        "--output-dir", str(tmp_path)])
    assert out["steps"] == 8
    assert np.isfinite(out["final_loss"])
    assert any(n.startswith("student-") for n in os.listdir(tmp_path))


@pytest.mark.parametrize("recipe", ["prod_kd_nq", "prod_kd_marcodoc"])
def test_kd_recipe_matrix(tmp_path, recipe):
    """The PROD launcher matrix (run_progressive_distill_{nq,marcodoc}.py)
    is runnable --synthetic; marcodoc's wider doc/joint shapes flow
    through the collation (ctx 256 -> joint capped by query+ctx+1)."""
    from simxns_tpu.config import RECIPES

    out = run_mod.main([
        "--recipe", recipe, "--synthetic", "--steps", "8",
        "--batch", "8", "--corpus-size", "48", "--num-queries", "16",
        "--output-dir", str(tmp_path)])
    assert out["steps"] == 8
    assert np.isfinite(out["final_loss"])
    assert any(n.startswith("student-") for n in os.listdir(tmp_path))
    cfg = RECIPES[recipe]
    assert (cfg.data.max_ctx_length, cfg.data.max_joint_length) == (
        (128, 160) if recipe == "prod_kd_nq" else (256, 288))


def test_pretrain_recipe_exports_encoder(tmp_path):
    out = run_mod.main([
        "--recipe", "master_pretrain", "--synthetic", "--steps", "4",
        "--batch", "8", "--output-dir", str(tmp_path)])
    assert np.isfinite(out["final_loss"])
    assert any(n.startswith("encoder-") for n in os.listdir(tmp_path))


def test_unknown_recipe_rejected():
    with pytest.raises(SystemExit):
        run_mod.build_parser().parse_args(["--recipe", "nope"])


def test_ar2_int8_index_and_fast_encode(tmp_path):
    """--int8-index + --fast-encode + --fast-teacher: the production
    stack (quantized mining AND quantized frozen-teacher forwards) runs
    the full co-training loop (fused-layer kernel interprets on CPU)."""
    import simxns_tpu.ops.fused_layer as fl

    old = fl.INTERPRET
    fl.INTERPRET = True
    try:
        out = run_mod.main(_ar2_args(
            tmp_path, "nq_ar2_simans",
            extra=("--int8-index", "--fast-encode", "--fast-teacher")))
    finally:
        fl.INTERPRET = old
    assert np.isfinite(out["top1"]) and 0.0 <= out["top1"] <= 1.0


def _prepare_data(argv):
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "prepare_data", os.path.join(repo, "scripts", "prepare_data.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(argv)


def _write_tiny_real_data(tmp_path, n=48, q=16):
    """A tiny psgs_w100-style text corpus + qa csv, packed via prepare_data
    (the real-data CLI path, VERDICT r2 weak #3)."""
    tsv = tmp_path / "psgs.tsv"
    with open(tsv, "w", encoding="utf-8") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(n):
            f.write(f"{i + 1}\tdocument {i} mentions fact{i} and "
                    f"topic{i % 7}\ttitle{i}\n")
    qa = tmp_path / "q.qa.csv"
    with open(qa, "w", encoding="utf-8") as f:
        for i in range(q):
            f.write(f"document {i} fact{i}\t['fact{i}']\n")
    corpus_npz = str(tmp_path / "corpus.npz")
    queries_npz = str(tmp_path / "queries.npz")
    _prepare_data(["corpus", "--passages", str(tsv), "--out", corpus_npz,
                   "--max-length", "32"])
    _prepare_data(["queries", "--qa", str(qa), "--out", queries_npz,
                   "--max-length", "16"])
    return str(tsv), corpus_npz, queries_npz


def test_real_data_path_labels_hits_by_text(tmp_path):
    """--corpus/--queries + --passages-tsv: has_answer fires on the real
    passage text, so mining produces usable positives (nonzero hits)."""
    tsv, corpus_npz, queries_npz = _write_tiny_real_data(tmp_path)
    out = run_mod.main([
        "--recipe", "nq_ar2_simans", "--tiny-models",
        "--corpus", corpus_npz, "--queries", queries_npz,
        "--passages-tsv", tsv,
        "--steps", "8", "--batch", "8", "--topk", "8",
        "--output-dir", str(tmp_path / "run")])
    assert out["top1"] > 0.0          # labels are real -> recall nonzero


def test_real_data_path_labels_hits_by_qrels(tmp_path):
    """--qrels: hits labeled by gold ids (the MARCO contract) with NO
    passage text at all."""
    _, corpus_npz, queries_npz = _write_tiny_real_data(tmp_path)
    qrels = tmp_path / "qrels.tsv"
    with open(qrels, "w", encoding="utf-8") as f:
        for i in range(16):
            f.write(f"{i}\t{i}\n")    # qid i -> pid i (npz pids are id-1)
    out = run_mod.main([
        "--recipe", "marco_ar2_simans", "--tiny-models",
        "--corpus", corpus_npz, "--queries", queries_npz,
        "--qrels", str(qrels),
        "--steps", "8", "--batch", "8", "--topk", "8",
        "--output-dir", str(tmp_path / "run")])
    assert out["top1"] > 0.0


def test_lead_recipe_runs_joint_distillation(tmp_path):
    """BASELINE.json config 4 from one command (VERDICT r2 missing #1)."""
    out = run_mod.main([
        "--recipe", "lead_ms_distill", "--synthetic", "--steps", "8",
        "--batch", "8", "--corpus-size", "48", "--num-queries", "16",
        "--output-dir", str(tmp_path)])
    assert np.isfinite(out["final_loss"])
    assert 0.0 <= out["top1"] <= 1.0
    names = os.listdir(tmp_path)
    assert any(n.startswith("student-") for n in names)
    assert any(n.startswith("teacher_ce-") for n in names)


def test_tq_and_msdoc_recipes_run(tmp_path):
    """The SimANS launcher matrix is complete: TQ + MS-Doc
    (VERDICT r2 missing #2)."""
    out = run_mod.main(_ar2_args(tmp_path, "tq_ar2_simans"))
    assert np.isfinite(out["top1"])
    out = run_mod.main(_ar2_args(tmp_path, "msdoc_ar2_simans"))
    assert np.isfinite(out["top1"])


def test_capstone_recipe_curriculum(tmp_path):
    out = run_mod.main([
        "--recipe", "capstone_curriculum", "--synthetic", "--steps", "12",
        "--batch", "8", "--corpus-size", "48", "--num-queries", "16",
        "--output-dir", str(tmp_path)])
    assert np.isfinite(out["final_loss"])
    assert any(n.startswith("retriever-") for n in os.listdir(tmp_path))
    # curriculum metrics logged with bucket index
    with open(os.path.join(tmp_path, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert any(r.get("phase") == "curriculum" for r in recs)


def test_capstone_consumes_seq2seq_tsv(tmp_path):
    """End-to-end doc2query contract: queries_to_tsv output feeds
    --query-tsv (CAPSTONE generate_query.sh -> run_de_model path)."""
    tsv = tmp_path / "doc2query.tsv"
    with open(tsv, "w", encoding="utf-8") as f:
        for i in range(48):
            f.write(f"{i}\tdocument {i} fact{i}\tnoise {i}\n")
    out = run_mod.main([
        "--recipe", "capstone_curriculum", "--synthetic", "--steps", "8",
        "--batch", "8", "--corpus-size", "48", "--num-queries", "16",
        "--query-tsv", str(tsv)])
    assert np.isfinite(out["final_loss"])


def test_msdoc_init_checkpoint_roberta(tmp_path):
    """--init-checkpoint with a RoBERTa artifact warm-starts the MS-Doc
    retriever (the RobertaDot contract, SimANS/model/models.py:340-359):
    the run adopts roberta position semantics and trains to completion."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = transformers.RobertaConfig(
        vocab_size=2048, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=80, type_vocab_size=1, pad_token_id=1)
    torch.manual_seed(0)
    model = transformers.RobertaModel(cfg, add_pooling_layer=False)
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(model.state_dict(), str(ckpt))
    out = run_mod.main(_ar2_args(
        tmp_path / "run", "msdoc_ar2_simans",
        extra=("--init-checkpoint", str(ckpt))))
    assert np.isfinite(out["top1"]) and 0.0 <= out["top1"] <= 1.0


def test_lead_init_checkpoint_distilbert(tmp_path):
    """--init-checkpoint with a DistilBERT artifact warm-starts (and
    truncates) the LEAD student (LEAD/modeling_distilbert.py)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = transformers.DistilBertConfig(
        vocab_size=2048, dim=64, n_layers=4, n_heads=4, hidden_dim=128,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(0)
    model = transformers.DistilBertModel(cfg)
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(model.state_dict(), str(ckpt))
    out = run_mod.main([
        "--recipe", "lead_ms_distill", "--synthetic", "--steps", "8",
        "--batch", "8", "--corpus-size", "48", "--num-queries", "16",
        "--init-checkpoint", str(ckpt),
        "--output-dir", str(tmp_path / "run")])
    assert np.isfinite(out["final_loss"])


def test_lead_frozen_teacher_int8_view(tmp_path):
    """--freeze-teachers + --fast-teacher: the frozen CE teacher's joint
    forwards run through the fused-int8 view (interpreted on CPU) while
    only the student trains (LEAD/run_LEAD.py:65-73 frozen-model config)."""
    import simxns_tpu.ops.fused_layer as fl

    old = fl.INTERPRET
    fl.INTERPRET = True
    try:
        out = run_mod.main([
            "--recipe", "lead_ms_distill", "--synthetic", "--steps", "8",
            "--batch", "8", "--corpus-size", "48", "--num-queries", "16",
            "--freeze-teachers", "--fast-teacher",
            "--output-dir", str(tmp_path)])
    finally:
        fl.INTERPRET = old
    assert np.isfinite(out["final_loss"])
    assert 0.0 <= out["top1"] <= 1.0


def test_ar2_resume_matches_uninterrupted(tmp_path, monkeypatch):
    """Kill/relaunch equivalence (VERDICT r3 #3): a run that dies right
    after a window-boundary checkpoint, relaunched with the same command,
    must land on the same final eval as an uninterrupted run. The resume
    scan is the reference's outer-loop contract
    (``co_training_wiki_train.py:138-147``,
    ``run_progressive_distill_marco.py:167-180``)."""
    from simxns_tpu.train import driver as driver_mod

    def argv(d):
        return ["--recipe", "nq_ar2_simans", "--synthetic", "--steps", "12",
                "--batch", "8", "--corpus-size", "64", "--num-queries",
                "24", "--topk", "8", "--seed", "0", "--output-dir", str(d)]

    full = run_mod.main(argv(tmp_path / "full"))

    real_run = driver_mod.AR2CoTrainer.run
    mode = {"die": True}

    def dying_run(self, num_steps=None):
        if mode["die"]:
            # run exactly one window (iteration = 6 at these shapes): the
            # boundary checkpoint at step 6 lands, then the process "dies"
            real_run(self, num_steps=6)
            raise KeyboardInterrupt("simulated crash")
        return real_run(self, num_steps)

    monkeypatch.setattr(driver_mod.AR2CoTrainer, "run", dying_run)
    with pytest.raises(KeyboardInterrupt):
        run_mod.main(argv(tmp_path / "resumed"))
    assert any(n.startswith("retriever_state-")
               for n in os.listdir(tmp_path / "resumed"))

    mode["die"] = False
    resumed = run_mod.main(argv(tmp_path / "resumed"))
    assert resumed["top1"] == pytest.approx(full["top1"])
    assert resumed["mrr10"] == pytest.approx(full["mrr10"], abs=1e-6)
    with open(os.path.join(tmp_path / "resumed", "eval.json")) as f:
        assert json.load(f)["steps"] == 12


def test_ar2_resume_never_flag(tmp_path):
    """--resume never ignores saved states (fresh warmup both times)."""
    argv = _ar2_args(tmp_path, "nq_ar2_simans") + ["--resume", "never"]
    run_mod.main(argv)
    out = run_mod.main(argv)           # re-runs from scratch, no restore
    assert np.isfinite(out["top1"])


def test_kd_resume_continues_step_count(tmp_path):
    base = ["--recipe", "prod_kd_marco", "--synthetic", "--batch", "8",
            "--corpus-size", "48", "--num-queries", "16",
            "--output-dir", str(tmp_path)]
    run_mod.main(base + ["--steps", "8"])
    assert any(n.startswith("student_state-")
               for n in os.listdir(tmp_path))
    out = run_mod.main(base + ["--steps", "12"])
    assert out["steps"] == 12          # resumed at 8, ran 4 more
    assert np.isfinite(out["final_loss"])


def test_pretrain_resume_continues(tmp_path):
    base = ["--recipe", "master_pretrain", "--synthetic", "--batch", "8",
            "--output-dir", str(tmp_path)]
    run_mod.main(base + ["--steps", "4"])
    assert any(n.startswith("pretrain_state-")
               for n in os.listdir(tmp_path))
    out = run_mod.main(base + ["--steps", "6"])
    assert np.isfinite(out["final_loss"])


def test_lead_resume_continues(tmp_path):
    base = ["--recipe", "lead_ms_distill", "--synthetic", "--batch", "8",
            "--corpus-size", "48", "--num-queries", "16",
            "--output-dir", str(tmp_path)]
    run_mod.main(base + ["--steps", "12"])   # redraw+save at step 10
    assert any(n.startswith("lead_db_state-")
               for n in os.listdir(tmp_path))
    out = run_mod.main(base + ["--steps", "14"])
    assert out["steps"] == 14
    assert np.isfinite(out["final_loss"])


def test_allies_recipe_answers_questions(tmp_path):
    out = run_mod.main([
        "--recipe", "allies_qa", "--synthetic", "--steps", "6",
        "--corpus-size", "48", "--num-queries", "16",
        "--output-dir", str(tmp_path)])
    assert out["em"] > 0.5            # scripted LLM + trained retriever
    assert out["retrievals_per_q"] >= 1
    with open(os.path.join(tmp_path, "eval.json")) as f:
        assert "f1" in json.load(f)


def test_ar2_offload_mine_matches_default(tmp_path):
    """--offload-mine on/overlap (reranker state round-trips through host
    RAM at every mine — synchronously or on a worker thread under the
    index build) must be bit-identical to the default in-HBM run: the
    stash is a pure data movement (parallel/offload.HostStash), exercised
    here through all three sites (post-warmup, in-window refresh, final)
    plus the overlap mode's stash->checkpoint-writer handoff."""
    out_a = run_mod.main(_ar2_args(tmp_path / "a", "nq_ar2_simans",
                                   extra=("--offload-mine", "off")))
    out_b = run_mod.main(_ar2_args(tmp_path / "b", "nq_ar2_simans",
                                   extra=("--offload-mine", "on")))
    out_c = run_mod.main(_ar2_args(tmp_path / "c", "nq_ar2_simans",
                                   extra=("--offload-mine", "overlap")))
    assert out_a["top1"] == out_b["top1"] == out_c["top1"]
    assert (out_a["history_top1"] == out_b["history_top1"]
            == out_c["history_top1"])
    # the overlap boundary checkpoints must be complete + resumable
    # (reranker_state comes via the stash handoff, not a device pull)
    steps = {int(n.split("-")[-1])
             for n in os.listdir(tmp_path / "c")
             if n.startswith("reranker_state-")}
    assert steps == {int(n.split("-")[-1])
                     for n in os.listdir(tmp_path / "b")
                     if n.startswith("reranker_state-")} != set()


def test_ar2_stream_build_matches_host_build(tmp_path):
    """--stream-build on (the default) vs off: the device-side
    encode->quantize->scatter index build must reproduce the host
    round-trip build's mining trajectory exactly."""
    out_a = run_mod.main(_ar2_args(tmp_path / "a", "nq_ar2_simans",
                                   extra=("--stream-build", "off")))
    out_b = run_mod.main(_ar2_args(tmp_path / "b", "nq_ar2_simans",
                                   extra=("--stream-build", "on")))
    assert out_a["top1"] == out_b["top1"]
    assert out_a["history_top1"] == out_b["history_top1"]
