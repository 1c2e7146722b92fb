"""The launcher (simxns_tpu.run) runs every published recipe end-to-end.

The reference's equivalent surface is its shell launchers
(``SimANS/train_NQ_AR2.sh``, ``MASTER/finetune/ft_MS_MASTER.sh``,
``PROD/README.md``); here one command covers each (SURVEY.md §1 L0/L1).
"""

import json
import os

import numpy as np
import pytest

from simxns_tpu import run as run_mod


def _ar2_args(tmp_path, recipe, extra=()):
    return ["--recipe", recipe, "--synthetic", "--steps", "12",
            "--batch", "8", "--corpus-size", "64", "--num-queries", "24",
            "--topk", "8", "--output-dir", str(tmp_path), *extra]


def test_ar2_recipe_runs_and_writes_outputs(tmp_path):
    out = run_mod.main(_ar2_args(tmp_path, "nq_ar2_simans"))
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
    """--int8-index + --fast-encode: the production mining stack runs the
    full co-training loop (fused-layer kernel interprets on CPU)."""
    import simxns_tpu.ops.fused_layer as fl

    old = fl.INTERPRET
    fl.INTERPRET = True
    try:
        out = run_mod.main(_ar2_args(
            tmp_path, "nq_ar2_simans",
            extra=("--int8-index", "--fast-encode")))
    finally:
        fl.INTERPRET = old
    assert np.isfinite(out["top1"]) and 0.0 <= out["top1"] <= 1.0
