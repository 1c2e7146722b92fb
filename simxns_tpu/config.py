"""One typed config tree shared by every phase.

The reference duplicates 60-80 argparse flags per entry script with
hyperparameters hard-coded in shell launchers (SURVEY.md §5.6). Here the
whole experiment is one dataclass tree, and :data:`RECIPES` records the
published launcher settings so runs are reproducible from a name:

- ``nq_ar2_simans``   — ``SimANS/train_NQ_AR2.sh:19-33`` (ERNIE-base DE +
  ERNIE-large CE, 8x8 batch, lr 1e-5 / 1e-6, 15 SimANS negatives,
  iteration 2000/500, adv_lambda 0, b=1.0)
- ``marco_ar2_simans``— ``SimANS/train_MS_Pas_AR2.sh`` (abs-mode sampler,
  tau=3)
- ``master_ms_ft``    — ``MASTER/finetune/ft_MS_MASTER.sh:10-22`` (BM25-neg
  warmup, lr 5e-6, 31 negatives)
- ``prod_kd_marco``   — ``PROD/README.md`` progressive pipeline defaults
- ``master_pretrain`` — ``MASTER/pretrain`` defaults (enc mask 0.30,
  dec mask 0.50, 2-layer heads)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from simxns_tpu.models.bert import BertConfig


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-5
    warmup_steps: int = 0
    total_steps: int = 30_000
    weight_decay: float = 0.01
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    optimizer: str = "adamw"            # "adamw" | "lamb"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_path: str = ""
    dev_path: str = ""
    passage_path: str = ""
    qa_paths: tuple = ()
    max_q_length: int = 32
    max_ctx_length: int = 128
    max_joint_length: int = 160
    num_negatives: int = 15
    # SimANS sampler (mode None -> plain neg_type selection)
    simans_mode: Optional[str] = "quadratic"
    simans_a: float = 0.5
    simans_b: float = 0.0
    simans_tau: float = 3.0
    neg_type: str = "random"


@dataclasses.dataclass(frozen=True)
class RetrieverConfig:
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    share_weight: bool = False
    pooling: str = "cls"
    projection_dim: Optional[int] = None
    score_scale: float = 1.0            # 20.0 for the _daya variant


@dataclasses.dataclass(frozen=True)
class RerankerConfig:
    bert: BertConfig = dataclasses.field(default_factory=lambda: BertConfig(
        num_layers=24, hidden_size=1024, num_heads=16,
        intermediate_size=4096))        # ERNIE-large shape
    binary_head: bool = False
    per_layer_logits: bool = False


@dataclasses.dataclass(frozen=True)
class AR2RecipeConfig:
    """One AR2+SimANS co-training run (train + mine phases)."""
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    retriever: RetrieverConfig = dataclasses.field(
        default_factory=RetrieverConfig)
    reranker: RerankerConfig = dataclasses.field(
        default_factory=RerankerConfig)
    retriever_optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(learning_rate=1e-5,
                                            warmup_steps=2000))
    reranker_optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(learning_rate=1e-6,
                                            warmup_steps=2000))
    global_batch: int = 64               # 8 GPUs x 8 per device
    iteration_step: int = 2000
    iteration_reranker_step: int = 500
    max_steps: int = 30_000
    topk: int = 100
    temperature_normal: float = 1.0
    adv_lambda: float = 0.0              # launcher uses 0 w/ --normal_loss
    scale_simmila: bool = False


@dataclasses.dataclass(frozen=True)
class KDRecipeConfig:
    """PROD progressive distillation stage."""
    data: DataConfig = dataclasses.field(default_factory=lambda: DataConfig(
        simans_mode=None, num_negatives=15, max_joint_length=160))
    student: RetrieverConfig = dataclasses.field(
        default_factory=lambda: RetrieverConfig(
            bert=BertConfig(num_layers=6)))
    optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(learning_rate=2e-5,
                                            warmup_steps=2000))
    teacher_type: str = "cross_encoder"
    kd_type: str = "KD_softmax"
    temperature: float = 1.0
    ce_weight: float = 0.0
    kd_weight: float = 1.0
    lwf_weight: float = 0.0
    dkd_alpha: float = 1.0
    dkd_beta: float = 1.0
    global_batch: int = 64
    max_steps: int = 40_000


@dataclasses.dataclass(frozen=True)
class MasterPretrainConfig:
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    n_head_layers: int = 2
    mlm_probability: float = 0.30
    decoder_mlm_probability: float = 0.50
    max_seq_length: int = 128
    optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(learning_rate=1e-4,
                                            warmup_steps=4000,
                                            total_steps=80_000))
    global_batch: int = 512


def _base_bert() -> BertConfig:
    return BertConfig()          # BERT/ERNIE-base shape


RECIPES = {
    "nq_ar2_simans": AR2RecipeConfig(
        data=DataConfig(num_negatives=15, simans_mode="quadratic",
                        simans_a=0.5, simans_b=1.0, max_ctx_length=128),
        adv_lambda=0.0, temperature_normal=1.0),
    "marco_ar2_simans": AR2RecipeConfig(
        data=DataConfig(num_negatives=15, simans_mode="abs", simans_tau=3.0,
                        max_ctx_length=128, max_joint_length=160),
        retriever_optim=OptimConfig(learning_rate=5e-6, warmup_steps=2000),
        reranker_optim=OptimConfig(learning_rate=1e-6, warmup_steps=2000)),
    "master_ms_ft": AR2RecipeConfig(
        data=DataConfig(num_negatives=31, simans_mode=None,
                        max_ctx_length=128),
        retriever_optim=OptimConfig(learning_rate=5e-6, warmup_steps=1000,
                                    total_steps=30_000),
        max_steps=30_000),
    "prod_kd_marco": KDRecipeConfig(),
    "master_pretrain": MasterPretrainConfig(),
}
