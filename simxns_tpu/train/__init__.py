from simxns_tpu.train.state import TrainState
from simxns_tpu.train.optim import make_adamw, linear_warmup_schedule, make_lamb
from simxns_tpu.train.steps import (
    make_biencoder_step, make_reranker_step, make_ar2_retriever_step,
    make_colbert_step)
from simxns_tpu.train.driver import AR2Config, AR2CoTrainer
from simxns_tpu.train.kd import make_kd_step, make_ce_kd_step, soft_kd_loss
from simxns_tpu.train.lead import LeadConfig, make_lead_step
from simxns_tpu.train.pretrain import make_condenser_step, make_electra_step
from simxns_tpu.train.pipeline import (
    Pipeline, Stage, train_stage, refresh_stage, division_stage)
from simxns_tpu.train.steps import with_grad_accum

__all__ = [
    "TrainState", "make_adamw", "linear_warmup_schedule", "make_lamb",
    "make_biencoder_step", "make_reranker_step", "make_ar2_retriever_step",
    "make_colbert_step",
    "AR2Config", "AR2CoTrainer", "make_kd_step", "make_ce_kd_step", "soft_kd_loss",
    "LeadConfig", "make_lead_step", "make_condenser_step",
    "make_electra_step",
    "Pipeline", "Stage", "train_stage", "refresh_stage", "division_stage",
    "with_grad_accum",
]
