from simxns_tpu.allies.beam import (
    ALLIESConfig, BeamNode, LLMClient, allies_answer)
from simxns_tpu.allies.qa_metrics import exact_match, f1_score, rouge_l

__all__ = ["ALLIESConfig", "BeamNode", "LLMClient", "allies_answer",
           "exact_match", "f1_score", "rouge_l"]
