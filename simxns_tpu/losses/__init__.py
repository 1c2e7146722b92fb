from simxns_tpu.losses.contrastive import (
    in_batch_nll,
    grouped_nll,
    similarity_scores,
)

__all__ = ["in_batch_nll", "grouped_nll", "similarity_scores"]
