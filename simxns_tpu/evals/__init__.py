from simxns_tpu.evals.metrics import (
    mrr_n, map_n, dcg_n, ndcg_n, p_n, get_metrics,
    top_k_hits_accuracy, marco_mrr_at_k, marco_recall_at_k, trec_ndcg_at_k,
    trec_map_at_k, trec_recip_rank, trec_recall_at_k, trec_eval_all,
    write_eval_result,
)
from simxns_tpu.evals.qa_match import SimpleTokenizer, has_answer, check_answer
from simxns_tpu.evals.rerank import build_joint_inputs, rerank_topk

__all__ = [
    "mrr_n", "map_n", "dcg_n", "ndcg_n", "p_n", "get_metrics",
    "top_k_hits_accuracy", "marco_mrr_at_k", "marco_recall_at_k",
    "trec_ndcg_at_k", "trec_map_at_k", "trec_recip_rank", "trec_recall_at_k",
    "trec_eval_all", "SimpleTokenizer", "has_answer", "check_answer",
    "build_joint_inputs", "rerank_topk", "write_eval_result",
]
