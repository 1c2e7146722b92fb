from simxns_tpu.data.sampling import (
    simans_weights, sample_hard_negatives, select_negatives)
from simxns_tpu.data.tokenization import HashTokenizer, load_hf_tokenizer
from simxns_tpu.data.star_bpe import StarRobertaTokenizer, load_star_tokenizer
from simxns_tpu.data.datasets import (
    RetrievalExample, RetrievalDataset, RetrievalCollator,
    load_wiki_json, load_marco_tsv, load_qa_csv, load_passages_tsv)
from simxns_tpu.data.division import (
    divide_data, teacher_better_qids, first_relevant_rank)
from simxns_tpu.data.collator import CondenserCollator, TokenMeta
from simxns_tpu.data.mined import MinedDataset, from_mining_result
from simxns_tpu.data.datasets import load_qrels, load_trec_qrels

__all__ = [
    "simans_weights", "sample_hard_negatives", "select_negatives",
    "HashTokenizer", "load_hf_tokenizer",
    "StarRobertaTokenizer", "load_star_tokenizer",
    "RetrievalExample", "RetrievalDataset", "RetrievalCollator",
    "load_wiki_json", "load_marco_tsv", "load_qa_csv", "load_passages_tsv",
    "divide_data", "teacher_better_qids", "first_relevant_rank",
    "CondenserCollator", "TokenMeta", "MinedDataset", "from_mining_result", "load_qrels", "load_trec_qrels",
]
