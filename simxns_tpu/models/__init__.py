from simxns_tpu.models.bert import BertConfig, BertEncoder, EncoderOutput
from simxns_tpu.models.dual_encoder import BiEncoder, BiEncoderConfig
from simxns_tpu.models.cross_encoder import CrossEncoder, CrossEncoderConfig
from simxns_tpu.models.colbert import ColBERT, ColBERTConfig
from simxns_tpu.models.condenser import (
    Condenser, CondenserConfig, cocondenser_span_loss, mlm_loss_from_logits)
from simxns_tpu.models.seq2seq import (
    Seq2Seq, Seq2SeqConfig, generate as seq2seq_generate, queries_to_tsv,
    seq2seq_lm_loss)
from simxns_tpu.models.reader import Reader, ReaderConfig, reader_loss
from simxns_tpu.models.t5 import (
    T5, T5Config, doc2query_tsv, generate as t5_generate)
from simxns_tpu.models.hf_import import (
    as_biencoder_params, convert_hf_auto, convert_hf_bert,
    convert_hf_distilbert, convert_hf_electra, convert_hf_roberta,
    convert_hf_t5, load_hf_bert_encoder, robertadot_projection,
    sniff_hf_family, t5_config_from_state_dict)

__all__ = [
    "BertConfig",
    "BertEncoder",
    "EncoderOutput",
    "BiEncoder",
    "BiEncoderConfig",
    "CrossEncoder",
    "CrossEncoderConfig",
    "ColBERT",
    "ColBERTConfig",
    "Condenser",
    "CondenserConfig",
    "cocondenser_span_loss",
    "Seq2Seq", "Seq2SeqConfig", "seq2seq_generate", "queries_to_tsv",
    "seq2seq_lm_loss",
    "mlm_loss_from_logits",
    "Reader",
    "ReaderConfig",
    "reader_loss",
    "T5", "T5Config", "doc2query_tsv", "t5_generate",
    "convert_hf_auto",
    "convert_hf_bert",
    "convert_hf_t5",
    "t5_config_from_state_dict",
    "convert_hf_distilbert",
    "convert_hf_electra",
    "convert_hf_roberta",
    "load_hf_bert_encoder",
    "robertadot_projection",
    "sniff_hf_family",
    "as_biencoder_params",
]
