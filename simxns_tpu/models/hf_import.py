"""HF checkpoint import: BERT, RoBERTa, ELECTRA, DistilBERT.

The reference initializes every model from HF checkpoints — BERT/ERNIE-2.0
(both use the BERT state_dict layout; PROD student init,
``PROD/ProD_KD/model/models.py:33-41``), RoBERTa (``RobertaDot``, the whole
MS-Doc path, ``SimANS/model/models.py:340-359``), ELECTRA (the MASTER CE,
``MASTER/finetune/model/models_ele.py``), and DistilBERT (the LEAD student,
``LEAD/modeling_distilbert.py``). These converters turn the PyTorch
``state_dict`` of each family into the
:class:`simxns_tpu.models.bert.BertEncoder` parameter tree so those
artifacts load directly (torch-cpu is only needed at conversion time).

Covers: embeddings (+LayerNorm, +ELECTRA's ``embeddings_project``), all
transformer layers, and the MLM head (``cls.predictions.*`` -> ``mlm/*``
with the tied-decoder bias). The HF pooler head is ignored — the reference
never uses it for retrieval (``SimANS/model/models.py:80-82`` takes
``seq[:, 0]``). Use the matching :class:`BertConfig` knobs with each
family: RoBERTa needs ``position_style="roberta", pad_token_id=1``;
DistilBERT needs ``type_vocab_size=0``; ELECTRA-small needs
``embedding_size``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _np(tensor) -> np.ndarray:
    try:
        return tensor.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(tensor)


def convert_hf_bert(
    state_dict: Dict[str, "object"],
    num_layers: Optional[int] = None,
    prefix: str = "",
) -> Tuple[dict, Optional[dict]]:
    """HF state_dict -> (encoder_params, mlm_params or None).

    ``num_layers`` truncates depth (the PROD student init). ``prefix`` strips
    a leading module path (e.g. ``"bert."`` inside ``BertForMaskedLM``).
    Dense kernels are transposed torch [out,in] -> flax [in,out].
    """
    def _modern(k: str) -> str:
        # original-format BERT checkpoints name LayerNorm params
        # gamma/beta (the remap transformers itself carries)
        if k.endswith(".gamma"):
            return k[: -len(".gamma")] + ".weight"
        if k.endswith(".beta"):
            return k[: -len(".beta")] + ".bias"
        return k

    sd = {_modern(k[len(prefix):]): v for k, v in state_dict.items()
          if k.startswith(prefix)}
    # BertForMaskedLM nests the encoder under "bert." — strip it for the
    # encoder tree but keep `sd` whole so the cls.predictions.* MLM head
    # below survives an explicit prefix="" (with prefix="bert." the head
    # keys are outside the prefix: fall back to the unstripped dict)
    if any(k.startswith("bert.") for k in sd) and prefix == "":
        enc_sd = {k[5:]: v for k, v in sd.items() if k.startswith("bert.")}
    else:
        enc_sd = sd
    if prefix and any(k.startswith("cls.predictions.")
                      for k in state_dict):
        # the MLM head lives OUTSIDE the stripped prefix — recover it
        sd = {**sd, **{_modern(k): v for k, v in state_dict.items()
                       if k.startswith("cls.predictions.")}}

    def dense(name):
        return {"kernel": _np(enc_sd[f"{name}.weight"]).T,
                "bias": _np(enc_sd[f"{name}.bias"])}

    def layer_norm(name):
        return {"scale": _np(enc_sd[f"{name}.weight"]),
                "bias": _np(enc_sd[f"{name}.bias"])}

    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": _np(enc_sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {
                "embedding": _np(enc_sd["embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {
                "embedding": _np(enc_sd["embeddings.token_type_embeddings.weight"])},
            "layer_norm": layer_norm("embeddings.LayerNorm"),
        }
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in enc_sd:
        if num_layers is not None and i >= num_layers:
            break
        base = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{base}.attention.self.query"),
                "key": dense(f"{base}.attention.self.key"),
                "value": dense(f"{base}.attention.self.value"),
                "output": dense(f"{base}.attention.output.dense"),
                "output_layer_norm": layer_norm(
                    f"{base}.attention.output.LayerNorm"),
            },
            "intermediate": dense(f"{base}.intermediate.dense"),
            "output": dense(f"{base}.output.dense"),
            "output_layer_norm": layer_norm(f"{base}.output.LayerNorm"),
        }
        i += 1

    mlm = None
    if "cls.predictions.transform.dense.weight" in sd:
        mlm = {
            "transform": {
                "kernel": _np(sd["cls.predictions.transform.dense.weight"]).T,
                "bias": _np(sd["cls.predictions.transform.dense.bias"])},
            "transform_layer_norm": {
                "scale": _np(sd["cls.predictions.transform.LayerNorm.weight"]),
                "bias": _np(sd["cls.predictions.transform.LayerNorm.bias"])},
            "bias": _np(sd["cls.predictions.bias"]),
        }
    return params, mlm


def convert_hf_roberta(
    state_dict: Dict[str, "object"],
    num_layers: Optional[int] = None,
) -> Tuple[dict, Optional[dict]]:
    """HF ``RobertaModel``/``RobertaForMaskedLM`` state_dict -> params.

    RoBERTa's encoder layout is byte-identical to BERT's after stripping the
    ``roberta.`` prefix; only the MLM head differs (``lm_head.*`` flat keys
    instead of ``cls.predictions.*``). Pair with
    ``BertConfig(position_style="roberta", pad_token_id=1,
    type_vocab_size=1)`` — HF RoBERTa derives position ids from non-pad
    tokens with a pad offset. This is the ``RobertaDot`` warm start
    (``SimANS/model/models.py:340-359``; MS-Doc,
    ``SimANS/Doc_training/co_training_doc_train.py``).
    """
    sd = {k: v for k, v in state_dict.items()}
    if any(k.startswith("roberta.") for k in sd):
        sd = {k[len("roberta."):] if k.startswith("roberta.") else k: v
              for k, v in sd.items()}
    params, _ = convert_hf_bert(sd, num_layers=num_layers)
    mlm = None
    if "lm_head.dense.weight" in sd:
        mlm = {
            "transform": {
                "kernel": _np(sd["lm_head.dense.weight"]).T,
                "bias": _np(sd["lm_head.dense.bias"])},
            "transform_layer_norm": {
                "scale": _np(sd["lm_head.layer_norm.weight"]),
                "bias": _np(sd["lm_head.layer_norm.bias"])},
            "bias": _np(sd["lm_head.bias"]),
        }
    return params, mlm


def robertadot_projection(state_dict: Dict[str, "object"]) -> Optional[dict]:
    """``RobertaDot``'s CLS projection head -> BiEncoder tower params.

    The reference's checkpoint carries ``embeddingHead`` (Linear H->out) +
    ``norm`` (LayerNorm) applied to the CLS vector
    (``SimANS/model/models.py:340-359``); our tower declares the same pair
    as ``project``/``project_layer_norm`` (``BiEncoderConfig.projection_dim``).
    Returns None when the checkpoint has no head (plain RobertaModel).
    """
    if "embeddingHead.weight" not in state_dict:
        return None
    return {
        "project": {"kernel": _np(state_dict["embeddingHead.weight"]).T,
                    "bias": _np(state_dict["embeddingHead.bias"])},
        "project_layer_norm": {"scale": _np(state_dict["norm.weight"]),
                               "bias": _np(state_dict["norm.bias"])},
    }


def convert_hf_electra(
    state_dict: Dict[str, "object"],
    num_layers: Optional[int] = None,
) -> Tuple[dict, Optional[dict]]:
    """HF ``ElectraModel`` (discriminator) state_dict -> encoder params.

    ELECTRA's transformer stack is BERT-layout under the ``electra.``
    prefix; small variants factorize embeddings to ``embedding_size`` and
    project to ``hidden_size`` via ``embeddings_project`` (kept under our
    ``embeddings/embeddings_project``). The discriminator/generator heads
    are dropped — the reference uses ELECTRA as a plain encoder for its CE
    reranker (``MASTER/finetune/model/models_ele.py``). Pair with
    ``BertConfig(embedding_size=...)`` when the checkpoint carries the
    projection. No MLM head (ELECTRA has none) — returns ``(params, None)``.
    """
    sd = {k: v for k, v in state_dict.items()}
    if any(k.startswith("electra.") for k in sd):
        sd = {k[len("electra."):]: v for k, v in sd.items()
              if k.startswith("electra.")}
    params, _ = convert_hf_bert(sd, num_layers=num_layers)
    if "embeddings_project.weight" in sd:
        params["embeddings"]["embeddings_project"] = {
            "kernel": _np(sd["embeddings_project.weight"]).T,
            "bias": _np(sd["embeddings_project.bias"])}
    return params, None


def convert_hf_distilbert(
    state_dict: Dict[str, "object"],
    num_layers: Optional[int] = None,
) -> Tuple[dict, None]:
    """HF ``DistilBertModel`` state_dict -> encoder params.

    DistilBERT is a post-LN BERT with no token-type embeddings and renamed
    modules (``transformer.layer.N.attention.{q,k,v,out}_lin``,
    ``sa_layer_norm``, ``ffn.lin{1,2}``, ``output_layer_norm``) — the LEAD
    student (``LEAD/modeling_distilbert.py``;
    ``distill_from_12ce_to_6de.sh``). Pair with
    ``BertConfig(type_vocab_size=0)``.
    """
    sd = {k: v for k, v in state_dict.items()}
    if any(k.startswith("distilbert.") for k in sd):
        sd = {k[len("distilbert."):]: v for k, v in sd.items()
              if k.startswith("distilbert.")}

    def dense(name):
        return {"kernel": _np(sd[f"{name}.weight"]).T,
                "bias": _np(sd[f"{name}.bias"])}

    def layer_norm(name):
        return {"scale": _np(sd[f"{name}.weight"]),
                "bias": _np(sd[f"{name}.bias"])}

    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": _np(sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {
                "embedding": _np(
                    sd["embeddings.position_embeddings.weight"])},
            "layer_norm": layer_norm("embeddings.LayerNorm"),
        }
    }
    i = 0
    while f"transformer.layer.{i}.attention.q_lin.weight" in sd:
        if num_layers is not None and i >= num_layers:
            break
        base = f"transformer.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{base}.attention.q_lin"),
                "key": dense(f"{base}.attention.k_lin"),
                "value": dense(f"{base}.attention.v_lin"),
                "output": dense(f"{base}.attention.out_lin"),
                "output_layer_norm": layer_norm(f"{base}.sa_layer_norm"),
            },
            "intermediate": dense(f"{base}.ffn.lin1"),
            "output": dense(f"{base}.ffn.lin2"),
            "output_layer_norm": layer_norm(f"{base}.output_layer_norm"),
        }
        i += 1
    return params, None


def convert_hf_t5(
    state_dict: Dict[str, "object"],
) -> dict:
    """HF ``T5ForConditionalGeneration``/``T5Model`` state_dict ->
    :class:`simxns_tpu.models.t5.T5` params (the ``{"params": ...}`` tree).

    The docT5query warm start (``castorini/doc2query-t5-base-msmarco``,
    ``CAPSTONE/models/generate_query.py:115-235``). Covers the shared
    embedding, the per-stack relative-attention-bias tables (first block
    only, HF layout), every encoder/decoder block (self/cross attention,
    DenseReluDense), both final RMS norms, and the LM head when UNTIED
    (tied checkpoints reuse ``shared`` with the ``d_model**-0.5`` scaling
    the T5 module applies). Use :func:`t5_config_from_state_dict` for the
    matching config.
    """
    sd = state_dict

    def dense(name):
        return {"kernel": _np(sd[f"{name}.weight"]).T}

    def rms(name):
        return {"weight": _np(sd[f"{name}.weight"])}

    def attn(base, flax_name):
        return {flax_name: {"q": dense(f"{base}.q"), "k": dense(f"{base}.k"),
                            "v": dense(f"{base}.v"),
                            "o": dense(f"{base}.o")}}

    params = {
        "shared_embed": {"embedding": _np(sd["shared.weight"])},
        "enc_rel_bias": {"embedding": _np(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])},
        "dec_rel_bias": {"embedding": _np(
            sd["decoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])},
        "enc_final_norm": rms("encoder.final_layer_norm"),
        "dec_final_norm": rms("decoder.final_layer_norm"),
    }
    i = 0
    while f"encoder.block.{i}.layer.0.SelfAttention.q.weight" in sd:
        b = f"encoder.block.{i}.layer"
        params[f"enc_blocks_{i}"] = {
            **attn(f"{b}.0.SelfAttention", "self_attention"),
            "self_norm": rms(f"{b}.0.layer_norm"),
            "wi": dense(f"{b}.1.DenseReluDense.wi"),
            "wo": dense(f"{b}.1.DenseReluDense.wo"),
            "ffn_norm": rms(f"{b}.1.layer_norm"),
        }
        i += 1
    i = 0
    while f"decoder.block.{i}.layer.0.SelfAttention.q.weight" in sd:
        b = f"decoder.block.{i}.layer"
        params[f"dec_blocks_{i}"] = {
            **attn(f"{b}.0.SelfAttention", "self_attention"),
            "self_norm": rms(f"{b}.0.layer_norm"),
            **attn(f"{b}.1.EncDecAttention", "cross_attention"),
            "cross_norm": rms(f"{b}.1.layer_norm"),
            "wi": dense(f"{b}.2.DenseReluDense.wi"),
            "wo": dense(f"{b}.2.DenseReluDense.wo"),
            "ffn_norm": rms(f"{b}.2.layer_norm"),
        }
        i += 1
    if ("lm_head.weight" in sd
            and _np(sd["lm_head.weight"]) is not _np(sd["shared.weight"])
            and not np.array_equal(_np(sd["lm_head.weight"]),
                                   _np(sd["shared.weight"]))):
        params["lm_head"] = dense("lm_head")
    return {"params": params}


def t5_config_from_state_dict(state_dict, base=None):
    """Derive the :class:`simxns_tpu.models.t5.T5Config` a converted
    checkpoint requires (vocab/d_model/d_ff/layers from weight shapes;
    heads and buckets from the relative-attention-bias table; d_kv =
    inner/heads; tie from lm_head equality).

    ``relative_attention_max_distance`` is a runtime bucketing parameter
    with no weight-shape footprint — it CANNOT be derived. It is taken
    from ``base`` (T5 default 128, which every published T5/docT5query
    checkpoint uses); pass a base config when importing a nonstandard
    model."""
    from simxns_tpu.models.t5 import T5Config

    base = base or T5Config()
    vocab, d_model = _np(state_dict["shared.weight"]).shape
    rel = _np(state_dict["encoder.block.0.layer.0.SelfAttention"
                         ".relative_attention_bias.weight"])
    buckets, heads = rel.shape
    inner = _np(state_dict["encoder.block.0.layer.0.SelfAttention"
                           ".q.weight"]).shape[0]
    d_ff = _np(state_dict["encoder.block.0.layer.1.DenseReluDense"
                          ".wi.weight"]).shape[0]
    n_enc = sum(1 for k in state_dict
                if k.endswith(".SelfAttention.q.weight")
                and k.startswith("encoder."))
    n_dec = sum(1 for k in state_dict
                if k.endswith(".SelfAttention.q.weight")
                and k.startswith("decoder."))
    tied = ("lm_head.weight" not in state_dict
            or np.array_equal(_np(state_dict["lm_head.weight"]),
                              _np(state_dict["shared.weight"])))
    return base.replace(
        vocab_size=int(vocab), d_model=int(d_model), d_ff=int(d_ff),
        d_kv=int(inner) // int(heads), num_heads=int(heads),
        num_layers=int(n_enc), num_decoder_layers=int(n_dec),
        relative_attention_num_buckets=int(buckets),
        tie_word_embeddings=bool(tied))


_FAMILY_MARKERS = (
    # (state_dict key marker, family name) — first match wins
    ("SelfAttention.q.weight", "t5"),
    ("electra.embeddings.", "electra"),
    ("roberta.embeddings.", "roberta"),
    ("distilbert.embeddings.", "distilbert"),
    ("transformer.layer.0.attention.q_lin.weight", "distilbert"),
    ("lm_head.layer_norm.weight", "roberta"),
)


def sniff_hf_family(state_dict: Dict[str, "object"]) -> str:
    """Guess the architecture family from state_dict key patterns.

    BERT and ERNIE-2.0 share a layout and both return "bert". Bare (no
    model-prefix) RoBERTa checkpoints are indistinguishable from BERT by
    keys alone — prefer the explicit converters when you know the family.
    """
    keys = set(state_dict)
    for marker, family in _FAMILY_MARKERS:
        if any(marker in k for k in keys):
            return family
    return "bert"


def convert_hf_auto(state_dict, num_layers=None):
    """Sniff the family and dispatch to its converter.

    Returns ``(family, encoder_params, mlm_params_or_None)``.
    """
    family = sniff_hf_family(state_dict)
    if family == "t5":
        raise ValueError(
            "T5 checkpoints are encoder-DECODER artifacts — they cannot "
            "warm-start a BERT-family encoder. Use convert_hf_t5 + "
            "simxns_tpu.models.t5.T5 (the docT5query generator path).")
    fn = {"bert": convert_hf_bert, "roberta": convert_hf_roberta,
          "electra": convert_hf_electra,
          "distilbert": convert_hf_distilbert}[family]
    params, mlm = fn(state_dict, num_layers=num_layers)
    return family, params, mlm


def config_from_hf_params(enc_params: dict, family: str, base=None):
    """Derive the :class:`BertConfig` a converted param tree requires.

    Shapes (vocab/hidden/layers/intermediate/positions/token-types/
    embedding_size) come from the params; family-specific semantics
    (RoBERTa position derivation + pad id) from ``family``; TPU knobs
    (dtype, impls, num_heads — not recoverable from shapes) from ``base``
    (default :class:`BertConfig`). This is what ``run.py
    --init-checkpoint`` uses to reshape a recipe config around the actual
    warm-start artifact.
    """
    from simxns_tpu.models.bert import BertConfig

    base = base or BertConfig()
    emb = enc_params["embeddings"]
    vocab, width = emb["word_embeddings"]["embedding"].shape
    hidden = enc_params["layer_0"]["attention"]["query"]["kernel"].shape[0]
    kw = dict(
        vocab_size=int(vocab),
        hidden_size=int(hidden),
        embedding_size=int(width) if width != hidden else None,
        num_layers=sum(1 for k in enc_params if k.startswith("layer_")),
        intermediate_size=int(
            enc_params["layer_0"]["intermediate"]["kernel"].shape[1]),
        max_position_embeddings=int(
            emb["position_embeddings"]["embedding"].shape[0]),
        type_vocab_size=(
            int(emb["token_type_embeddings"]["embedding"].shape[0])
            if "token_type_embeddings" in emb else 0),
    )
    if family == "roberta":
        kw.update(position_style="roberta", pad_token_id=1)
    return base.replace(**kw)


def load_hf_bert_encoder(path_or_state_dict, num_layers=None):
    """Load from a ``pytorch_model.bin`` path or an in-memory state_dict."""
    if isinstance(path_or_state_dict, (str, bytes)):
        import torch

        sd = torch.load(path_or_state_dict, map_location="cpu",
                        weights_only=True)
    else:
        sd = path_or_state_dict
    return convert_hf_bert(sd, num_layers=num_layers)


def as_biencoder_params(encoder_params: dict, share_weight: bool = False
                        ) -> dict:
    """Wrap a converted encoder into BiEncoder's two-tower tree."""
    towers = {"question_model": {"encoder": encoder_params}}
    if not share_weight:
        import copy

        towers["ctx_model"] = {"encoder": copy.deepcopy(encoder_params)}
    return {"params": towers}
