"""HF BERT checkpoint import.

The reference initializes every model from HF checkpoints (ERNIE-2.0,
bert-base, coCondenser, released SimXNS artifacts — SURVEY.md §2.3-2.6).
This converts a HF ``BertModel``/``BertForMaskedLM`` PyTorch ``state_dict``
into the :class:`simxns_tpu.models.bert.BertEncoder` parameter tree so those
artifacts load directly (torch-cpu is only needed at conversion time).

Covers: embeddings (+LayerNorm), all transformer layers, and the MLM head
(``cls.predictions.*`` -> ``mlm/*`` with the tied-decoder bias). The HF
pooler head is ignored — the reference never uses it for retrieval
(``SimANS/model/models.py:80-82`` takes ``seq[:, 0]``).
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
