"""HuggingFace BERT checkpoint -> Flax param tree mapping.

Lets the framework run the reference's exact models (all-MiniLM-L6-v2
bi-encoder, ms-marco-MiniLM-L-6-v2 cross-encoder — reference
api/config.py:15,33) when their weights are available locally.  Numerical
parity with the torch forward pass is tested in tests/test_models.py using a
tiny randomly-initialized torch BertModel (no downloads needed).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _load_state_dict(path: str | Path) -> dict | None:
    p = Path(path)
    if p.is_dir():
        for name in ("model.safetensors", "pytorch_model.bin"):
            if (p / name).is_file():
                p = p / name
                break
        else:
            return None
    if p.suffix == ".safetensors":
        try:
            from safetensors.numpy import load_file
            return dict(load_file(str(p)))
        except Exception:
            return None
    try:
        import torch
        sd = torch.load(str(p), map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    except Exception:
        return None


def _strip_prefix(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        for prefix in ("bert.", "model.", ""):
            if k.startswith(prefix):
                out[k[len(prefix):]] = np.asarray(v)
                break
    return out


def map_bert_state_dict(sd: dict, spec) -> dict:
    """HF BertModel state dict -> params for tpu_rag.models.bert.BertEncoder."""
    sd = _strip_prefix(sd)
    h, heads = spec.hidden, spec.heads
    head_dim = h // heads

    def t(name):  # torch Linear weight (out, in) -> flax kernel (in, out)
        return sd[name].T.astype(np.float32)

    def qkv_kernel(name):
        return t(name).reshape(h, heads, head_dim)

    def qkv_bias(name):
        return sd[name].astype(np.float32).reshape(heads, head_dim)

    params = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"].astype(np.float32)},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"].astype(np.float32)},
        "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"].astype(np.float32)},
        "embeddings_ln": {
            "scale": sd["embeddings.LayerNorm.weight"].astype(np.float32),
            "bias": sd["embeddings.LayerNorm.bias"].astype(np.float32),
        },
    }
    for i in range(spec.layers):
        pre = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": qkv_kernel(pre + "attention.self.query.weight"),
                          "bias": qkv_bias(pre + "attention.self.query.bias")},
                "key": {"kernel": qkv_kernel(pre + "attention.self.key.weight"),
                        "bias": qkv_bias(pre + "attention.self.key.bias")},
                "value": {"kernel": qkv_kernel(pre + "attention.self.value.weight"),
                          "bias": qkv_bias(pre + "attention.self.value.bias")},
                "out": {
                    "kernel": t(pre + "attention.output.dense.weight").reshape(heads, head_dim, h),
                    "bias": sd[pre + "attention.output.dense.bias"].astype(np.float32),
                },
            },
            "attention_ln": {
                "scale": sd[pre + "attention.output.LayerNorm.weight"].astype(np.float32),
                "bias": sd[pre + "attention.output.LayerNorm.bias"].astype(np.float32),
            },
            "intermediate": {"kernel": t(pre + "intermediate.dense.weight"),
                             "bias": sd[pre + "intermediate.dense.bias"].astype(np.float32)},
            "output": {"kernel": t(pre + "output.dense.weight"),
                       "bias": sd[pre + "output.dense.bias"].astype(np.float32)},
            "output_ln": {
                "scale": sd[pre + "output.LayerNorm.weight"].astype(np.float32),
                "bias": sd[pre + "output.LayerNorm.bias"].astype(np.float32),
            },
        }
    return params


def spec_from_hf_config(path: str | Path):
    """BertSpec from a checkpoint dir's config.json (HF convention) — the
    turnkey proof path (scripts/prove_checkpoint.py) must not guess the
    architecture from a model NAME when the dir says it exactly.  Returns
    None when no readable config.json is present."""
    import json

    p = Path(path)
    if p.is_dir():
        cfg_file = p / "config.json"
    elif p.is_file():  # a weights file: look next to it
        cfg_file = p.parent / "config.json"
    else:
        return None
    if not cfg_file.is_file():
        return None
    try:
        cfg = json.loads(cfg_file.read_text())
    except Exception:
        return None
    try:
        from tpu_rag.models.bert import BertSpec

        return BertSpec(
            vocab_size=int(cfg["vocab_size"]),
            hidden=int(cfg["hidden_size"]),
            layers=int(cfg["num_hidden_layers"]),
            heads=int(cfg["num_attention_heads"]),
            ffn=int(cfg["intermediate_size"]),
            max_len=int(cfg.get("max_position_embeddings", 512)),
        )
    except (KeyError, ValueError, TypeError):
        return None


def load_bert_params(path: str | Path, spec) -> dict | None:
    sd = _load_state_dict(path)
    if sd is None:
        return None
    try:
        return map_bert_state_dict(sd, spec)
    except (KeyError, ValueError) as e:
        # ValueError = shape mismatch (checkpoint from a different
        # architecture than `spec`, e.g. bge-base weights with a minilm
        # spec): degrade gracefully like every other loader here
        import logging
        logging.getLogger("tpu_rag").warning(
            "HF checkpoint %s does not match spec (%s); ignoring it", path, e)
        return None


def load_cross_encoder_params(path: str | Path, spec) -> dict | None:
    """HF BertForSequenceClassification -> CrossEncoderModule params."""
    sd = _load_state_dict(path)
    if sd is None:
        return None
    try:
        bert = map_bert_state_dict(sd, spec)
        stripped = _strip_prefix(sd)
        return {
            "bert": bert,
            "pooler": {"kernel": stripped["pooler.dense.weight"].T.astype(np.float32),
                       "bias": stripped["pooler.dense.bias"].astype(np.float32)},
            "classifier": {"kernel": np.asarray(sd["classifier.weight"]).T.astype(np.float32),
                           "bias": np.asarray(sd["classifier.bias"]).astype(np.float32)},
        }
    except KeyError:
        return None
