"""Convert a HF BERT checkpoint (torch ``BertModel`` state dict) to flax
params for ``fish_diffusion_tpu.models.encoders.BertEncoder``.

The reference wraps ``transformers.AutoModel`` at runtime
(``fish_diffusion/modules/encoders/bert.py:10``); here the encoder is a
native flax module, so weights are converted once, offline.

Usage:
    python tools/tts/convert_bert_checkpoint.py \
        --model bert-base-cased --output bert.pkl
    # or from a local state-dict file:
    python tools/tts/convert_bert_checkpoint.py \
        --input pytorch_model.bin --output bert.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _lin(sd, key):
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[f"{key}.weight"]).T),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _ln(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def convert_state_dict(sd: dict, num_layers: int) -> dict:
    """HF BertModel state dict -> flax params for BertEncoder.

    Ignores the pooler (last_hidden_state is all the reference uses) and
    buffer keys (position_ids). Asserts every other key is consumed.
    """
    sd = {k.removeprefix("bert."): np.asarray(v) for k, v in sd.items()}
    consumed = set()

    def take(key):
        consumed.add(f"{key}.weight")
        consumed.add(f"{key}.bias")

    params = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]
        },
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]
        },
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]
        },
        "embeddings_ln": _ln(sd, "embeddings.LayerNorm"),
    }
    consumed |= {
        "embeddings.word_embeddings.weight",
        "embeddings.position_embeddings.weight",
        "embeddings.token_type_embeddings.weight",
        "embeddings.LayerNorm.weight",
        "embeddings.LayerNorm.bias",
    }

    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": _lin(sd, f"{p}.attention.self.query"),
            "k": _lin(sd, f"{p}.attention.self.key"),
            "v": _lin(sd, f"{p}.attention.self.value"),
            "attn_out": _lin(sd, f"{p}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": _lin(sd, f"{p}.intermediate.dense"),
            "output": _lin(sd, f"{p}.output.dense"),
            "output_ln": _ln(sd, f"{p}.output.LayerNorm"),
        }
        for sub in (
            "attention.self.query",
            "attention.self.key",
            "attention.self.value",
            "attention.output.dense",
            "attention.output.LayerNorm",
            "intermediate.dense",
            "output.dense",
            "output.LayerNorm",
        ):
            take(f"{p}.{sub}")

    leftovers = {
        k
        for k in sd
        if k not in consumed
        and not k.startswith("pooler.")
        and not k.endswith("position_ids")
    }
    assert not leftovers, f"unconsumed HF keys: {sorted(leftovers)[:8]}"
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None, help="HF model name/dir")
    parser.add_argument("--input", default=None, help="torch state-dict file")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    if args.model:
        from transformers import AutoConfig, AutoModel

        hf = AutoModel.from_pretrained(args.model)
        cfg = AutoConfig.from_pretrained(args.model)
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        num_layers = cfg.num_hidden_layers
        meta = dict(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
        )
    else:
        sd = torch.load(args.input, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        num_layers = 1 + max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith(("encoder.layer.", "bert.encoder.layer."))
        )
        meta = dict(num_layers=num_layers)

    params = convert_state_dict(sd, num_layers)
    with open(args.output, "wb") as f:
        pickle.dump({"params": params, "config": meta}, f)
    print(f"wrote {args.output}: {num_layers} layers, config {meta}")


if __name__ == "__main__":
    main()
