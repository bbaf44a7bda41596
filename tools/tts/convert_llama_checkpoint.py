"""Convert a torch LlamaDenoiser state dict (reference
``fish_diffusion/modules/llama.py:23-105`` — HF LlamaModel trunk + fish's
in/merge/out projections) to flax params for
``fish_diffusion_tpu.models.llama.LlamaDenoiser``.

Usage:
    python tools/tts/convert_llama_checkpoint.py --input ckpt --output p.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _d(sd, prefix):
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_llama_denoiser(sd: dict, heads: int) -> dict:
    params: dict = {}
    params["embed_tokens"] = {"embedding": np.asarray(sd["embed_tokens.weight"])}
    params["in_proj"] = _d(sd, "in_proj")
    params["merge_proj"] = _d(sd, "merge_proj")
    params["out_proj"] = _d(sd, "out_proj")
    params["mel_len_embedding"] = _d(sd, "mel_len_embedding")
    params["norm"] = {"scale": np.asarray(sd["norm.weight"])}

    n_layers = (
        max(int(k.split(".")[1]) for k in sd if k.startswith("layers.")) + 1
    )
    for i in range(n_layers):
        p = f"layers.{i}."
        params[f"layers_{i}"] = {
            "input_norm": {"scale": np.asarray(sd[p + "input_layernorm.weight"])},
            "post_norm": {
                "scale": np.asarray(sd[p + "post_attention_layernorm.weight"])
            },
            "q_proj": _d(sd, p + "self_attn.q_proj"),
            "k_proj": _d(sd, p + "self_attn.k_proj"),
            "v_proj": _d(sd, p + "self_attn.v_proj"),
            "o_proj": _d(sd, p + "self_attn.o_proj"),
            "gate_proj": _d(sd, p + "mlp.gate_proj"),
            "up_proj": _d(sd, p + "mlp.up_proj"),
            "down_proj": _d(sd, p + "mlp.down_proj"),
        }
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--heads", type=int, required=True)
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {
        k.removeprefix("model.denoiser.").removeprefix("denoise_fn."): (
            v.numpy() if hasattr(v, "numpy") else v
        )
        for k, v in sd.items()
    }
    params = convert_llama_denoiser(sd, heads=args.heads)
    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
