"""Convert a torch HuBERT-family checkpoint (bshall hubert-soft, HF
ContentVec/chinese-hubert) to flax params for
``fish_diffusion_tpu.extractors.feature.HubertEncoder``.

Replaces the reference's implicit torch.hub/HF downloads at constructor time
(``hubert_soft.py:11``, ``chinese_hubert.py:32-35``) with explicit artifact
management: run this once against a locally downloaded .pt/.bin file.

Usage:
    python tools/preprocessing/convert_hubert_checkpoint.py \
        --input hubert-soft.pt --style bshall --output hubert_soft.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _d(w):
    """torch Linear weight [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):
    """torch Conv1d weight [out, in, k] -> flax kernel [k, in, out]."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def convert_hf_hubert(sd: dict, heads: int = None) -> dict:
    """HF transformers HubertModel state dict -> HubertEncoder params.

    ``heads`` defaults by hidden size (768 -> 12, 1024 -> 16) — pass it
    explicitly for non-standard configs.
    """
    g = lambda k: np.asarray(sd[k])
    params: dict = {}

    fe = {}
    for i in range(7):
        fe[f"conv_{i}"] = {
            "kernel": _conv(g(f"feature_extractor.conv_layers.{i}.conv.weight"))
        }
    fe["group_norm"] = {
        "scale": g("feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": g("feature_extractor.conv_layers.0.layer_norm.bias"),
    }
    params["feature_extractor"] = fe

    params["feat_norm"] = {
        "scale": g("feature_projection.layer_norm.weight"),
        "bias": g("feature_projection.layer_norm.bias"),
    }
    params["feature_projection"] = {
        "kernel": _d(g("feature_projection.projection.weight")),
        "bias": g("feature_projection.projection.bias"),
    }

    # positional conv (weight-norm folded; HF normalizes over dim=2)
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        wg = g("encoder.pos_conv_embed.conv.weight_g")
        wv = g("encoder.pos_conv_embed.conv.weight_v")
        norm = np.linalg.norm(wv, axis=(0, 1), keepdims=True)
        w = wg * wv / (norm + 1e-12)
    elif "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        wg = g("encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        wv = g("encoder.pos_conv_embed.conv.parametrizations.weight.original1")
        norm = np.linalg.norm(wv, axis=(0, 1), keepdims=True)
        w = wg * wv / (norm + 1e-12)
    else:
        w = g("encoder.pos_conv_embed.conv.weight")
    params["pos_conv"] = {
        "kernel": _conv(w),
        "bias": g("encoder.pos_conv_embed.conv.bias"),
    }

    layer_norm_first = "encoder.layer_norm.weight" in sd and any(
        "layers.0.layer_norm" in k for k in sd
    )
    if "encoder.layer_norm.weight" in sd:
        params["pre_norm"] = {
            "scale": g("encoder.layer_norm.weight"),
            "bias": g("encoder.layer_norm.bias"),
        }

    n_layers = (
        max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith("encoder.layers.")
        )
        + 1
    )
    dim = g("feature_projection.projection.weight").shape[0]
    if heads is None:
        heads = 12 if dim == 768 else 16
    head_dim = dim // heads

    for i in range(n_layers):
        p = f"encoder.layers.{i}."
        attn = {
            "query": {
                "kernel": _d(g(p + "attention.q_proj.weight")).reshape(dim, heads, head_dim),
                "bias": g(p + "attention.q_proj.bias").reshape(heads, head_dim),
            },
            "key": {
                "kernel": _d(g(p + "attention.k_proj.weight")).reshape(dim, heads, head_dim),
                "bias": g(p + "attention.k_proj.bias").reshape(heads, head_dim),
            },
            "value": {
                "kernel": _d(g(p + "attention.v_proj.weight")).reshape(dim, heads, head_dim),
                "bias": g(p + "attention.v_proj.bias").reshape(heads, head_dim),
            },
            "out": {
                "kernel": np.asarray(g(p + "attention.out_proj.weight")).T.reshape(
                    heads, head_dim, dim
                ),
                "bias": g(p + "attention.out_proj.bias"),
            },
        }
        params[f"layer_{i}"] = {
            "attn": attn,
            "norm1": {
                "scale": g(p + "layer_norm.weight"),
                "bias": g(p + "layer_norm.bias"),
            },
            "fc1": {
                "kernel": _d(g(p + "feed_forward.intermediate_dense.weight")),
                "bias": g(p + "feed_forward.intermediate_dense.bias"),
            },
            "fc2": {
                "kernel": _d(g(p + "feed_forward.output_dense.weight")),
                "bias": g(p + "feed_forward.output_dense.bias"),
            },
            "norm2": {
                "scale": g(p + "final_layer_norm.weight"),
                "bias": g(p + "final_layer_norm.bias"),
            },
        }

    # projection heads, when present in the source checkpoint (ContentVec
    # final_proj, reference content_vec.py:13; hubert-soft proj)
    for key, name in (("final_proj", "final_proj"), ("proj", "soft_proj")):
        wk, bk = f"{key}.weight", f"{key}.bias"
        if wk in sd:
            params[name] = {"kernel": _d(sd[wk]), "bias": np.asarray(sd[bk])}

    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--style", choices=["hf", "bshall"], default="hf",
        help="checkpoint layout: HF transformers Hubert, or bshall hubert-soft",
    )
    parser.add_argument("--final-proj-key", default="final_proj",
                        help="name of the projection head in the source ckpt")
    args = parser.parse_args()

    import torch

    sd = torch.load(args.input, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    if args.style == "bshall":
        # bshall layout prefixes differ slightly; normalize to HF-ish keys
        sd = {k.replace("hubert.", ""): v for k, v in sd.items()}

    if args.final_proj_key != "final_proj":
        # normalize a non-standard projection-head key so the library
        # conversion below picks it up
        for suffix in ("weight", "bias"):
            k = f"{args.final_proj_key}.{suffix}"
            if k in sd:
                sd[f"final_proj.{suffix}"] = sd[k]
    params = convert_hf_hubert(sd)

    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"converted {len(sd)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
