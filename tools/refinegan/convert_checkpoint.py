"""Convert a torch RefineGAN generator state dict to the flax layout.

Reference module: ``fish_diffusion/modules/vocoders/refinegan/generator.py``
(RefineGANGenerator :313-478). Weight-normed convs map onto flax
``nn.WeightNorm`` (torch dim=0 norm == flax feature_axes=-1 over [k, in]):
``weight_v [out, in, k] -> kernel [k, in, out]``, ``weight_g -> scale``.

Usage:
    python tools/refinegan/convert_checkpoint.py --input g.ckpt --output p.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

KERNEL_SIZES = (3, 7, 11)


def _conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])  # [out, in, k]
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _wn_params(sd, prefix):
    """(g, v, bias) from either old weight_norm keys or parametrize keys."""
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"])
        v = np.asarray(sd[f"{prefix}.weight_v"])
    else:
        g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"])
    return g.reshape(-1), v, np.asarray(sd[f"{prefix}.bias"])


def _wn_conv_entries(sd, tprefix, name):
    """Two flax tree entries for one weight-normed conv wrapped in
    nn.WeightNorm(name=name) around a conv named f'{name}_conv'."""
    g, v, b = _wn_params(sd, tprefix)
    return {
        name: {f"{name}_conv/kernel/scale": g},
        f"{name}_conv": {
            "kernel": np.ascontiguousarray(v.transpose(2, 1, 0)),
            "bias": b,
        },
    }


def _resblock(sd, tprefix, n_dilations=3):
    out = {}
    for j in range(n_dilations):
        out.update(_wn_conv_entries(sd, f"{tprefix}.convs1.{j}", f"convs1_{j}"))
        out.update(_wn_conv_entries(sd, f"{tprefix}.convs2.{j}", f"convs2_{j}"))
    return out


def convert_refinegan(sd: dict) -> dict:
    params: dict = {}
    params.update(_wn_conv_entries(sd, "template_conv", "template_conv"))
    params.update(_wn_conv_entries(sd, "mel_conv", "mel_conv"))
    params.update(_wn_conv_entries(sd, "output_conv", "output_conv"))
    params["source_conv"] = _conv(sd, "source_conv")

    n_down = (
        max(
            int(k.split(".")[1])
            for k in sd
            if k.startswith("downsample_blocks.")
        )
        + 1
    )
    for i in range(n_down):
        # block = Sequential(Upsample, ResBlock) -> index 1
        params[f"down_res_{i}"] = _resblock(sd, f"downsample_blocks.{i}.1")

    n_up = (
        max(
            int(k.split(".")[1])
            for k in sd
            if k.startswith("upsample_conv_blocks.")
        )
        + 1
    )
    for i in range(n_up):
        p = f"upsample_conv_blocks.{i}"
        block = {"input_conv": _conv(sd, f"{p}.input_conv")}
        for m, k in enumerate(KERNEL_SIZES):
            # Sequential(AdaIN, ResBlock, AdaIN)
            block[f"adain1_k{k}"] = {
                "weight": np.asarray(sd[f"{p}.blocks.{m}.0.weight"])
            }
            block[f"res_k{k}"] = _resblock(sd, f"{p}.blocks.{m}.1")
            block[f"adain2_k{k}"] = {
                "weight": np.asarray(sd[f"{p}.blocks.{m}.2.weight"])
            }
        params[f"up_res_{i}"] = block

    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="torch checkpoint")
    parser.add_argument("--output", required=True, help="output params pickle")
    parser.add_argument("--key", default=None,
                        help="state-dict key prefix to strip (e.g. generator.)")
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("generator", ckpt))
    sd = {k: v for k, v in sd.items()}
    if args.key:
        sd = {k[len(args.key):]: v for k, v in sd.items() if k.startswith(args.key)}
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    params = convert_refinegan(sd)
    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
