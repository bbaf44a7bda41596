"""Convert a torch ADaMoS-HiFiGAN checkpoint to flax params for
``ADaMoSGenerator`` (reference ``fish_diffusion/modules/vocoders/adamos/``).

The ConvNeXt backbone has no weight norm; the HiFiGAN head's weight norm is
folded at conversion (as for NSF-HiFiGAN).

Usage:
    python tools/adamos/convert_checkpoint.py --input ckpt --output p.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _fold_wn(sd: dict, prefix: str) -> np.ndarray:
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"])
        v = np.asarray(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        return np.asarray(sd[f"{prefix}.weight"])
    norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / (norm + 1e-12)


def _conv(sd, prefix):
    w = _fold_wn(sd, prefix)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _convtranspose(sd, prefix):
    w = _fold_wn(sd, prefix)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _dense(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _norm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _convnext_block(sd, prefix):
    dw = np.asarray(sd[f"{prefix}.dwconv.weight"])  # [dim, 1, 7]
    return {
        "dwconv": {
            "kernel": np.ascontiguousarray(dw.transpose(2, 1, 0)),
            "bias": np.asarray(sd[f"{prefix}.dwconv.bias"]),
        },
        "norm": _norm(sd, f"{prefix}.norm"),
        "pwconv1": _dense(sd, f"{prefix}.pwconv1"),
        "pwconv2": _dense(sd, f"{prefix}.pwconv2"),
        "gamma": np.asarray(sd[f"{prefix}.gamma"]),
    }


def convert_backbone(sd: dict, prefix: str = "backbone") -> dict:
    """ConvNeXtEncoder (encoder.py:163-238) -> flax ``ConvNeXtEncoder``."""
    params: dict = {}
    params["stem_conv"] = _conv(sd, f"{prefix}.channel_layers.0.0")
    params["stem_norm"] = _norm(sd, f"{prefix}.channel_layers.0.1")

    n_stages = (
        max(
            int(k.split(".")[len(prefix.split(".")) + 1])
            for k in sd
            if k.startswith(f"{prefix}.stages.")
        )
        + 1
    )
    for i in range(1, n_stages):
        params[f"mid_norm_{i}"] = _norm(sd, f"{prefix}.channel_layers.{i}.0")
        w = np.asarray(sd[f"{prefix}.channel_layers.{i}.1.weight"])[:, :, 0]
        params[f"mid_proj_{i}"] = {
            "kernel": np.ascontiguousarray(w.T),
            "bias": np.asarray(sd[f"{prefix}.channel_layers.{i}.1.bias"]),
        }

    for i in range(n_stages):
        depth = (
            max(
                int(k.split(".")[len(prefix.split(".")) + 2])
                for k in sd
                if k.startswith(f"{prefix}.stages.{i}.")
            )
            + 1
        )
        for j in range(depth):
            p = f"{prefix}.stages.{i}.{j}"
            if f"{p}.dwconv.weight" in sd:
                params[f"stage_{i}_block_{j}"] = _convnext_block(sd, p)
            else:  # ParallelConvNeXtBlock: blocks.{m} per kernel size
                blk = {}
                m = 0
                while f"{p}.blocks.{m}.dwconv.weight" in sd:
                    sub = _convnext_block(sd, f"{p}.blocks.{m}")
                    k = sub["dwconv"]["kernel"].shape[0]
                    blk[f"k{k}"] = sub
                    m += 1
                params[f"stage_{i}_block_{j}"] = blk

    params["final_norm"] = _norm(sd, f"{prefix}.norm")
    return params


def convert_head(sd: dict, prefix: str = "head", n_kernels: int = 4) -> dict:
    """HiFiGANGenerator head (hifigan.py:115-236, use_template=False)."""
    params: dict = {}
    params["conv_pre"] = _conv(sd, f"{prefix}.conv_pre")
    params["conv_post"] = _conv(sd, f"{prefix}.conv_post")

    n_ups = (
        max(
            int(k.split(".")[len(prefix.split(".")) + 1])
            for k in sd
            if k.startswith(f"{prefix}.ups.")
        )
        + 1
    )
    for i in range(n_ups):
        params[f"ups_{i}"] = _convtranspose(sd, f"{prefix}.ups.{i}")

    n_res = len(
        set(
            int(k.split(".")[len(prefix.split(".")) + 1])
            for k in sd
            if k.startswith(f"{prefix}.resblocks.")
        )
    )
    for r in range(n_res):
        block: dict = {}
        m = 0
        while f"{prefix}.resblocks.{r}.convs1.{m}.weight_v" in sd or (
            f"{prefix}.resblocks.{r}.convs1.{m}.weight" in sd
        ):
            block[f"convs1_{m}"] = {
                "Conv_0": _conv(sd, f"{prefix}.resblocks.{r}.convs1.{m}")
            }
            block[f"convs2_{m}"] = {
                "Conv_0": _conv(sd, f"{prefix}.resblocks.{r}.convs2.{m}")
            }
            m += 1
        params[f"resblocks_{r}"] = block
    return params


def convert_adamos(sd: dict) -> dict:
    return {
        "backbone": convert_backbone(sd, "backbone"),
        "head": convert_head(sd, "head"),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {
        k.removeprefix("model.generator.").removeprefix("generator."): (
            v.numpy() if hasattr(v, "numpy") else v
        )
        for k, v in sd.items()
    }
    params = convert_adamos(sd)
    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
