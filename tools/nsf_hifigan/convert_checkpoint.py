"""Convert a torch NSF-HiFiGAN checkpoint (the reference's
``checkpoints/nsf_hifigan/model`` format, raw ``{"generator": ...}`` dict or
a Lightning state_dict) to flax params for ``NsfHifiGANGenerator``.

Weight norm is folded at conversion (the reference removes it at load,
``nsf_hifigan/models.py:440-448``), so inference graphs are plain convs.

Usage:
    python tools/nsf_hifigan/convert_checkpoint.py \
        --input checkpoints/nsf_hifigan/model --output nsf_hifigan.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _fold_wn(sd: dict, prefix: str) -> np.ndarray:
    """Fold weight norm: w = g * v / ||v||_dim0 if weight_g/v exist."""
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"])
        v = np.asarray(sd[f"{prefix}.weight_v"])
        norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        return g * v / (norm + 1e-12)
    return np.asarray(sd[f"{prefix}.weight"])


def _conv(sd, prefix):
    """torch Conv1d [out, in, k] -> flax {kernel [k, in, out], bias}."""
    w = _fold_wn(sd, prefix)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _convtranspose(sd, prefix):
    """torch ConvTranspose1d [in, out, k] -> flax transpose_kernel kernel
    [k, out, in] (layout verified by tests/test_vocoder.py)."""
    w = _fold_wn(sd, prefix)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _dense(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def convert(sd: dict, n_ups: int = 5, n_kernels: int = 3) -> dict:
    params: dict = {}

    params["conv_pre"] = _conv(sd, "conv_pre")
    params["conv_post"] = _conv(sd, "conv_post")
    params["m_source"] = {"l_linear": _dense(sd, "m_source.l_linear")}

    for i in range(n_ups):
        params[f"ups_{i}"] = _convtranspose(sd, f"ups.{i}")
        params[f"noise_convs_{i}"] = _conv(sd, f"noise_convs.{i}")

    n_res = len(
        set(
            int(k.split(".")[1])
            for k in sd
            if k.startswith("resblocks.")
        )
    )
    for r in range(n_res):
        block: dict = {}
        for j in range(3):  # ResBlock1 has 3 conv pairs
            if f"resblocks.{r}.convs1.{j}.weight_v" not in sd and (
                f"resblocks.{r}.convs1.{j}.weight" not in sd
            ):
                continue
            block[f"convs1_{j}"] = {"Conv_0": _conv(sd, f"resblocks.{r}.convs1.{j}")}
            block[f"convs2_{j}"] = {"Conv_0": _conv(sd, f"resblocks.{r}.convs2.{j}")}
        params[f"resblocks_{r}"] = block

    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    cp = torch.load(args.input, map_location="cpu")
    if "generator" in cp:
        sd = cp["generator"]
    elif "state_dict" in cp:
        sd = {
            k.replace("model.", "").replace("generator.", ""): v
            for k, v in cp["state_dict"].items()
            if "model." in k or "generator." in k
        }
    else:
        sd = cp
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    n_ups = len(set(int(k.split(".")[1]) for k in sd if k.startswith("ups.")))
    params = convert(sd, n_ups=n_ups)

    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"converted NSF-HiFiGAN ({len(sd)} tensors, {n_ups} upsamples) "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
