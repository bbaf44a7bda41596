"""Convert the released RMVPE ``rmvpe.pt`` torch checkpoint to flax
variables for ``fish_diffusion_tpu.extractors.rmvpe.RMVPitchExtractor``.

Usage:
    python tools/preprocessing/convert_rmvpe_checkpoint.py \
        --input rmvpe.pt --output rmvpe.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _conv2d(sd, key):
    """torch [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    w = np.asarray(sd[key])
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _bn(sd, prefix):
    return (
        {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        },
        {
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        },
    )


def _conv_block_res(sd, prefix):
    params = {
        "conv1": {"kernel": _conv2d(sd, f"{prefix}.conv.0.weight")},
        "conv2": {"kernel": _conv2d(sd, f"{prefix}.conv.3.weight")},
    }
    stats = {}
    p1, s1 = _bn(sd, f"{prefix}.conv.1")
    p2, s2 = _bn(sd, f"{prefix}.conv.4")
    params["bn1"], stats["bn1"] = p1, s1
    params["bn2"], stats["bn2"] = p2, s2
    if f"{prefix}.shortcut.weight" in sd:
        params["shortcut"] = {
            "kernel": _conv2d(sd, f"{prefix}.shortcut.weight"),
            "bias": np.asarray(sd[f"{prefix}.shortcut.bias"]),
        }
    return params, stats


def _res_encoder_block(sd, prefix, n_blocks):
    params, stats = {}, {}
    for i in range(n_blocks):
        p, s = _conv_block_res(sd, f"{prefix}.conv.{i}")
        params[f"block_{i}"], stats[f"block_{i}"] = p, s
    return params, stats


def _gru_cell(sd, prefix, reverse: bool):
    """torch GRU layer-0 weights -> flax GRUCell params.

    torch gates order: r, z, n with weight_ih [3H, in], weight_hh [3H, H].
    flax GRUCell: ir/iz/in Dense (kernel [in, H]) and hr/hz/hn (kernel
    [H, H]); hn has bias, others use the i-side biases.
    """
    sfx = "_reverse" if reverse else ""
    w_ih = np.asarray(sd[f"{prefix}.weight_ih_l0{sfx}"])
    w_hh = np.asarray(sd[f"{prefix}.weight_hh_l0{sfx}"])
    b_ih = np.asarray(sd[f"{prefix}.bias_ih_l0{sfx}"])
    b_hh = np.asarray(sd[f"{prefix}.bias_hh_l0{sfx}"])
    H = w_hh.shape[1]

    def chunk(w, i):
        return np.ascontiguousarray(w[i * H : (i + 1) * H].T)

    # flax GRUCell: r = sig(ir(x) + hr(h)) with hr bias-free -> fold
    # b_hr into ir.bias (same for z); n = tanh(in(x) + r * hn(h)) keeps
    # separate in/hn biases, matching torch exactly.
    return {
        "ir": {"kernel": chunk(w_ih, 0), "bias": b_ih[0:H] + b_hh[0:H]},
        "iz": {"kernel": chunk(w_ih, 1), "bias": b_ih[H : 2 * H] + b_hh[H : 2 * H]},
        "in": {"kernel": chunk(w_ih, 2), "bias": b_ih[2 * H : 3 * H]},
        "hr": {"kernel": chunk(w_hh, 0)},
        "hz": {"kernel": chunk(w_hh, 1)},
        "hn": {"kernel": chunk(w_hh, 2), "bias": b_hh[2 * H : 3 * H]},
    }


def convert(sd: dict) -> dict:
    params: dict = {"unet": {}}
    stats: dict = {"unet": {}}

    p, s = _bn(sd, "unet.encoder.bn")
    params["unet"]["in_bn"], stats["unet"]["in_bn"] = p, s

    for i in range(5):
        p, s = _res_encoder_block(sd, f"unet.encoder.layers.{i}", 4)
        params["unet"][f"enc_{i}"], stats["unet"][f"enc_{i}"] = p, s

    for i in range(4):
        p, s = _res_encoder_block(sd, f"unet.intermediate.layers.{i}", 4)
        params["unet"][f"inter_{i}"], stats["unet"][f"inter_{i}"] = p, s

    for i in range(5):
        prefix = f"unet.decoder.layers.{i}"
        dp: dict = {
            "upconv": {
                # ConvTranspose2d [in, out, kh, kw] -> transpose_kernel
                # [kh, kw, out, in]
                "kernel": np.ascontiguousarray(
                    np.asarray(sd[f"{prefix}.conv1.0.weight"]).transpose(2, 3, 1, 0)
                )
            },
        }
        ds: dict = {}
        p, s = _bn(sd, f"{prefix}.conv1.1")
        dp["bn"], ds["bn"] = p, s
        for j in range(4):
            p, s = _conv_block_res(sd, f"{prefix}.conv2.{j}")
            dp[f"block_{j}"], ds[f"block_{j}"] = p, s
        params["unet"][f"dec_{i}"], stats["unet"][f"dec_{i}"] = dp, ds

    params["cnn"] = {
        "kernel": _conv2d(sd, "cnn.weight"),
        "bias": np.asarray(sd["cnn.bias"]),
    }

    params["gru"] = {
        "fwd_cell": _gru_cell(sd, "fc.0.gru", False),
        "bwd_cell": _gru_cell(sd, "fc.0.gru", True),
    }
    params["fc"] = {
        "kernel": np.ascontiguousarray(np.asarray(sd["fc.1.weight"]).T),
        "bias": np.asarray(sd["fc.1.bias"]),
    }

    return {"params": params, "batch_stats": stats}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    sd = torch.load(args.input, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    variables = convert(sd)
    with open(args.output, "wb") as f:
        pickle.dump(variables, f)
    print(f"converted RMVPE ({len(sd)} tensors) -> {args.output}")


if __name__ == "__main__":
    main()
