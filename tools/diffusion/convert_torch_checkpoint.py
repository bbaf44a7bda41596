"""Convert a torch fish-diffusion DiffSinger checkpoint (Lightning
state_dict) to flax params for this framework's DiffSinger.

Covers the reference checkpoint surface (``tools/diffusion/train.py:48-97``
key layout): NaiveProjectionEncoder text/speaker/pitch encoders + WaveNet
denoiser. The WaveNet residual stack is re-laid-out into the scanned
(stacked leading axis) parameter format; the k=3 dilated conv splits into
the three shifted-matmul taps.

Usage:
    python tools/diffusion/convert_torch_checkpoint.py \
        --input model.ckpt --output params.pkl [--use-ema]
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _dense(sd, prefix):
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _conv1x1_as_dense(sd, prefix):
    """torch Conv1d(k=1) [out, in, 1] -> Dense {kernel [in, out], bias}."""
    w = np.asarray(sd[f"{prefix}.weight"])[:, :, 0]
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_encoder(sd: dict, prefix: str) -> dict:
    """NaiveProjectionEncoder: Linear / Embedding / bottleneck."""
    if f"{prefix}.embedding.weight" in sd:
        return {"embedding": {"embedding": np.asarray(sd[f"{prefix}.embedding.weight"])}}
    if f"{prefix}.projection.weight" in sd:
        return {"projection": _dense(sd, f"{prefix}.projection")}
    if f"{prefix}.projection.0.weight" in sd:
        return {
            "projection_0": _dense(sd, f"{prefix}.projection.0"),
            "projection_1": _dense(sd, f"{prefix}.projection.1"),
        }
    raise KeyError(f"unrecognized encoder layout at {prefix}")


def _wrap(d):
    """Conv1x1/LinearNorm flax wrappers hold one inner auto-named Dense."""
    return {"Dense_0": d}


def convert_wavenet(sd: dict, prefix: str) -> dict:
    """WaveNet denoiser -> scanned-stack flax layout."""
    params: dict = {}
    params["input_projection"] = _wrap(_conv1x1_as_dense(sd, f"{prefix}.input_projection.conv"))
    params["mlp_0"] = _wrap(_dense(sd, f"{prefix}.mlp.0.linear"))
    params["mlp_1"] = _wrap(_dense(sd, f"{prefix}.mlp.2.linear"))
    params["skip_projection"] = _wrap(_conv1x1_as_dense(sd, f"{prefix}.skip_projection.conv"))
    params["output_projection"] = _wrap(_conv1x1_as_dense(sd, f"{prefix}.output_projection.conv"))

    n_layers = (
        max(
            int(k.split(".")[len(prefix.split(".")) + 1])
            for k in sd
            if k.startswith(f"{prefix}.residual_layers.")
        )
        + 1
    )

    # gather per-layer tensors, stack on the leading (scan) axis
    w_left, w_center, w_right, conv_bias = [], [], [], []
    diff_proj_k, diff_proj_b = [], []
    cond_proj_k, cond_proj_b = [], []
    out_proj_k, out_proj_b = [], []

    for i in range(n_layers):
        p = f"{prefix}.residual_layers.{i}"
        w = np.asarray(sd[f"{p}.conv_layer.conv.weight"])  # [2r, r, 3]
        # tap 0 sees x[t-d], tap 1 x[t], tap 2 x[t+d] (symmetric padding d)
        w_left.append(np.ascontiguousarray(w[:, :, 0].T))
        w_center.append(np.ascontiguousarray(w[:, :, 1].T))
        w_right.append(np.ascontiguousarray(w[:, :, 2].T))
        conv_bias.append(np.asarray(sd[f"{p}.conv_layer.conv.bias"]))

        dp = _dense(sd, f"{p}.diffusion_projection.linear")
        diff_proj_k.append(dp["kernel"])
        if "bias" in dp:
            diff_proj_b.append(dp["bias"])

        cp = _conv1x1_as_dense(sd, f"{p}.conditioner_projection.conv")
        cond_proj_k.append(cp["kernel"])
        cond_proj_b.append(cp["bias"])

        op = _conv1x1_as_dense(sd, f"{p}.output_projection.conv")
        out_proj_k.append(op["kernel"])
        out_proj_b.append(op["bias"])

    dp_inner = {"kernel": np.stack(diff_proj_k)}
    if diff_proj_b:
        dp_inner["bias"] = np.stack(diff_proj_b)

    block = {
        "conv_layer": {
            "w_left": {"kernel": np.stack(w_left)},
            "w_center": {"kernel": np.stack(w_center)},
            "w_right": {"kernel": np.stack(w_right)},
            "bias": np.stack(conv_bias),
        },
        "diffusion_projection": _wrap(dp_inner),
        "conditioner_projection": _wrap({
            "kernel": np.stack(cond_proj_k),
            "bias": np.stack(cond_proj_b),
        }),
        "output_projection": _wrap({
            "kernel": np.stack(out_proj_k),
            "bias": np.stack(out_proj_b),
        }),
    }

    params["residual_layers"] = block
    return params


def convert_convnext(sd: dict, prefix: str) -> dict:
    """ConvNext denoiser (no cross-attention) -> scanned-stack flax layout.

    torch layout (reference modules/convnext.py:155-262): input_projection
    conv1, diffusion_embedding Sequential(emb, Linear, GELU, Linear),
    conditioner_projection Sequential(conv1, GELU, conv1), N ConvNeXtBlocks,
    output_projection Sequential(conv1, GELU, conv1).
    """
    params: dict = {}
    params["input_projection"] = _wrap(
        _conv1x1_as_dense(sd, f"{prefix}.input_projection")
    )
    params["diff_mlp1"] = _dense(sd, f"{prefix}.diffusion_embedding.1")
    params["diff_mlp2"] = _dense(sd, f"{prefix}.diffusion_embedding.3")
    params["cond_proj1"] = _wrap(
        _conv1x1_as_dense(sd, f"{prefix}.conditioner_projection.0")
    )
    params["cond_proj2"] = _wrap(
        _conv1x1_as_dense(sd, f"{prefix}.conditioner_projection.2")
    )
    params["out_proj1"] = _wrap(_conv1x1_as_dense(sd, f"{prefix}.output_projection.0"))
    params["out_proj2"] = _wrap(_conv1x1_as_dense(sd, f"{prefix}.output_projection.2"))

    n_layers = (
        max(
            int(k.split(".")[len(prefix.split(".")) + 1])
            for k in sd
            if k.startswith(f"{prefix}.residual_layers.")
        )
        + 1
    )

    stacks: dict = {}

    def push(name, leaf):
        stacks.setdefault(name, []).append(leaf)

    for i in range(n_layers):
        p = f"{prefix}.residual_layers.{i}"
        # depthwise conv7: torch [dim, 1, 7] -> ours [7, dim]
        w = np.asarray(sd[f"{p}.dwconv.weight"])[:, 0, :].T
        push("dw_kernel", np.ascontiguousarray(w))
        push("dw_bias", np.asarray(sd[f"{p}.dwconv.bias"]))
        push("norm_scale", np.asarray(sd[f"{p}.norm.weight"]))
        push("norm_bias", np.asarray(sd[f"{p}.norm.bias"]))
        for t_name, o_name in (
            ("pwconv1", "pwconv1"),
            ("pwconv2", "pwconv2"),
        ):
            d = _dense(sd, f"{p}.{t_name}")
            push(f"{o_name}_kernel", d["kernel"])
            push(f"{o_name}_bias", d["bias"])
        push("gamma", np.asarray(sd[f"{p}.gamma"]))
        for t_name, o_name in (
            ("diffusion_step_projection", "diffusion_step_projection"),
            ("condition_projection", "condition_projection"),
        ):
            d = _conv1x1_as_dense(sd, f"{p}.{t_name}")
            push(f"{o_name}_kernel", d["kernel"])
            push(f"{o_name}_bias", d["bias"])

    s = {k: np.stack(v) for k, v in stacks.items()}
    params["residual_layers"] = {
        "block": {
            "dwconv": {"kernel": s["dw_kernel"], "bias": s["dw_bias"]},
            "norm": {"scale": s["norm_scale"], "bias": s["norm_bias"]},
            "pwconv1": {"kernel": s["pwconv1_kernel"], "bias": s["pwconv1_bias"]},
            "pwconv2": {"kernel": s["pwconv2_kernel"], "bias": s["pwconv2_bias"]},
            "gamma": s["gamma"],
            "diffusion_step_projection": _wrap({
                "kernel": s["diffusion_step_projection_kernel"],
                "bias": s["diffusion_step_projection_bias"],
            }),
            "condition_projection": _wrap({
                "kernel": s["condition_projection_kernel"],
                "bias": s["condition_projection_bias"],
            }),
        }
    }
    return params


def convert_fast_speech(sd: dict, prefix: str, num_heads: int = 2) -> dict:
    """FastSpeech2Encoder -> flax layout (reference fast_speech.py:892-947).

    torch keys: ``proj`` (Linear or Embedding), per layer
    ``layers.{i}.op.{layer_norm1,self_attn,layer_norm2,ffn}``
    (self_attn: fairseq combined in_proj_weight [3h, h], bias-free),
    final ``layer_norm``.
    """
    params: dict = {}
    if f"{prefix}.proj.weight" in sd and np.asarray(
        sd[f"{prefix}.proj.weight"]
    ).ndim == 2 and f"{prefix}.proj.bias" in sd:
        params["proj"] = _dense(sd, f"{prefix}.proj")
    else:  # Embedding
        params["proj"] = {"embedding": np.asarray(sd[f"{prefix}.proj.weight"])}

    n_layers = (
        max(
            int(k.split(".")[len(prefix.split(".")) + 1])
            for k in sd
            if k.startswith(f"{prefix}.layers.")
        )
        + 1
    )

    def mha(p, h):
        hd = h // num_heads
        w = np.asarray(sd[f"{p}.in_proj_weight"])  # [3h, h]
        q, k, v = np.split(w, 3, axis=0)
        out_w = np.asarray(sd[f"{p}.out_proj.weight"])  # [h, h]

        def head_split(m):  # torch [h_out, h_in] -> flax [h_in, nh, hd]
            return np.ascontiguousarray(m.T.reshape(h, num_heads, hd))

        return {
            "query": {"kernel": head_split(q)},
            "key": {"kernel": head_split(k)},
            "value": {"kernel": head_split(v)},
            "out": {"kernel": np.ascontiguousarray(
                out_w.T.reshape(num_heads, hd, h)
            )},
        }

    blocks = {}
    h = np.asarray(sd[f"{prefix}.layers.0.op.layer_norm1.weight"]).shape[0]
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}.op"
        ffn1_w = np.asarray(sd[f"{p}.ffn.ffn_1.weight"])  # [filter, h, k]
        blocks[f"layers_{i}"] = {
            "layer_norm1": {
                "scale": np.asarray(sd[f"{p}.layer_norm1.weight"]),
                "bias": np.asarray(sd[f"{p}.layer_norm1.bias"]),
            },
            "self_attn": mha(f"{p}.self_attn", h),
            "layer_norm2": {
                "scale": np.asarray(sd[f"{p}.layer_norm2.weight"]),
                "bias": np.asarray(sd[f"{p}.layer_norm2.bias"]),
            },
            "ffn": {
                "ffn_1": {
                    "kernel": np.ascontiguousarray(ffn1_w.transpose(2, 1, 0)),
                    "bias": np.asarray(sd[f"{p}.ffn.ffn_1.bias"]),
                },
                "ffn_2": _dense(sd, f"{p}.ffn.ffn_2"),
            },
        }

    fft = dict(blocks)
    if f"{prefix}.layer_norm.weight" in sd:
        fft["layer_norm"] = {
            "scale": np.asarray(sd[f"{prefix}.layer_norm.weight"]),
            "bias": np.asarray(sd[f"{prefix}.layer_norm.bias"]),
        }
    params["fft_blocks"] = fft
    return params


def convert_diffsinger(sd: dict) -> dict:
    """Full DiffSinger params tree from a (stripped) torch state dict."""
    params: dict = {}

    for enc in ("text_encoder", "speaker_encoder", "pitch_encoder",
                "pitch_shift_encoder", "energy_encoder"):
        if any(k.startswith(f"{enc}.") for k in sd):
            params[f"{enc}_mod"] = convert_encoder(sd, enc)

    if any(k.startswith("diffusion.denoise_fn.") for k in sd):
        den = "diffusion.denoise_fn"
        if any(k.startswith(f"{den}.residual_layers.0.dwconv") for k in sd):
            params["diffusion_mod"] = {"denoise_fn": convert_convnext(sd, den)}
        else:
            params["diffusion_mod"] = {"denoise_fn": convert_wavenet(sd, den)}

    return params


def strip_lightning(sd: dict, use_ema: bool = False) -> dict:
    """Drop vocoder keys; select model.* or ema_model.* subtree
    (reference train.py:48-97 surgery)."""
    root = "ema_model." if use_ema else "model."
    out = {}
    for k, v in sd.items():
        if k.startswith("vocoder."):
            continue
        if k.startswith(root):
            out[k[len(root):]] = v
    return out or sd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--use-ema", action="store_true")
    args = parser.parse_args()

    import torch

    cp = torch.load(args.input, map_location="cpu")
    sd = cp.get("state_dict", cp)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    sd = strip_lightning(sd, use_ema=args.use_ema)

    params = convert_diffsinger(sd)

    with open(args.output, "wb") as f:
        pickle.dump({"params": params}, f)
    print(f"converted DiffSinger checkpoint -> {args.output}")


if __name__ == "__main__":
    main()
