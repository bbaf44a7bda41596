"""Convert an OpenAI Whisper (or fish aligned-whisper) torch checkpoint's
audio encoder to flax params for
``fish_diffusion_tpu.extractors.whisper.WhisperAudioEncoder`` /
``AlignedWhisper``.

Usage:
    python tools/whisper/convert_whisper_checkpoint.py \
        --input medium.pt --output whisper_flax.pkl
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


def _conv1d(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])  # [out, in, k]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _mha(sd, prefix, n_head):
    """Whisper attention: query/key/value/out Linears (key bias-free)."""
    def split_heads(kernel, bias=None):
        dim = kernel.shape[0]
        hd = dim // n_head
        out = {"kernel": kernel.reshape(dim, n_head, hd)}
        if bias is not None:
            out["bias"] = bias.reshape(n_head, hd)
        return out

    q = _dense(sd, f"{prefix}.query")
    k = _dense(sd, f"{prefix}.key")
    v = _dense(sd, f"{prefix}.value")
    o = _dense(sd, f"{prefix}.out")
    dim = q["kernel"].shape[0]
    hd = dim // n_head

    return {
        "query": split_heads(q["kernel"], q.get("bias")),
        "key": {
            "kernel": k["kernel"].reshape(dim, n_head, hd),
            "bias": k.get("bias", np.zeros(dim, np.float32)).reshape(n_head, hd),
        },
        "value": split_heads(v["kernel"], v.get("bias")),
        "out": {
            "kernel": np.asarray(sd[f"{prefix}.out.weight"]).T.reshape(
                n_head, hd, dim
            ),
            "bias": o["bias"],
        },
    }


def convert_audio_encoder(sd: dict, n_head: int) -> dict:
    params: dict = {
        "conv1": _conv1d(sd, "conv1"),
        "conv2": _conv1d(sd, "conv2"),
        "ln_post": _ln(sd, "ln_post"),
    }
    n_layers = max(int(k.split(".")[1]) for k in sd if k.startswith("blocks.")) + 1
    for i in range(n_layers):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "attn_ln": _ln(sd, f"{p}.attn_ln"),
            "attn": _mha(sd, f"{p}.attn", n_head),
            "mlp_ln": _ln(sd, f"{p}.mlp_ln"),
            "mlp_fc1": _dense(sd, f"{p}.mlp.0"),
            "mlp_fc2": _dense(sd, f"{p}.mlp.2"),
        }
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    cp = torch.load(args.input, map_location="cpu")
    dims = cp.get("dims", {})
    sd = cp.get("model_state_dict", cp.get("state_dict", cp))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    n_head = dims.get("n_audio_head", 6)

    # OpenAI layout: encoder.* ; fish aligned layout: audio_encoder.*
    for root in ("encoder.", "audio_encoder."):
        enc = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
        if enc:
            break
    assert enc, "no audio encoder keys found"

    params = {"audio_encoder": convert_audio_encoder(enc, n_head)}

    # aligned-whisper extras
    for name, flax_name in [
        ("audio_proj", "audio_proj"),
        ("phone_proj", "phone_proj"),
        ("phone_decoder.0", "phone_decoder_1"),
        ("phone_decoder.2", "phone_decoder_2"),
    ]:
        if f"{name}.weight" in sd:
            params[flax_name] = _dense(sd, name)

    out = {"params": params}
    if dims:
        out["dims"] = {
            k: v
            for k, v in dims.items()
            if k in (
                "n_mels", "n_phones", "n_audio_ctx", "n_audio_state",
                "n_audio_head", "n_audio_layer", "n_outputs",
            )
        }

    with open(args.output, "wb") as f:
        pickle.dump(out, f)
    print(f"converted whisper encoder ({len(sd)} tensors) -> {args.output}")


if __name__ == "__main__":
    main()
