"""Convert a reference HiFiSinger (HiFiSVC) torch checkpoint to flax params.

The reference's HiFiSVC checkpoint is a Lightning state dict over
``fish_diffusion/archs/hifisinger/core.py``: ``text_encoder`` /
``speaker_encoder`` (+ optional ``pitch_shift_encoder`` /
``energy_encoder``) NaiveProjectionEncoders, the ``feature_fuser``
(2x Linear + SiLU, core.py:24-29), and ``encoder`` — the waveform
generator (NSF-HiFiGAN ``Generator`` or ``RefineGANGenerator``,
core.py:31-37). Discriminators are training-only and dropped.

Maps onto ``fish_diffusion_tpu.models.hifisinger.HiFiSinger``'s tree:
``text_encoder_mod`` / ``speaker_encoder_mod`` / ... / ``fuser_dense1`` /
``fuser_dense2`` / ``generator``. Weight norm on the generator is folded
at conversion (the reference removes it at load).

Usage:
    python tools/hifisinger/convert_checkpoint.py \
        --input model.ckpt --output hifisvc.pkl [--use-ema]
"""

from __future__ import annotations

import argparse
import importlib.util
import pickle
import sys
from pathlib import Path

import numpy as np

TOOLS = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(TOOLS.parent))


def _load_tool(rel: str, name: str):
    """Load a sibling tool module by explicit path — three tool dirs ship a
    ``convert_checkpoint.py``, so bare imports would collide."""
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, TOOLS / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _dense(sd: dict, prefix: str) -> dict:
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_hifisinger(sd: dict) -> dict:
    """Full HiFiSinger flax params from a (stripped) torch state dict."""
    convert_encoder = _load_tool(
        "diffusion/convert_torch_checkpoint.py", "fd_tpu_convert_diffusion"
    ).convert_encoder

    params: dict = {}
    for enc in ("text_encoder", "speaker_encoder", "pitch_shift_encoder",
                "energy_encoder"):
        if any(k.startswith(f"{enc}.") for k in sd):
            params[f"{enc}_mod"] = convert_encoder(sd, enc)

    # feature_fuser: Sequential(Linear, SiLU, Linear, SiLU) (core.py:24-29)
    params["fuser_dense1"] = _dense(sd, "feature_fuser.0")
    params["fuser_dense2"] = _dense(sd, "feature_fuser.2")

    gen_sd = {
        k[len("encoder."):]: np.asarray(v)
        for k, v in sd.items()
        if k.startswith("encoder.")
    }
    if not gen_sd:
        raise KeyError("no encoder.* (waveform generator) keys in checkpoint")

    if any(k.startswith("template_bank") or ".unet" in k for k in gen_sd) or any(
        "downsample" in k for k in gen_sd
    ):
        params["generator"] = _load_tool(
            "refinegan/convert_checkpoint.py", "fd_tpu_convert_refinegan"
        ).convert_refinegan(gen_sd)
    else:
        nsf_convert = _load_tool(
            "nsf_hifigan/convert_checkpoint.py", "fd_tpu_convert_nsf"
        )

        n_ups = (
            max(
                int(k.split(".")[1])
                for k in gen_sd
                if k.startswith("ups.") and k.split(".")[1].isdigit()
            )
            + 1
        )
        n_kernels = (
            max(
                int(k.split(".")[1])
                for k in gen_sd
                if k.startswith("resblocks.") and k.split(".")[1].isdigit()
            )
            + 1
        ) // n_ups
        params["generator"] = nsf_convert.convert(
            gen_sd, n_ups=n_ups, n_kernels=n_kernels
        )

    return params


def strip_lightning(sd: dict, use_ema: bool = False) -> dict:
    """Select the generator subtree of a Lightning HiFiSinger checkpoint
    (reference hifisinger_v1.py stores ``generator.`` / ``ema_generator.``;
    discriminators are dropped)."""
    for root in (("ema_generator." if use_ema else "generator."), "model."):
        out = {
            k[len(root):]: v for k, v in sd.items() if k.startswith(root)
        }
        if out:
            return out
    return {
        k: v
        for k, v in sd.items()
        if not k.startswith(("mpd.", "mrd.", "msd.", "discriminator"))
    }


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

    params = convert_hifisinger(sd)
    with open(args.output, "wb") as f:
        pickle.dump({"params": params}, f)
    print(f"converted HiFiSinger checkpoint -> {args.output}")


if __name__ == "__main__":
    main()
