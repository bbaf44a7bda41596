"""Convert an original Diff-SVC checkpoint to this framework's params.

Capability parity with the reference ``tools/diffusion/diff_svc_converter.py``:
key rewrites (``.conv.`` / ``.linear.`` dropped, ``dilated_conv`` ->
``conv_layer``), residual-channel + spec-stats shape checks, pitch/speaker
embedding restore from the fs2 subtree; output is a flax params pickle
loadable by SVCInference.

Usage:
    python tools/diffusion/diff_svc_converter.py \
        --config configs/svc_hubert_soft_diff_svc.py \
        --input diff_svc.ckpt --output params.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from convert_torch_checkpoint import convert_encoder, convert_wavenet  # noqa: E402


def diff_svc_to_fish_keys(sd: dict) -> dict:
    """Rewrite Diff-SVC denoiser keys into the fish WaveNet layout the
    generic converter understands (reference diff_svc_converter.py:52-58
    inverted)."""
    out = {}
    for k, v in sd.items():
        if not k.startswith("model.denoise_fn."):
            continue
        nk = k[len("model."):]
        nk = nk.replace(".dilated_conv.", ".conv_layer.conv.")
        # fish adds .conv/.linear sublevels the diff-svc layout lacks
        for name in ("input_projection", "skip_projection", "output_projection",
                     "conditioner_projection"):
            nk = nk.replace(f"{name}.weight", f"{name}.conv.weight")
            nk = nk.replace(f"{name}.bias", f"{name}.conv.bias")
        nk = nk.replace("diffusion_projection.weight", "diffusion_projection.linear.weight")
        nk = nk.replace("diffusion_projection.bias", "diffusion_projection.linear.bias")
        nk = nk.replace("mlp.0.weight", "mlp.0.linear.weight")
        nk = nk.replace("mlp.0.bias", "mlp.0.linear.bias")
        nk = nk.replace("mlp.2.weight", "mlp.2.linear.weight")
        nk = nk.replace("mlp.2.bias", "mlp.2.linear.bias")
        out[nk] = v
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    from fish_diffusion_tpu.config import Config

    config = Config.fromfile(args.config)

    cp = torch.load(args.input, map_location="cpu")
    sd = {
        k: v.numpy() if hasattr(v, "numpy") else v
        for k, v in cp["state_dict"].items()
    }

    # shape checks (reference :22-46)
    residual_channels = sd["model.denoise_fn.input_projection.weight"].shape[0]
    cfg_channels = config.model.diffusion.denoiser.residual_channels
    assert residual_channels == cfg_channels, (
        f"residual channels mismatch: ckpt {residual_channels} vs config "
        f"{cfg_channels}; update model.diffusion.denoiser.residual_channels"
    )

    spec_min = sd["model.spec_min"].shape[-1]
    cfg_spec = config.model.diffusion.get("spec_min")
    assert cfg_spec is None or len(cfg_spec) in (1, spec_min), (
        f"spec stats mismatch: ckpt {spec_min} channels"
    )

    fish_sd = diff_svc_to_fish_keys(sd)
    denoiser_params = convert_wavenet(fish_sd, "denoise_fn")

    params = {"diffusion_mod": {"denoise_fn": denoiser_params}}

    # pitch embedding (reference :85-89)
    if "model.fs2.pitch_embed.weight" in sd:
        params["pitch_encoder_mod"] = {
            "embedding": {"embedding": np.asarray(sd["model.fs2.pitch_embed.weight"])}
        }

    # speaker embedding
    if "model.fs2.spk_embed_proj.weight" in sd:
        params["speaker_encoder_mod"] = {
            "embedding": {
                "embedding": np.asarray(sd["model.fs2.spk_embed_proj.weight"])
            }
        }

    with open(args.output, "wb") as f:
        pickle.dump({"params": params}, f)
    print(f"converted Diff-SVC checkpoint ({residual_channels} channels) -> "
          f"{args.output}")
    print("note: spec_min/spec_max from the ckpt should be set in the config: ",
          np.asarray(sd["model.spec_min"]).reshape(-1)[:4], "...")


if __name__ == "__main__":
    main()
