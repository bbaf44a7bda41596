"""Convert torchcrepe's released ``full.pth``/``tiny.pth`` checkpoint to
flax variables for ``fish_diffusion_tpu.extractors.crepe.CrepePitchExtractor``.

The reference runs torchcrepe directly
(``fish_diffusion/modules/pitch_extractors/crepe.py:11-72``); this framework
uses explicit artifact management instead of torch.hub downloads.

torchcrepe state-dict layout (torchcrepe/model.py):
    conv{i}.weight        [out, in, kh, 1]   i in 1..6
    conv{i}.bias          [out]
    conv{i}_BN.weight / .bias / .running_mean / .running_var
    classifier.weight     [360, in_features]
    classifier.bias       [360]

Usage:
    python tools/preprocessing/convert_crepe_checkpoint.py \
        --input full.pth --output crepe_full.pkl --model full
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

# the exact key set of a torchcrepe checkpoint — used by the converter to
# assert full consumption and by tests as the golden key-list
TORCHCREPE_KEYS = tuple(
    [f"conv{i}.{p}" for i in range(1, 7) for p in ("weight", "bias")]
    + [
        f"conv{i}_BN.{p}"
        for i in range(1, 7)
        for p in ("weight", "bias", "running_mean", "running_var")
    ]
    + ["classifier.weight", "classifier.bias"]
)


def convert_state_dict(sd: dict) -> dict:
    """torchcrepe state dict (numpy-able tensors) -> flax variables dict
    {"params": ..., "batch_stats": ...} for extractors.crepe.Crepe."""
    sd = {
        k: np.asarray(v)
        for k, v in sd.items()
        if "num_batches_tracked" not in k
    }
    unknown = set(sd) - set(TORCHCREPE_KEYS)
    missing = set(TORCHCREPE_KEYS) - set(sd)
    assert not unknown, f"unexpected keys: {sorted(unknown)}"
    assert not missing, f"missing keys: {sorted(missing)}"

    params, stats = {}, {}
    for i in range(1, 7):
        w = sd[f"conv{i}.weight"]  # [out, in, kh, 1]
        assert w.ndim == 4 and w.shape[-1] == 1, w.shape
        # -> flax 1D conv kernel [kh, in, out]
        params[f"conv{i}"] = {
            "kernel": np.ascontiguousarray(w[..., 0].transpose(2, 1, 0)),
            "bias": sd[f"conv{i}.bias"],
        }
        params[f"conv{i}_BN"] = {
            "scale": sd[f"conv{i}_BN.weight"],
            "bias": sd[f"conv{i}_BN.bias"],
        }
        stats[f"conv{i}_BN"] = {
            "mean": sd[f"conv{i}_BN.running_mean"],
            "var": sd[f"conv{i}_BN.running_var"],
        }
    params["classifier"] = {
        "kernel": np.ascontiguousarray(sd["classifier.weight"].T),
        "bias": sd["classifier.bias"],
    }
    return {"params": params, "batch_stats": stats}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="full.pth / tiny.pth")
    parser.add_argument("--output", required=True, help="output .pkl")
    parser.add_argument("--model", default="full", choices=("full", "tiny"))
    parser.add_argument(
        "--verify", action="store_true",
        help="run both nets on random frames and compare (needs torchcrepe)",
    )
    args = parser.parse_args()

    import torch

    sd = torch.load(args.input, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    variables = convert_state_dict(sd)

    # sanity: the flax module accepts the converted tree
    import jax.numpy as jnp

    from fish_diffusion_tpu.extractors.crepe import Crepe

    model = Crepe(capacity=args.model)
    probs = model.apply(
        {k: v for k, v in variables.items()}, jnp.zeros((2, 1024))
    )
    assert probs.shape == (2, 360), probs.shape

    with open(args.output, "wb") as f:
        pickle.dump(variables, f)
    print(f"wrote {args.output} ({args.model}); smoke output shape {probs.shape}")

    if args.verify:
        import torchcrepe  # noqa: F401 — optional, not in this image

        net = torchcrepe.Crepe(args.model)
        net.load_state_dict(torch.load(args.input, map_location="cpu"))
        net.eval()
        x = torch.randn(4, 1024)
        with torch.no_grad():
            ref = net(x).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x.numpy())))
        print("max |diff| vs torchcrepe:", np.abs(ref - got).max())


if __name__ == "__main__":
    main()
