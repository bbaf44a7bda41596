"""Checkpoint slimming tool (parity with reference
``tools/hifisinger/clean_model.py``): strip optimizer state, discriminators,
and optionally speaker embeddings from a GAN checkpoint pickle."""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--drop-speakers", action="store_true")
    args = parser.parse_args()

    with open(args.input, "rb") as f:
        state = pickle.load(f)

    if hasattr(state, "params_g"):  # GANTrainState
        params = state.params_g
    elif isinstance(state, dict):
        params = state.get("params_g") or state.get("params") or state
    else:
        params = state

    if args.drop_speakers and isinstance(params, dict):
        params = {
            k: v for k, v in params.items() if "speaker_encoder" not in k
        }
        print("[clean_model] dropped speaker embeddings")

    with open(args.output, "wb") as f:
        pickle.dump({"params": params}, f)
    print(f"[clean_model] wrote generator-only checkpoint -> {args.output}")


if __name__ == "__main__":
    main()
