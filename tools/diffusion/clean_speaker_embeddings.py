"""Strip speaker embeddings from a diffusion checkpoint (parity with
reference ``tools/diffusion/clean_speaker_embeddings.py``)."""

from __future__ import annotations

import argparse
import pickle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    with open(args.input, "rb") as f:
        state = pickle.load(f)

    params = state.get("params", state) if isinstance(state, dict) else state
    params = {k: v for k, v in params.items() if "speaker_encoder" not in k}

    with open(args.output, "wb") as f:
        pickle.dump({"params": params}, f)
    print(f"[clean] wrote {args.output} (speaker embeddings removed)")


if __name__ == "__main__":
    main()
