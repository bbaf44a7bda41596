"""Re-save just the AlignedWhisper model (parity with reference
``tools/whisper/clean_checkpoint.py``: strips trainer state)."""

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

    cleaned = {
        "params": state.get("params", state),
    }
    if "dims" in state:
        cleaned["dims"] = state["dims"]

    with open(args.output, "wb") as f:
        pickle.dump(cleaned, f)
    print(f"[clean] wrote {args.output}")


if __name__ == "__main__":
    main()
