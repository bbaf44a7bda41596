"""Package a trained vocoder into a distributable folder (parity with
reference ``tools/nsf_hifigan/export.py``: ckpt + config + license)."""

from __future__ import annotations

import argparse
import json
import pickle
import shutil
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True,
                        help="trainer checkpoint (orbax dir or pickle)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--output", default="exported_vocoder")
    parser.add_argument("--license", default=None)
    args = parser.parse_args()

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    ckpt = Path(args.checkpoint)
    if ckpt.is_file():
        with open(ckpt, "rb") as f:
            state = pickle.load(f)
        params = (
            state.get("params_g") or state.get("params")
            if isinstance(state, dict)
            else state
        )
    else:
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(ckpt.absolute())
        restored = mngr.restore(mngr.latest_step())
        params = restored.get("params_g") or restored.get("params")
        mngr.close()

    with open(out / "model.pkl", "wb") as f:
        pickle.dump(params, f)

    shutil.copy2(args.config, out / "config.py")
    if args.license:
        shutil.copy2(args.license, out / "LICENSE")

    manifest = {
        "framework": "fish_diffusion_tpu",
        "format": "flax-params-pickle",
        "entry": "model.pkl",
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"[export] packaged vocoder -> {out}")


if __name__ == "__main__":
    main()
