"""Run an exported StableHLO bundle (parity with reference
``tools/diffusion/onnx/demo.py``: load the exported graphs and synthesize).

Usage:
    python tools/diffusion/export_demo.py --exported exported/ --frames 1024
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exported", required=True)
    parser.add_argument("--params", required=True,
                        help="params pickle matching the export")
    parser.add_argument("--output", default="export_demo.wav")
    args = parser.parse_args()

    import jax
    from jax import export as jax_export
    import pickle

    exported_dir = Path(args.exported)
    manifest = json.loads((exported_dir / "manifest.json").read_text())

    with open(args.params, "rb") as f:
        state = pickle.load(f)
    params = state.get("params", state) if isinstance(state, dict) else state

    graphs = {}
    for name, info in manifest["graphs"].items():
        data = (exported_dir / info["file"]).read_bytes()
        graphs[name] = jax_export.deserialize(data)
        print(f"[demo] loaded {name} ({len(data)} bytes)")

    # synthesize from random condition features (as the reference demo does)
    shapes = manifest["graphs"]["diffusion"]["in_shapes"]
    _, spk_s, cont_s, lens_s, pitch_s, _ = shapes
    rng = np.random.default_rng(0)
    speakers = np.zeros(spk_s, np.int32)
    contents = rng.standard_normal(cont_s).astype(np.float32)
    lens = np.full(lens_s, cont_s[1], np.int32)
    pitches = rng.uniform(150, 400, pitch_s).astype(np.float32)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    mel = graphs["diffusion"].call(params, speakers, contents, lens, pitches, key)
    mel = np.asarray(mel)
    print(f"[demo] diffusion: mel {mel.shape} in {time.perf_counter() - t0:.2f}s")

    if "vocoder" in graphs:
        print("[demo] vocoder graph present; run it with its own params bundle")

    np.save(Path(args.output).with_suffix(".mel.npy"), mel)
    print(f"[demo] saved mel -> {Path(args.output).with_suffix('.mel.npy')}")


if __name__ == "__main__":
    main()
