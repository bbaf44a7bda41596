"""Deployment packaging: one self-contained artifact directory per model.

The reference ships ``tools/diffusion/onnx/export_moess.py`` — an
ONNX-graph layout for the MoeSS Windows desktop app. This framework's
deployment format is StableHLO (see ``export.py``), so the packaged-artifact
story is re-designed instead of ported: this tool bundles the verified
StableHLO graphs with everything a serving host needs to run them —
resolved config, speaker mapping, spec stats, dictionaries, a manifest and
a loading README. See ``docs/pages/faq.md`` ("Where is the MoeSS export?")
for the scope rationale.

Usage:
    python tools/diffusion/export_package.py --config configs/svc_hubert_soft.py \
        --checkpoint ckpt.pkl --output dist/my-voice-v1 [--name my-voice]
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

PACKAGE_FORMAT_VERSION = 1

README_TEMPLATE = """# {name}

Packaged fish-diffusion-tpu voice model (format v{version}).

Contents:
- `model/*.stablehlo` — serialized inference graphs (`jax.export`)
- `model/manifest.json` — graph input shapes
- `config.json` — resolved training/inference config
- `speaker_mapping.json` — speaker name -> id
- `stats.json` — mel normalization stats (spec_min/spec_max)

Load and run a graph:

```python
from jax import export as jax_export
diffusion = jax_export.deserialize(
    open("model/diffusion.stablehlo", "rb").read())
mel = diffusion.call(params, speakers, contents, lens, pitches, key)
```

Or drive the full pipeline with the framework:

```python
from fish_diffusion_tpu.inference.svc import SVCInference
svc = SVCInference.from_package("{name}")
```
"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--name", default=None)
    parser.add_argument("--frames", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--skip-graphs", action="store_true",
                        help="package metadata only (no StableHLO export)")
    args = parser.parse_args()

    from fish_diffusion_tpu.config import Config

    out = Path(args.output)
    (out / "model").mkdir(parents=True, exist_ok=True)
    name = args.name or out.name

    cfg = Config.fromfile(args.config)

    # 1. graphs via export.py (numerically verified there)
    if not args.skip_graphs:
        rc = subprocess.call(
            [
                sys.executable,
                str(Path(__file__).with_name("export.py")),
                "--config", args.config,
                "--checkpoint", args.checkpoint,
                "--output", str(out / "model"),
                "--frames", str(args.frames),
                "--batch", str(args.batch),
            ]
        )
        if rc != 0:
            raise SystemExit(f"graph export failed ({rc})")

    # 2. resolved config (declarative pytree -> json)
    def jsonable(x):
        if isinstance(x, dict):
            return {k: jsonable(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [jsonable(v) for v in x]
        if isinstance(x, (str, int, float, bool)) or x is None:
            return x
        return repr(x)

    (out / "config.json").write_text(json.dumps(jsonable(dict(cfg)), indent=1))

    # 3. speaker mapping + stats + dictionary
    (out / "speaker_mapping.json").write_text(
        json.dumps(cfg.get("speaker_mapping", {}), indent=1)
    )
    diff_cfg = cfg.model.get("diffusion", {})
    stats = {
        "spec_min": diff_cfg.get("spec_min"),
        "spec_max": diff_cfg.get("spec_max"),
    }
    stats_path = diff_cfg.get("spec_stats_path", "dataset/stats.json")
    if stats["spec_min"] is None and Path(stats_path).exists():
        stats = json.loads(Path(stats_path).read_text())
    (out / "stats.json").write_text(json.dumps(stats, indent=1))

    dictionary = cfg.get("phonemes_dictionary", cfg.get("dictionary_path"))
    if dictionary and Path(str(dictionary)).exists():
        shutil.copy(str(dictionary), out / Path(str(dictionary)).name)

    # 4. checkpoint (params travel with the package: StableHLO graphs take
    # params as an input, keeping the artifact weight-surgery friendly)
    shutil.copy(args.checkpoint, out / "checkpoint.pkl")

    # 5. manifest + README
    manifest = {
        "format_version": PACKAGE_FORMAT_VERSION,
        "name": name,
        "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "config": Path(args.config).name,
        "sampling_rate": cfg.model.get("vocoder", {}).get("sampling_rate", 44100),
        "mel_channels": diff_cfg.get("mel_channels", 128),
        "graphs": sorted(p.name for p in (out / "model").glob("*.stablehlo")),
    }
    (out / "package.json").write_text(json.dumps(manifest, indent=1))
    (out / "README.md").write_text(
        README_TEMPLATE.format(name=name, version=PACKAGE_FORMAT_VERSION)
    )
    print(f"[package] wrote {out} ({manifest['graphs'] or 'no graphs'})")


if __name__ == "__main__":
    main()
