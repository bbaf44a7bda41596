"""Deployment package layout (tools/diffusion/export_package.py — the
MoeSS-folder-equivalent artifact story, see docs/pages/faq.md)."""

import json
import pickle
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_package_metadata_layout(tmp_path):
    ckpt = tmp_path / "ckpt.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"params": {}}, f)

    out = tmp_path / "pkg"
    rc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools/diffusion/export_package.py"),
            "--config", str(REPO / "configs/svc_hubert_soft.py"),
            "--checkpoint", str(ckpt),
            "--output", str(out),
            "--name", "test-voice",
            "--skip-graphs",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr

    manifest = json.loads((out / "package.json").read_text())
    assert manifest["format_version"] == 1
    assert manifest["name"] == "test-voice"
    assert manifest["sampling_rate"] == 44100

    cfg = json.loads((out / "config.json").read_text())
    assert cfg["model"]["type"] in ("DiffSVC", "DiffSinger")
    assert (out / "checkpoint.pkl").exists()
    assert (out / "speaker_mapping.json").exists()
    assert (out / "stats.json").exists()
    assert "stablehlo" in (out / "README.md").read_text()
