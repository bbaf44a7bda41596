"""Cross-framework pipeline parity at CI scale.

Drives ``tools/pipeline_parity.py --tiny``: the reference torch chain
(HF hubert contents -> repeat_expand -> NaiveProjectionEncoder condition
assembly -> PLMS reverse diffusion -> NSF-HiFiGAN) against this framework's
production ``DiffSinger.sample`` + vocoder path on the SAME clip, same
converted weights, same initial noise. The production-dims run of the same
tool produces ``docs/artifacts/pipeline_parity_r05.json``.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

REPO = Path(__file__).resolve().parents[1]


def test_pipeline_parity_tiny(tmp_path):
    report_path = tmp_path / "report.json"
    env = dict(os.environ)
    # the subprocess must NEVER attach to the TPU (a second attach wedges a
    # running TPU job — CLAUDE.md), and must not share a compile cache with
    # a concurrently writing process (cache reader hard-aborts)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "jax_cache")
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "pipeline_parity.py"),
            "--tiny",
            "--report",
            str(report_path),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    report = json.loads(report_path.read_text())
    assert report["pass"] is True
    # converted-weight chains must agree to float accuracy pre-vocoder
    assert report["contents_l1"] <= 1e-4
    assert report["mel_l1"] <= 1e-4
    # rendered audio: pitch identical to well under a cent
    assert report["final_audio_f0_dev_cents"] <= 1.0
    assert report["final_audio_f0_voiced_frames"] > 0


def test_pipeline_parity_hifisinger_tiny(tmp_path):
    report_path = tmp_path / "report.json"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "jax_cache")
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "pipeline_parity.py"),
            "--tiny",
            "--arch",
            "hifisinger",
            "--report",
            str(report_path),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    report = json.loads(report_path.read_text())
    assert report["pass"] is True
    # fused condition features through converted encoders + fuser
    assert report["mel_l1"] <= 1e-5
    assert report["final_audio_f0_dev_cents"] <= 1.0
