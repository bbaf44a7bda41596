"""Every shipped config must load (with _base_ merge) and its model must
build through the registries — the capability-matrix smoke test."""

from pathlib import Path

import pytest

from fish_diffusion_tpu.config import Config
from fish_diffusion_tpu.registry import (
    ARCHS,
    DATASETS,
    ENERGY_EXTRACTORS,
    FEATURE_EXTRACTORS,
    PITCH_EXTRACTORS,
)

import fish_diffusion_tpu.extractors  # noqa: F401
import fish_diffusion_tpu.models  # noqa: F401
import fish_diffusion_tpu.datasets  # noqa: F401

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"
CONFIGS = sorted(p.name for p in CONFIG_DIR.glob("*.py"))


@pytest.mark.parametrize("name", CONFIGS)
def test_config_loads_and_model_builds(name):
    cfg = Config.fromfile(CONFIG_DIR / name)

    assert "model" in cfg, f"{name}: no model section"
    assert "trainer" in cfg, f"{name}: no trainer section"

    # the arch must build (flax modules are lazy; no weights needed)
    model_cfg = dict(cfg.model)
    model_cfg.pop("vocoder", None)
    arch_type = model_cfg.get("type")
    assert arch_type in ARCHS or arch_type in (
        "NSFHiFiGAN",
        "RefineGAN",
    ), f"{name}: unknown arch {arch_type}"
    if arch_type in ARCHS:
        ARCHS.build(model_cfg)

    # preprocessing extractor types must be registered
    pre = cfg.get("preprocessing", {}) or {}
    if pre.get("text_features_extractor"):
        t = pre.text_features_extractor["type"]
        assert t in FEATURE_EXTRACTORS, f"{name}: unknown extractor {t}"
    if pre.get("pitch_extractor"):
        t = pre.pitch_extractor["type"]
        assert t in PITCH_EXTRACTORS, f"{name}: unknown pitch extractor {t}"
    if pre.get("energy_extractor"):
        t = pre.energy_extractor["type"]
        assert t in ENERGY_EXTRACTORS, f"{name}: unknown energy extractor {t}"

    # dataset types must be registered
    ds = cfg.get("dataset", {}) or {}
    for split in ("train", "valid"):
        if split in ds and isinstance(ds[split], dict) and "type" in ds[split]:
            t = ds[split]["type"]
            assert t in DATASETS, f"{name}: unknown dataset {t}"


def test_base_merge_override():
    cfg = Config.fromfile(CONFIG_DIR / "svc_content_vec.py")
    # _delete_ replaced the extractor subtree
    assert cfg.preprocessing.text_features_extractor.type == "ContentVec"
    assert "checkpoint_path" in cfg.preprocessing.text_features_extractor
    # inherited from svc_hubert_soft -> diff_svc_v2
    assert cfg.model.diffusion.denoiser.residual_channels == 512


def test_finetune_chain():
    cfg = Config.fromfile(CONFIG_DIR / "svc_content_vec_finetune.py")
    assert cfg.trainer.max_steps == 10000
    assert cfg.scheduler.lr_lambda.max_decay_steps == 5000
