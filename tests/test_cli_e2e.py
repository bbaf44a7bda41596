"""End-to-end CLI integration: the reference's headline user flow driven
through the actual entry points (SURVEY.md §3 call stacks), not library
imports:

    tools/preprocessing/extract_features.py  (wav -> .npy dicts, §3.2)
    tools/diffusion/train.py                 (train + checkpoint, §3.1)
    tools/diffusion/inference.py             (SVC wav -> wav, §3.3)

Everything runs in subprocesses on CPU with a tiny model, exactly as a user
would invoke the tools (reference tools/preprocessing/extract_features.py,
tools/diffusion/train.py, tools/diffusion/inference.py).
"""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

CONFIG_TEMPLATE = '''
# auto-generated tiny e2e config (test_cli_e2e.py)
sampling_rate = 44100
mel_channels = 128
hidden_size = 64

preprocessing = dict(
    text_features_extractor=dict(
        type="HubertSoft",
        random_init=True,   # deterministic PRNGKey(0) weights in every proc
        num_layers=2,
    ),
    pitch_extractor=dict(
        type="ParselMouthPitchExtractor",
        keep_zeros=False,
    ),
)

model = dict(
    type="DiffSVC",
    diffusion=dict(
        type="GaussianDiffusion",
        mel_channels=mel_channels,
        noise_schedule="linear",
        timesteps=32,
        max_beta=0.01,
        s=0.008,
        noise_loss="smoothed-l1",
        denoiser=dict(
            type="WaveNetDenoiser",
            mel_channels=mel_channels,
            d_encoder=hidden_size,
            residual_channels=32,
            residual_layers=2,
            dilation_cycle=2,
            use_linear_bias=True,
        ),
        sampler_interval=8,
        spec_min=[-5],
        spec_max=[0],
    ),
    text_encoder=dict(
        type="NaiveProjectionEncoder", input_size=256, output_size=hidden_size
    ),
    speaker_encoder=dict(
        type="NaiveProjectionEncoder",
        input_size=4,
        output_size=hidden_size,
        use_embedding=True,
    ),
    pitch_encoder=dict(
        type="NaiveProjectionEncoder",
        input_size=1,
        output_size=hidden_size,
        use_embedding=False,
        preprocessing="pitch_to_scale",
    ),
    vocoder=dict(
        type="NsfHifiGAN",
        checkpoint_path=r"{voc_ckpt}",
        sampling_rate=sampling_rate,
        mel_channels=mel_channels,
        use_natural_log=False,
        generator_config=dict(upsample_initial_channel=32),
    ),
)

dataset = dict(
    train=dict(type="NaiveSVCDataset", path=r"{train_dir}", speaker_id=0),
    valid=dict(type="NaiveSVCDataset", path=r"{valid_dir}", speaker_id=0),
)

dataloader = dict(
    train=dict(batch_size=2, shuffle=True, num_workers=1),
    valid=dict(batch_size=1, shuffle=False, num_workers=1),
)

optimizer = dict(
    type="AdamW", lr=8e-4, weight_decay=1e-2, betas=(0.9, 0.98), eps=1e-9
)
scheduler = dict(type="StepLR", step_size=100, gamma=0.9)

ema_momentum = 0.99

trainer = dict(
    devices=-1,
    gradient_clip_val=0.5,
    log_every_n_steps=1,
    val_check_interval=3,
    max_steps=3,
    precision="bf16-mixed",
    accumulate_grad_batches=1,
    checkpoint=dict(save_top_k=-1),
)
'''


def _synth_voice(seconds: float, f0: float, sr: int = 44100) -> np.ndarray:
    """Voiced synthetic audio: harmonic stack with vibrato + breath noise."""
    t = np.arange(int(seconds * sr)) / sr
    f = f0 * (1 + 0.02 * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(f) / sr
    audio = sum(
        (0.6 / k) * np.sin(k * phase) for k in range(1, 6)
    ) + 0.01 * np.random.default_rng(int(f0)).standard_normal(len(t))
    env = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.05)
    return (0.3 * audio * env).astype(np.float32)


def _run(cmd, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the CLIs run exactly as a single-host user would: one CPU device (the
    # surrounding pytest process exports an 8-virtual-device XLA_FLAGS for
    # the mesh tests, which would otherwise leak into the subprocess and
    # demand batch_size % 8 == 0)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    r = subprocess.run(
        [sys.executable] + cmd,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=str(REPO),
        env=env,
    )
    assert r.returncode == 0, (
        f"$ {' '.join(cmd)}\n--- stdout ---\n{r.stdout[-4000:]}"
        f"\n--- stderr ---\n{r.stderr[-4000:]}"
    )
    return r


@pytest.mark.slow
def test_preprocess_train_infer_cli(tmp_path):
    from fish_diffusion_tpu.utils.audio import load_wav, save_wav

    sr = 44100
    train_dir = tmp_path / "dataset" / "train"
    valid_dir = tmp_path / "dataset" / "valid"
    train_dir.mkdir(parents=True)
    valid_dir.mkdir(parents=True)
    for i, f0 in enumerate((150.0, 220.0, 320.0)):
        save_wav(train_dir / f"clip_{i}.wav", _synth_voice(1.5, f0, sr), sr)
    save_wav(valid_dir / "val.wav", _synth_voice(1.5, 200.0, sr), sr)

    # tiny random-init vocoder checkpoint (the CLI flow needs a loadable
    # vocoder; weights are irrelevant to the pipeline mechanics)
    import jax

    from fish_diffusion_tpu.models.vocoders import NsfHifiGAN

    voc = NsfHifiGAN(
        sampling_rate=sr,
        mel_channels=128,
        use_natural_log=False,
        generator_config=dict(upsample_initial_channel=32),
    )
    voc_ckpt = tmp_path / "vocoder.pkl"
    with open(voc_ckpt, "wb") as f:
        pickle.dump(voc.init_random(jax.random.PRNGKey(0)), f)

    cfg_path = tmp_path / "config_e2e.py"
    cfg_path.write_text(
        CONFIG_TEMPLATE.format(
            voc_ckpt=voc_ckpt, train_dir=train_dir, valid_dir=valid_dir
        )
    )

    # 1. preprocessing CLI (both splits)
    for split in (train_dir, valid_dir):
        _run(
            [
                "tools/preprocessing/extract_features.py",
                "--config", str(cfg_path),
                "--path", str(split),
            ]
        )
    npys = sorted(train_dir.glob("*.data.npy"))
    assert len(npys) == 3
    sample = np.load(npys[0], allow_pickle=True).item()
    assert {"mel", "contents", "pitches", "audio"} <= set(sample)
    assert sample["mel"].shape[0] == 128
    assert sample["contents"].shape == (256, sample["mel"].shape[1])
    assert sample["pitches"].shape == (sample["mel"].shape[1],)
    assert np.isfinite(sample["mel"]).all()
    # voiced synthetic input: the extractor should find nonzero pitch
    assert (sample["pitches"] > 0).mean() > 0.5

    # idempotence (reference :106-108): second run skips existing files
    r = _run(
        [
            "tools/preprocessing/extract_features.py",
            "--config", str(cfg_path),
            "--path", str(train_dir),
        ]
    )
    assert sorted(train_dir.glob("*.data.npy")) == npys

    # 2. training CLI -> checkpoint at max_steps
    log_dir = tmp_path / "logs"
    _run(
        [
            "tools/diffusion/train.py",
            "--config", str(cfg_path),
            "--log-dir", str(log_dir),
            "--name", "e2e",
        ]
    )
    ckpt_dir = log_dir / "e2e" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir()), list(log_dir.rglob("*"))

    # 3. inference CLI: convert one of the clips through the checkpoint
    out_wav = tmp_path / "out.wav"
    _run(
        [
            "tools/diffusion/inference.py",
            "--config", str(cfg_path),
            "--checkpoint", str(ckpt_dir),
            "--input", str(train_dir / "clip_0.wav"),
            "--output", str(out_wav),
            "--speaker", "0",
            "--pitch-adjust", "2",
        ]
    )
    assert out_wav.exists()
    audio, out_sr = load_wav(out_wav)
    ref, _ = load_wav(train_dir / "clip_0.wav")
    assert out_sr == sr
    assert np.isfinite(audio).all()
    assert abs(len(audio) - len(ref)) <= 1
    assert np.abs(audio).max() > 0  # nonsilent
