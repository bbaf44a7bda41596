# TTS baseline: GradTTS + LlamaDenoiser + ADaMoS vocoder
# (reference configs/tts_baseline.py).

_base_ = [
    "./_base_/trainers/base.py",
    "./_base_/schedulers/warmup_cosine.py",
]

sampling_rate = 44100
mel_channels = 128

model = dict(
    type="GradTTS",
    gradient_checkpointing=True,
    diffusion=dict(
        type="GaussianDiffusion",
        mel_channels=mel_channels,
        noise_schedule="linear",
        timesteps=1000,
        max_beta=0.01,
        s=0.008,
        noise_loss="l1",
        denoiser=dict(
            type="LlamaDenoiser",
            diffusion_channels=mel_channels,
            hidden_size=768,
            intermediate_size=768 * 4,
            num_attention_heads=16,
            num_hidden_layers=24,
            rms_norm_eps=1e-05,
            vocab_size=32000,
        ),
        sampler_interval=10,
        spec_min=[-5],
        spec_max=[0],
    ),
    vocoder=dict(
        type="ADaMoSHiFiGANV1",
        use_natural_log=False,
        checkpoint_path="checkpoints/adamos/adamos.pkl",
    ),
)

dataset = dict(
    train=dict(type="NaiveTTSDataset", path="dataset/train", speaker_id=0),
    valid=dict(type="NaiveTTSDataset", path="dataset/valid", speaker_id=0),
)

dataloader = dict(
    train=dict(batch_size=4, shuffle=True, num_workers=2),
    valid=dict(batch_size=8, shuffle=False, num_workers=2),
)

trainer = dict(accumulate_grad_batches=4)

preprocessing = dict(
    text_features_extractor=dict(type="LlamaTokenizer"),
    pitch_extractor=None,
)
