# HiFiSinger v2 (RefineGAN) SVC (reference configs/svc_hifisinger_v2.py).

_base_ = [
    "./_base_/archs/hifi_svc_v2.py",
    "./_base_/trainers/base.py",
    "./_base_/schedulers/exponential.py",
    "./_base_/datasets/hifi_svc.py",
]

preprocessing = dict(
    text_features_extractor=dict(
        type="ChineseHubertSoft",
        checkpoint_path="checkpoints/chinese-hubert-soft.pkl",
    ),
    pitch_extractor=dict(type="ParselMouthPitchExtractor", keep_zeros=True),
    energy_extractor=dict(type="RMSEnergyExtractor"),
)

dataset = dict(
    train=dict(segment_size=32768, hop_length=256),
    valid=dict(hop_length=256),
)

trainer = dict(
    gradient_clip_val=None,
    precision="32-true",  # GAN stability (reference svc_hifisinger_v2.py:112)
)
