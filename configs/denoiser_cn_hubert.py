# Shallow-diffusion denoiser recipe (reference configs/denoiser_cn_hubert.py):
# ConvNeXt denoiser conditioned on mel-aligned chinese-hubert features.

_base_ = [
    "./_base_/archs/diff_svc_v2.py",
    "./_base_/trainers/base.py",
    "./_base_/schedulers/warmup_cosine.py",
    "./_base_/datasets/naive_svc.py",
]

model = dict(
    diffusion=dict(
        denoiser=dict(
            _delete_=True,
            type="ConvNextDenoiser",
            mel_channels=128,
            dim=512,
            mlp_factor=4,
            condition_dim=256,
            num_layers=20,
            dilation_cycle=4,
        ),
    ),
)

dataset = dict(
    train=dict(type="NaiveDenoiserDataset", path="dataset/train"),
    valid=dict(type="NaiveDenoiserDataset", path="dataset/valid"),
)

preprocessing = dict(
    text_features_extractor=dict(
        type="ChineseHubertSoft",
        checkpoint_path="checkpoints/chinese-hubert-soft.pkl",
    ),
    pitch_extractor=dict(type="ParselMouthPitchExtractor", keep_zeros=False),
)
