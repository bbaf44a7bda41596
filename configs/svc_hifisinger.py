# HiFiSinger v1 GAN SVC (reference configs/svc_hifisinger.py).

_base_ = [
    "./_base_/archs/hifi_svc.py",
    "./_base_/trainers/base.py",
    "./_base_/schedulers/exponential.py",
    "./_base_/datasets/hifi_svc.py",
]

preprocessing = dict(
    text_features_extractor=dict(type="HubertSoft"),
    pitch_extractor=dict(type="ParselMouthPitchExtractor", keep_zeros=True),
    energy_extractor=dict(type="RMSEnergyExtractor"),
    augmentations=[
        dict(type="RandomPitchShifting", key_shifts=[-5.0, 5.0], probability=0.75),
        dict(type="RandomTimeStretching", factors=[0.8, 1.2], probability=0.75),
    ],
)

trainer = dict(
    # manual-optimization GAN: no global-norm clipping
    # (reference configs/svc_hifisinger.py:46)
    gradient_clip_val=None,
    precision="32-true",
)
