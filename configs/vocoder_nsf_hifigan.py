# Standalone NSF-HiFiGAN vocoder training (reference
# configs/vocoder_nsf_hifigan.py + tools/nsf_hifigan/config_v1.json).

_base_ = [
    "./_base_/trainers/base.py",
    "./_base_/schedulers/exponential.py",
]

sampling_rate = 44100

model = dict(
    type="NSFHiFiGAN",
    generator=dict(
        type="NsfHifiGAN",
        num_mels=128,
        sampling_rate=sampling_rate,
        hop_size=512,
        resblock="1",
        upsample_rates=(8, 8, 2, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4, 4),
        upsample_initial_channel=512,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    ),
    mpd=dict(periods=(2, 3, 5, 7, 11)),
    multi_scale_mels=[
        (2048, 512, 2048),
        (2048, 270, 1080),
        (4096, 540, 2160),
    ],
)

dataset = dict(
    train=dict(
        type="NaiveVOCODERDataset",
        path="dataset/vocoder/train",
        segment_size=32768,
        pitch_shift=[-12, 12],
        loudness_shift=[0.1, 0.9],
        sampling_rate=sampling_rate,
        hop_length=512,
    ),
    valid=dict(
        type="NaiveVOCODERDataset",
        path="dataset/vocoder/valid",
        segment_size=None,
        sampling_rate=sampling_rate,
        hop_length=512,
    ),
)

dataloader = dict(
    train=dict(batch_size=16, shuffle=True, num_workers=2),
    valid=dict(batch_size=2, shuffle=False, num_workers=2),
)

preprocessing = dict(
    pitch_extractor=dict(type="ParselMouthPitchExtractor", keep_zeros=True),
)
