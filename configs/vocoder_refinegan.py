# Standalone RefineGAN vocoder training (reference configs/vocoder_refinegan.py).

_base_ = ["./vocoder_nsf_hifigan.py"]

model = dict(
    type="RefineGAN",
    generator=dict(
        _delete_=True,
        type="RefineGAN",
        sampling_rate=44100,
        hop_length=256,
        downsample_rates=(2, 2, 8, 8),
        upsample_rates=(8, 8, 2, 2),
        num_mels=128,
        start_channels=16,
    ),
    mrd=dict(
        resolutions=(
            (1024, 120, 600),
            (2048, 240, 1200),
            (512, 50, 240),
        ),
    ),
)

dataset = dict(
    train=dict(hop_length=256),
    valid=dict(hop_length=256),
)
