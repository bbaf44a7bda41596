# HiFiSVC v1: NSF-HiFiGAN waveform decoder + MPD/MSD discriminators
# (reference configs/_base_/archs/hifi_svc.py).

sampling_rate = 44100
hidden_size = 256

model = dict(
    type="HiFiSVC",
    hidden_size=hidden_size,
    text_encoder=dict(
        type="NaiveProjectionEncoder",
        input_size=256,
        output_size=hidden_size,
    ),
    speaker_encoder=dict(
        type="NaiveProjectionEncoder",
        input_size=10,
        output_size=hidden_size,
        use_embedding=True,
    ),
    pitch_encoder=dict(
        type="NaiveProjectionEncoder",
        input_size=1,
        output_size=hidden_size,
        use_embedding=False,
        preprocessing="pitch_to_log",
    ),
    pitch_shift_encoder=dict(
        type="NaiveProjectionEncoder",
        input_size=1,
        output_size=hidden_size,
        use_embedding=False,
    ),
    energy_encoder=dict(
        type="NaiveProjectionEncoder",
        input_size=1,
        output_size=hidden_size,
        use_embedding=False,
    ),
    encoder=dict(
        type="HiFiGAN",
        num_mels=hidden_size,
        sampling_rate=sampling_rate,
        hop_size=512,
        resblock="1",
        upsample_rates=(8, 8, 2, 2, 2),
        upsample_kernel_sizes=(16, 16, 8, 2, 2),
        upsample_initial_channel=512,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    ),
    mpd=dict(periods=(3, 5, 7, 11, 17, 23, 37)),
    multi_scale_mels=[
        (2048, 512, 2048),
        (2048, 270, 1080),
        (4096, 540, 2160),
    ],
)
