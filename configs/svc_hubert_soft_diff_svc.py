# Diff-SVC-compatible config (reference configs/svc_hubert_soft_diff_svc.py):
# v1 arch + 768-d hubert + coarse pitch embedding, for converted diff-svc
# checkpoints.

_base_ = [
    "./_base_/archs/diff_svc.py",
    "./_base_/trainers/base.py",
    "./_base_/schedulers/warmup_cosine.py",
    "./_base_/datasets/naive_svc.py",
]

model = dict(
    text_encoder=dict(
        _delete_=True,
        type="NaiveProjectionEncoder",
        input_size=768,
        output_size=256,
    ),
    pitch_encoder=dict(
        _delete_=True,
        type="NaiveProjectionEncoder",
        input_size=300,
        output_size=256,
        use_embedding=True,
        preprocessing="pitch_to_coarse",
    ),
    diffusion=dict(
        denoiser=dict(
            residual_channels=384,
        ),
        spec_min=[-5],
        spec_max=[0],
    ),
)

preprocessing = dict(
    text_features_extractor=dict(type="HubertSoft"),
    pitch_extractor=dict(type="ParselMouthPitchExtractor", keep_zeros=False),
)
