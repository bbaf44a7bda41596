# Encodec-token -> mel decoder experiment (reference configs/encodec_decoder.py).

_base_ = [
    "./_base_/archs/diff_svc_v2.py",
    "./_base_/trainers/base.py",
    "./_base_/schedulers/warmup_cosine.py",
    "./_base_/datasets/naive_svc.py",
]

model = dict(
    text_encoder=dict(
        _delete_=True,
        type="NaiveProjectionEncoder",
        input_size=128,
        output_size=256,
    ),
)

preprocessing = dict(
    text_features_extractor=dict(
        type="Encodec",
        first_codebook_only=True,
    ),
    pitch_extractor=dict(type="ParselMouthPitchExtractor", keep_zeros=False),
)
