# HuBERT-soft SVC — the reference's primary single-speaker recipe
# (reference configs/svc_hubert_soft.py).

_base_ = [
    "./_base_/archs/diff_svc_v2.py",
    "./_base_/trainers/base.py",
    "./_base_/schedulers/warmup_cosine.py",
    "./_base_/datasets/naive_svc.py",
]

preprocessing = dict(
    text_features_extractor=dict(
        type="HubertSoft",
    ),
    pitch_extractor=dict(
        # ParselMouth-class CPU extractor is much faster than Crepe; the
        # TPU-native default is the on-device autocorrelation extractor
        type="HarvestPitchExtractor",
        keep_zeros=False,
    ),
)
