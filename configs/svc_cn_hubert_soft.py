# Chinese HuBERT-soft SVC (reference configs/svc_cn_hubert_soft.py).

_base_ = ["./svc_hubert_soft.py"]

preprocessing = dict(
    text_features_extractor=dict(
        _delete_=True,
        type="ChineseHubertSoft",
        checkpoint_path="checkpoints/chinese-hubert-soft.pkl",
        gate_size=25,
    ),
)
