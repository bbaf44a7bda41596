# ContentVec SVC (reference configs/svc_content_vec.py).

_base_ = ["./svc_hubert_soft.py"]

preprocessing = dict(
    text_features_extractor=dict(
        _delete_=True,
        type="ContentVec",
        checkpoint_path="checkpoints/content-vec-best-legacy-500.pkl",
    ),
)
