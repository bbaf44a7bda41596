# ContentVec SVC finetuning (reference configs/svc_content_vec_finetune.py).

_base_ = ["./svc_content_vec.py", "./_base_/schedulers/warmup_cosine_finetune.py"]

trainer = dict(max_steps=10000)
