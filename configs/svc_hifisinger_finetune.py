# HiFiSinger finetuning (reference configs/svc_hifisinger_finetune.py).

_base_ = ["./svc_hifisinger.py", "./_base_/schedulers/warmup_cosine_finetune.py"]

trainer = dict(max_steps=20000)
