# Exponential decay (reference configs/_base_/schedulers/exponential.py).

optimizer = dict(
    type="AdamW",
    lr=0.0002,
    betas=(0.8, 0.99),
    eps=1e-9,
)

# interval="epoch": the reference GAN trainers step this scheduler once per
# epoch, not per optimizer step (archs/hifisinger/hifisinger_v1.py:205-209,
# tools/nsf_hifigan/train.py) — per-step gamma**step with gamma=0.999 would
# freeze training by ~7k steps.
scheduler = dict(type="ExponentialLR", base_lr=1.0, gamma=0.999, interval="epoch")
