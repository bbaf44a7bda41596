# Exponential decay (reference configs/_base_/schedulers/exponential.py).

optimizer = dict(
    type="AdamW",
    lr=0.0002,
    betas=(0.8, 0.99),
    eps=1e-9,
)

scheduler = dict(type="ExponentialLR", base_lr=1.0, gamma=0.999)
