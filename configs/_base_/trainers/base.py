# Trainer defaults. Parity with reference configs/_base_/trainers/base.py,
# declarative-only: no live strategy objects — the mesh/sharding layer
# (fish_diffusion_tpu.parallel) replaces DDPStrategy/NCCL entirely.

trainer = dict(
    # devices=-1 == all chips on the data axis of the mesh
    devices=-1,
    gradient_clip_val=0.5,
    gradient_clip_algorithm="norm",
    log_every_n_steps=10,
    val_check_interval=5000,
    max_steps=2_000_000,
    # bf16 compute / f32 params (the TPU-native "bf16-mixed")
    precision="bf16-mixed",
    accumulate_grad_batches=1,
    checkpoint=dict(
        save_on_train_epoch_end=False,
        save_top_k=-1,  # keep all checkpoints, one per validation
    ),
)
