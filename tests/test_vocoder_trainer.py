"""VocoderTrainer.fit loop semantics on a tiny NSF-HiFiGAN (CPU).

Pins the loop behaviors the proof runs rely on (reference trainer loop:
``tools/nsf_hifigan/train.py:32-328``): validation fires at the final step
even when max_steps is not a multiple of valid_every, checkpoints are
written, per-interval steps/s is derived from the true step delta, and an
empty loader returns None instead of crashing.
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from fish_diffusion_tpu.config.config import Config
from fish_diffusion_tpu.parallel import make_mesh


def _tiny_config():
    return Config(
        model=dict(
            type="NSFHiFiGAN",
            generator=dict(
                type="NsfHifiGAN",
                num_mels=16,
                sampling_rate=8000,
                hop_size=16,
                upsample_rates=(4, 4),
                upsample_kernel_sizes=(8, 8),
                upsample_initial_channel=16,
                resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 3),),
            ),
            mpd=dict(periods=(2, 3)),
            multi_scale_mels=[(256, 16, 256)],
        ),
        optimizer=dict(type="AdamW", lr=2e-4, betas=(0.8, 0.99)),
        trainer=dict(),
    )


def _loader(n_batches=2, batch=2, segment=2048, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "audio": rng.uniform(-0.5, 0.5, (batch, segment)).astype(np.float32),
            "pitches": np.repeat(
                rng.uniform(110, 440, (batch, segment // 16)), 16, axis=1
            ).astype(np.float32),
        }
        for _ in range(n_batches)
    ]


@pytest.fixture(scope="module")
def trainer_cls():
    from fish_diffusion_tpu.training.vocoder_trainer import VocoderTrainer

    return VocoderTrainer


def test_fit_final_step_validation_and_checkpoint(trainer_cls, tmp_path):
    mesh = make_mesh(
        axis_shapes=(1,), axis_names=("data",), devices=jax.devices()[:1]
    )
    trainer = trainer_cls(_tiny_config(), log_dir=str(tmp_path), mesh=mesh)

    val_steps = []
    orig_validate = trainer.validate
    trainer.validate = lambda state, loader, step: (
        val_steps.append(step),
        orig_validate(state, loader, step),
    )[1]

    state = trainer.fit(
        _loader(),
        max_steps=5,
        valid_loader=_loader(n_batches=1, seed=1),
        valid_every=4,
        log_every=2,
        save_every=4,
    )

    assert int(state.step) == 5
    # validation at the periodic step AND at the final (non-multiple) step
    assert val_steps == [4, 5]
    assert trainer.ckpt.latest_step() == 5

    rows = [
        json.loads(l) for l in open(Path(tmp_path) / "metrics.jsonl")
    ]
    train_rows = [r for r in rows if "loss_g" in r]
    assert train_rows, "no train metrics logged"
    assert all(np.isfinite(r["loss_g"]) for r in train_rows)
    assert all(r["steps_per_sec"] > 0 for r in train_rows)
    # the deferred logger materializes the step-2 and step-4 intervals
    assert [r["step"] for r in train_rows] == [2, 4]
    assert any("valid_mel_l1" in r for r in rows)


def test_fit_with_device_batch_cache(trainer_cls, tmp_path):
    # epoch 1 streams 2 batches, steps 3-6 replay HBM handles
    mesh = make_mesh(
        axis_shapes=(1,), axis_names=("data",), devices=jax.devices()[:1]
    )
    trainer = trainer_cls(_tiny_config(), log_dir=str(tmp_path), mesh=mesh)
    state = trainer.fit(
        _loader(), max_steps=6, log_every=2, save_every=6, cache_batches=True
    )
    assert int(state.step) == 6
    rows = [
        json.loads(l) for l in open(Path(tmp_path) / "metrics.jsonl")
    ]
    train_rows = [r for r in rows if "loss_g" in r]
    assert train_rows and all(
        np.isfinite(r["loss_g"]) for r in train_rows
    )


def test_fit_empty_loader_returns_none(trainer_cls, tmp_path):
    mesh = make_mesh(
        axis_shapes=(1,), axis_names=("data",), devices=jax.devices()[:1]
    )
    trainer = trainer_cls(_tiny_config(), log_dir=str(tmp_path), mesh=mesh)
    assert trainer.fit([], max_steps=3) is None


def test_bf16_discriminator_dtype_same_params_finite_step(trainer_cls, tmp_path):
    """trainer.discriminator_dtype="bfloat16" must keep the param tree
    byte-identical to f32 (params stay f32 — only COMPUTE changes) and
    produce a finite adversarial step. The measured win is 214 -> 172 ms
    per production v1 step on v5e (docs/artifacts/vocoder_step_bf16_r05.json)."""
    import jax.numpy as jnp

    mesh = make_mesh(
        axis_shapes=(1,), axis_names=("data",), devices=jax.devices()[:1]
    )
    # Pin BOTH dtypes explicitly: the trainer default is bfloat16, so an
    # unpinned cfg32 would silently compare bf16 against bf16.
    cfg32 = _tiny_config()
    cfg32.trainer["discriminator_dtype"] = "float32"
    cfg16 = _tiny_config()
    cfg16.trainer["discriminator_dtype"] = "bfloat16"

    t32 = trainer_cls(cfg32, log_dir=str(tmp_path / "f32"), mesh=mesh)
    t16 = trainer_cls(cfg16, log_dir=str(tmp_path / "bf16"), mesh=mesh)
    import jax.numpy as _jnp

    assert t32.discs.mpd.dtype == _jnp.float32
    assert t16.discs.mpd.dtype == _jnp.bfloat16
    batch = _loader(n_batches=1)[0]
    s32 = t32.init_state(batch, seed=0)
    s16 = t16.init_state(batch, seed=0)

    shapes32 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), s32.params_d)
    shapes16 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), s16.params_d)
    assert shapes32 == shapes16  # params f32 in both

    from fish_diffusion_tpu.parallel.distributed import make_global_batch

    sb = make_global_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, t16.mesh
    )
    s16, m = t16._train_step(s16, sb, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_d"])) and np.isfinite(float(m["loss_g"]))
