"""LR scheduler interval semantics.

The reference steps GAN schedulers once per EPOCH
(``archs/hifisinger/hifisinger_v1.py:205-209``: ``scheduler.step()`` on
``trainer.is_last_batch``; same in ``tools/nsf_hifigan/train.py``), while the
diffusion path registers ``interval="step"``
(``archs/diffsinger/diffsinger.py:257``). These tests pin
``lr(step) == base * gamma ** epoch`` for epoch-interval schedules.
"""

import numpy as np
import pytest

from fish_diffusion_tpu.training.optim import build_lr_schedule, build_optimizer


def test_exponential_epoch_interval_matches_gamma_pow_epoch():
    spe = 37  # steps per epoch
    gamma = 0.999
    base_lr = 2e-4
    sched = build_lr_schedule(
        dict(type="ExponentialLR", base_lr=1.0, gamma=gamma, interval="epoch"),
        base_lr,
        steps_per_epoch=spe,
    )
    for step in [0, 1, spe - 1, spe, spe + 1, 5 * spe, 5 * spe + 17, 200 * spe]:
        expected = base_lr * gamma ** (step // spe)
        assert np.isclose(float(sched(step)), expected, rtol=1e-5), step


def test_exponential_epoch_interval_does_not_freeze():
    # the round-1 bug: gamma**step with gamma=0.999 hits 0.1% of base by
    # ~6.9k steps; with per-epoch semantics LR must remain near base
    sched = build_lr_schedule(
        dict(type="ExponentialLR", base_lr=1.0, gamma=0.999, interval="epoch"),
        2e-4,
        steps_per_epoch=500,
    )
    lr_7k = float(sched(7000))
    assert lr_7k > 0.98 * 2e-4 * 0.999**14


def test_step_interval_default_unchanged():
    sched = build_lr_schedule(
        dict(type="StepLR", base_lr=1.0, step_size=100, gamma=0.5), 1e-3
    )
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(99)), 1e-3)
    assert np.isclose(float(sched(100)), 5e-4)
    assert np.isclose(float(sched(250)), 2.5e-4)


def test_epoch_interval_requires_steps_per_epoch():
    with pytest.raises(ValueError, match="steps_per_epoch"):
        build_lr_schedule(
            dict(type="ExponentialLR", base_lr=1.0, gamma=0.999, interval="epoch"),
            1e-4,
        )
    with pytest.raises(ValueError, match="steps_per_epoch"):
        build_optimizer(
            dict(type="AdamW", lr=1e-4),
            dict(type="ExponentialLR", base_lr=1.0, gamma=0.999, interval="epoch"),
        )


def test_bad_interval_rejected():
    with pytest.raises(ValueError, match="interval"):
        build_lr_schedule(
            dict(type="ExponentialLR", base_lr=1.0, gamma=0.999, interval="batch"),
            1e-4,
            steps_per_epoch=10,
        )


def test_epoch_interval_through_optimizer_chain():
    """The full optax chain must apply the per-epoch schedule."""
    import jax.numpy as jnp
    import optax

    spe = 10
    tx = build_optimizer(
        dict(type="SGD", lr=1.0),
        dict(type="ExponentialLR", base_lr=1.0, gamma=0.5, interval="epoch"),
        steps_per_epoch=spe,
    )
    params = {"w": jnp.ones(())}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(())}
    # first epoch: update magnitude 1.0; second epoch: 0.5
    seen = []
    for _ in range(2 * spe):
        updates, opt_state = tx.update(grads, opt_state, params)
        seen.append(float(-updates["w"]))
        params = optax.apply_updates(params, updates)
    assert all(np.isclose(v, 1.0) for v in seen[:spe]), seen[:spe]
    assert all(np.isclose(v, 0.5) for v in seen[spe:]), seen[spe:]
