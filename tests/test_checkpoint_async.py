"""Async CheckpointManager semantics (training/checkpoint.py).

The manager snapshots state by reference and writes in a background
thread so the device→host pull overlaps training (the reference's
Lightning ModelCheckpoint equivalent, ``configs/_base_/trainers/
base.py:21-25``). These tests pin: snapshot consistency while the
"training" state keeps advancing, read-barrier semantics, back-to-back
saves, sync fallback, and error propagation through ``wait``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fish_diffusion_tpu.training.checkpoint import CheckpointManager
from fish_diffusion_tpu.training.state import TrainState


def _state(step: int, value: float) -> TrainState:
    params = {"w": jnp.full((4, 4), value, jnp.float32)}
    opt = optax.adam(1e-3)
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params={"w": jnp.full((4, 4), value / 2, jnp.float32)},
    )


class TestAsyncCheckpoint:
    def test_snapshot_consistent_while_state_advances(self, tmp_path):
        mngr = CheckpointManager(tmp_path)
        s1 = _state(1, 1.0)
        mngr.save(s1, {"valid_loss": 0.5})
        # "training continues": build newer states immediately after save
        s2 = jax.tree_util.tree_map(lambda a: a * 10, s1)
        del s1
        mngr.wait()
        restored = mngr.restore(_state(0, 0.0), step=1)
        np.testing.assert_array_equal(np.asarray(restored.params["w"]), 1.0)
        np.testing.assert_array_equal(np.asarray(s2.params["w"]), 10.0)
        mngr.close()

    def test_survives_buffer_donation(self, tmp_path):
        """The train step donates its input state; the async writer must
        hold a snapshot that survives the donated buffers' deletion."""

        @jax.jit
        def advance(s):
            return jax.tree_util.tree_map(lambda a: a * 2, s)

        donating = jax.jit(advance, donate_argnums=0)

        mngr = CheckpointManager(tmp_path)
        s = _state(5, 3.0)
        mngr.save(s)
        s = donating(s)  # deletes s's buffers once the writer would read
        jax.block_until_ready(s)
        mngr.wait()
        restored = mngr.restore(_state(0, 0.0), step=5)
        np.testing.assert_array_equal(np.asarray(restored.params["w"]), 3.0)
        mngr.close()

    def test_back_to_back_saves_both_durable(self, tmp_path):
        mngr = CheckpointManager(tmp_path)
        mngr.save(_state(1, 1.0))
        mngr.save(_state(2, 2.0))  # waits for #1, then queues #2
        assert mngr.latest_step() == 2
        r1 = mngr.restore(_state(0, 0.0), step=1)
        r2 = mngr.restore(_state(0, 0.0), step=2)
        np.testing.assert_array_equal(np.asarray(r1.params["w"]), 1.0)
        np.testing.assert_array_equal(np.asarray(r2.params["w"]), 2.0)
        mngr.close()

    def test_close_barriers_pending_write(self, tmp_path):
        mngr = CheckpointManager(tmp_path)
        mngr.save(_state(7, 3.0))
        mngr.close()
        mngr2 = CheckpointManager(tmp_path)
        assert mngr2.latest_step() == 7
        mngr2.close()

    def test_sync_mode(self, tmp_path):
        mngr = CheckpointManager(tmp_path, async_save=False)
        mngr.save(_state(3, 4.0))
        assert mngr._pending is None
        assert mngr.latest_step() == 3
        mngr.close()

    def test_save_interval_thinning_and_force(self, tmp_path):
        """``every_n_train_steps`` equivalent: sub-interval saves are
        skipped (including their D2H pull), ``force=True`` always lands."""
        mngr = CheckpointManager(tmp_path, save_interval_steps=10)
        mngr.save(_state(7, 0.5))  # off-cadence FIRST save is thinned too
        assert mngr.latest_step() is None
        mngr.save(_state(10, 1.0))
        mngr.save(_state(14, 2.0))  # thinned
        assert mngr.latest_step() == 10
        mngr.save(_state(17, 3.0), force=True)  # final-save semantics
        assert mngr.latest_step() == 17
        assert mngr.stats["saves"] == 2
        assert mngr.stats["pull_bytes"] > 0
        mngr.close()

    def test_force_resave_of_existing_step_is_idempotent(self, tmp_path):
        """fit()'s final force-save lands on the same step an interval save
        just wrote; orbax raises StepAlreadyExistsError unless the manager
        skips the duplicate (seen live in the r5 vocoder trend run)."""
        mngr = CheckpointManager(tmp_path, save_interval_steps=10)
        mngr.save(_state(10, 1.0))
        assert mngr.latest_step() == 10
        mngr.save(_state(10, 1.0), force=True)  # must not raise
        mngr.wait()
        assert mngr.latest_step() == 10
        assert mngr.stats["saves"] == 1  # duplicate skipped before the pull
        mngr.close()

    def test_stale_step_from_previous_run_is_overwritten(self, tmp_path):
        """A NEW manager on a dirty directory (previous run's checkpoint at
        the same step) must overwrite the stale step, not silently keep old
        params while reporting the save as durable. The within-run duplicate
        skip (test above) must not extend to steps another run wrote."""
        prev = CheckpointManager(tmp_path)
        prev.save(_state(10, 1.0))
        prev.close()

        mngr = CheckpointManager(tmp_path)  # fresh run, same log_dir
        mngr.save(_state(10, 99.0), force=True)
        mngr.wait()
        restored = mngr.restore(_state(0, 0.0), step=10)
        np.testing.assert_array_equal(np.asarray(restored.params["w"]), 99.0)
        assert mngr.stats["saves"] == 1  # actually written, not skipped
        mngr.close()

    def test_save_error_surfaces_on_wait(self, tmp_path):
        mngr = CheckpointManager(tmp_path)
        mngr.save(_state(1, 1.0), metrics={"bad": "not-a-float"})
        with pytest.raises(Exception):
            mngr.wait()
        # manager still usable afterwards
        mngr.save(_state(2, 2.0))
        assert mngr.latest_step() == 2
        mngr.close()
