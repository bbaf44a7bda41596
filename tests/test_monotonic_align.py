"""Monotonic-align tests: JAX scan version and C++ native version vs the
numpy golden DP (which mirrors the reference numba kernel exactly)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fish_diffusion_tpu.ops.monotonic_align import (
    maximum_path,
    maximum_path_from_mask,
    maximum_path_numpy,
)


def random_case(seed, B=3, T_y=24, T_x=10):
    rng = np.random.default_rng(seed)
    values = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    t_ys = rng.integers(T_x, T_y + 1, B).astype(np.int32)  # t_y >= t_x
    t_xs = rng.integers(2, T_x + 1, B).astype(np.int32)
    t_ys = np.maximum(t_ys, t_xs)  # feasible: enough frames for every phone
    return values, t_ys, t_xs


class TestGolden:
    def test_path_properties(self):
        values, t_ys, t_xs = random_case(0)
        paths = maximum_path_numpy(values, t_ys, t_xs)
        for b in range(len(t_ys)):
            p = paths[b, : t_ys[b], : t_xs[b]]
            # one phone per frame
            np.testing.assert_array_equal(p.sum(axis=1), 1)
            # monotonic, starts at 0, ends at t_x-1
            cols = p.argmax(axis=1)
            assert cols[0] == 0 and cols[-1] == t_xs[b] - 1
            assert ((np.diff(cols) == 0) | (np.diff(cols) == 1)).all()


class TestJaxVersion:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_golden(self, seed):
        values, t_ys, t_xs = random_case(seed)
        expected = maximum_path_numpy(values, t_ys, t_xs)
        got = np.asarray(
            maximum_path(jnp.asarray(values), jnp.asarray(t_ys), jnp.asarray(t_xs))
        )
        np.testing.assert_array_equal(got, expected)

    def test_mask_interface(self):
        values, t_ys, t_xs = random_case(7)
        B, T_y, T_x = values.shape
        mask = (
            (np.arange(T_y)[None, :, None] < t_ys[:, None, None])
            & (np.arange(T_x)[None, None, :] < t_xs[:, None, None])
        )
        expected = maximum_path_numpy(values, t_ys, t_xs)
        got = np.asarray(
            maximum_path_from_mask(jnp.asarray(values), jnp.asarray(mask))
        )
        np.testing.assert_array_equal(got.astype(np.int32), expected)


class TestNativeVersion:
    @pytest.mark.parametrize("seed", [0, 5])
    def test_matches_golden(self, seed):
        pytest.importorskip("ctypes")
        try:
            from fish_diffusion_tpu.native import maximum_path_native
        except Exception as e:  # no g++ available
            pytest.skip(f"native build unavailable: {e}")

        values, t_ys, t_xs = random_case(seed, B=8)
        expected = maximum_path_numpy(values, t_ys, t_xs)
        got = maximum_path_native(values, t_ys, t_xs)
        np.testing.assert_array_equal(got, expected)
