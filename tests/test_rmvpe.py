"""RMVPE port tests: BiGRU numerical parity vs torch GRU, E2E shape."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "preprocessing"))

import jax
import jax.numpy as jnp

from fish_diffusion_tpu.extractors.rmvpe import BiGRU, E2E


class TestBiGRU:
    def test_matches_torch_bigru(self):
        from convert_rmvpe_checkpoint import _gru_cell

        tg = torch.nn.GRU(6, 4, batch_first=True, bidirectional=True)
        sd = {f"fc.0.gru.{k}": v.numpy() for k, v in tg.state_dict().items()}
        params = {
            "fwd_cell": _gru_cell(sd, "fc.0.gru", False),
            "bwd_cell": _gru_cell(sd, "fc.0.gru", True),
        }

        x = np.random.default_rng(0).standard_normal((2, 7, 6)).astype(np.float32)
        with torch.no_grad():
            t_out = tg(torch.from_numpy(x))[0].numpy()
        j_out = np.asarray(BiGRU(4).apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(j_out, t_out, atol=1e-5, rtol=1e-4)


class TestE2EShape:
    def test_salience_shape(self):
        # tiny variant: shrink via monkey config is not possible (fixed arch),
        # so run the real net on a short mel — structure/shape check only
        model = E2E(1, 1)  # 1 block per stage keeps init fast
        mel = jnp.zeros((1, 32, 128))
        variables = model.init(jax.random.PRNGKey(0), mel)
        out = model.apply(variables, mel)
        assert out.shape == (1, 32, 360)
        assert np.isfinite(np.asarray(out)).all()
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
