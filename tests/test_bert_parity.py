"""Trainable BertEncoder parity vs transformers' BertModel.

The reference's BertEncoder is an nn.Module wrapping HF AutoModel
(``modules/encoders/bert.py:10-44``); this framework's flax port must
produce the same last_hidden_state from converted weights, honor the
attention-mask zeroing, jit, and take gradients.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from fish_diffusion_tpu.models.encoders import BertEncoder

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from tools.tts.convert_bert_checkpoint import convert_state_dict  # noqa: E402

CFG = dict(
    vocab_size=97,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=57,
    max_position_embeddings=64,
    type_vocab_size=2,
    hidden_act="gelu",
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def _make_pair(seed=0):
    torch.manual_seed(seed)
    hf = transformers.BertModel(transformers.BertConfig(**CFG))
    hf.eval()
    params = convert_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()},
        CFG["num_hidden_layers"],
    )
    mine = BertEncoder(
        vocab_size=CFG["vocab_size"],
        hidden_size=CFG["hidden_size"],
        num_layers=CFG["num_hidden_layers"],
        num_heads=CFG["num_attention_heads"],
        intermediate_size=CFG["intermediate_size"],
        max_position_embeddings=CFG["max_position_embeddings"],
    )
    return hf, mine, {"params": params}


def test_last_hidden_state_parity():
    hf, mine, variables = _make_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG["vocab_size"], size=(3, 11))
    # ragged attention masks (True = padding in this framework)
    pad = np.zeros((3, 11), bool)
    pad[1, 8:] = True
    pad[2, 5:] = True
    attn = (~pad).astype(np.int64)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(attn),
        ).last_hidden_state.numpy()
    ref = ref * attn[:, :, None]  # the reference encoder masks the output

    got = np.asarray(
        mine.apply(variables, jnp.asarray(ids), jnp.asarray(pad))
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_jit_and_gradients():
    """The port must do what the reference wrapper could not: jit + grad."""
    _, mine, variables = _make_pair(seed=1)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 97, size=(2, 7)))

    @jax.jit
    def loss_fn(params):
        out = mine.apply({"params": params}, ids)
        return jnp.mean(out**2)

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_output_projection():
    mine = BertEncoder(
        vocab_size=50,
        hidden_size=32,
        num_layers=1,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=16,
        output_size=20,
    )
    ids = jnp.zeros((2, 5), jnp.int32)
    variables = mine.init(jax.random.PRNGKey(0), ids)
    out = mine.apply(variables, ids)
    assert out.shape == (2, 5, 20)
