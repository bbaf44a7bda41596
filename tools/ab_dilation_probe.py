"""A/B: static lax.switch dilation shifts vs legacy traced roll+mask,
measured on both the inference forward and the train step, same session.

bench r5 showed train +7% but e2e inference -20% vs the pre-static record;
this isolates whether the static-shift change (not the environment) owns
the inference delta.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fish_diffusion_tpu.models.wavenet import WaveNet

B, T, C, L = 4, 1024, 512, 20


def build(static):
    return WaveNet(
        mel_channels=128,
        d_encoder=256,
        residual_channels=C,
        residual_layers=L,
        dilation_cycle=4,
        dtype=jnp.bfloat16,
        static_dilation_shifts=static,
    )


def timeit(fn, *args, iters=30, warmup=8):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters * 1000


out = {}
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, 128), jnp.float32)
cond = jax.random.normal(rng, (B, T, 256), jnp.float32)
step = jnp.full((B,), 500, jnp.int32)

for name, static in (("static", True), ("traced", False)):
    model = build(static)
    params = jax.jit(model.init)(rng, x, step, cond)["params"]

    @jax.jit
    def fwd(params, x, step, cond, model=model):
        return jnp.sum(
            model.apply({"params": params}, x, step, cond).astype(jnp.float32)
        )

    ms = timeit(fwd, params, x, step, cond)
    out[f"fwd_ms_{name}"] = round(ms, 3)
    print(f"fwd {name}: {ms:.3f} ms", flush=True)

    # 100-eval sampler-style scan (inference regime: fwd under lax.scan)
    @jax.jit
    def sample_scan(params, x, cond, model=model):
        def body(carry, t):
            y = model.apply(
                {"params": params}, carry, jnp.full((B,), t, jnp.int32), cond
            )
            return carry - 0.01 * y.astype(carry.dtype), None

        y, _ = jax.lax.scan(body, x, jnp.arange(100, dtype=jnp.int32))
        return jnp.sum(y)

    ms = timeit(sample_scan, params, x, cond, iters=5, warmup=3)
    out[f"scan100_ms_{name}"] = round(ms, 1)
    print(f"scan100 {name}: {ms:.1f} ms", flush=True)

    # train step (B=20 T=512 like the mfu sweep)
    xt = jax.random.normal(rng, (20, 512, 128), jnp.float32)
    ct = jax.random.normal(rng, (20, 512, 256), jnp.float32)
    st = jnp.full((20,), 500, jnp.int32)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, step, cond, model=model):
        def loss_fn(p):
            y = model.apply({"params": p}, x, step, cond)
            return jnp.mean((y.astype(jnp.float32) - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(8):
        params2, opt2, loss = train_step(params, opt_state, xt, st, ct)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        params2, opt2, loss = train_step(params2, opt2, xt, st, ct)
    float(loss)
    ms = (time.perf_counter() - t0) / 20 * 1000
    out[f"train_ms_{name}"] = round(ms, 2)
    print(f"train {name}: {ms:.2f} ms", flush=True)

print(json.dumps(out), flush=True)
