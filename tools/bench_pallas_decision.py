"""Decision benchmark for the fused Pallas WaveNet block (VERDICT r1 weak #3).

Times the reverse-diffusion hot loop — repeated WaveNet denoiser evals with a
hoisted conditioner (exactly the sampling path bench.py exercises) — with the
XLA ``nn.scan`` block stack vs the Pallas ``fused_residual_block`` kernel, on
the real TPU at bench shapes (B=4, T=1024, C=512, 20 layers, bf16).

Methodology matches bench.py: the jitted program chains K denoiser evals in a
``lax.scan`` (output feeds back as input so nothing is dead-code-eliminated)
and reduces to ONE scalar on device; only that 4-byte scalar crosses the
~30 MB/s tunnel. Warmup >5 iters to clear compile/tunnel transients.

Usage:  python tools/bench_pallas_decision.py
Prints one JSON line; the keep-or-delete call is recorded in
docs/pages/architecture.md.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fish_diffusion_tpu.models.wavenet import WaveNet


def bench_variant(use_pallas: bool, B=4, T=1024, C=512, L=20, K=25, reps=8):
    dt = jnp.bfloat16
    net = WaveNet(
        mel_channels=128,
        d_encoder=256,
        residual_channels=C,
        residual_layers=L,
        dilation_cycle=4,
        use_linear_bias=True,
        dtype=dt,
        use_pallas=use_pallas,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, 128)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, T, 256)), jnp.float32)

    variables = jax.jit(WaveNet(
        mel_channels=128, d_encoder=256, residual_channels=C,
        residual_layers=L, dilation_cycle=4, use_linear_bias=True, dtype=dt,
    ).init)(jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), cond)

    @jax.jit
    def loop(params, x0, cond):
        cond_stack = net.apply(
            {"params": params}, cond, method=net.project_conditioner
        )

        def body(x, t):
            out = net.apply(
                {"params": params},
                x,
                jnp.full((B,), t, jnp.int32),
                cond_stack,
                cond_is_projected=True,
            )
            return 0.5 * (x + out), None

        x, _ = jax.lax.scan(body, x0, jnp.arange(K, dtype=jnp.int32))
        return jnp.sum(x.astype(jnp.float32))

    params = variables["params"]
    for i in range(6):
        s = loop(params, x0, cond)
    assert np.isfinite(float(s))

    start = time.perf_counter()
    for i in range(reps):
        s = loop(params, x0, cond)
    _ = float(s)
    elapsed = time.perf_counter() - start
    evals = reps * K
    sec_per_eval = elapsed / evals
    # FLOPs per denoiser eval (matmuls only): per block 3 tap GEMMs
    # [B*T,C]x[C,2C] + out GEMM [B*T,C]x[C,2C]; + in/skip/out projections.
    flops_block = 2 * B * T * C * 2 * C * 4
    flops = L * flops_block + 2 * B * T * (128 * C + C * C + C * 128)
    return {
        "sec_per_eval": round(sec_per_eval, 6),
        "evals_per_sec": round(1.0 / sec_per_eval, 2),
        "tflops": round(flops / sec_per_eval / 1e12, 2),
    }


def main():
    results = {}
    for name, flag in (("xla_scan", False), ("pallas_fused", True)):
        results[name] = bench_variant(flag)
        print(f"# {name}: {results[name]}", flush=True)
    speedup = (
        results["xla_scan"]["sec_per_eval"]
        / results["pallas_fused"]["sec_per_eval"]
    )
    print(
        json.dumps(
            {
                "metric": "pallas_vs_scan_denoiser_eval",
                "backend": jax.default_backend(),
                **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
                "pallas_speedup": round(speedup, 4),
                "winner": "pallas" if speedup > 1.02 else "xla_scan",
            }
        )
    )


if __name__ == "__main__":
    main()
