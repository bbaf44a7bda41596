"""MFU attribution probes (VERDICT r4 next #5/#6).

Two on-hardware measurements that decide where the r5 performance work
goes, each written to a committed artifact:

1. ``--vocoder``: byte/FLOP attribution of the NSF-HiFiGAN v1 trainer step
   (the probe bench.py:_bench_vocoder_probe times). The full step is at its
   XLA roofline (r4: MFU 0.16 vs bound 0.149), so the question is WHICH
   sub-program owns the HBM bytes — generator forward, discriminator
   forwards, D-phase grad, or G-phase grad. Each part is jitted standalone
   and costed via XLA cost_analysis (scan-free -> exact) + wall-timed.
   -> docs/artifacts/vocoder_step_attribution_r05.json

2. ``--unroll``: diffusion train-step wall time vs WaveNet ``scan_unroll``
   in {1, 2, 4} at the reference training shape (B=20, T=512, 20x512
   WaveNet, bf16-mixed) — the cheapest candidate lever for train MFU
   0.456 -> 0.55 (VERDICT r4 next #6).
   -> docs/artifacts/train_mfu_sweep_r05.json

Run on the real chip (one process at a time!):
    python tools/mfu_probes.py --vocoder --unroll
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass


def _cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca.get("flops") or 0),
            "bytes": float(ca.get("bytes accessed") or 0),
        }
    except Exception as e:
        return {"error": str(e)[:120]}


def _time_it(fn, *args, iters=10, warmup=4):
    """fn must return a scalar (device sync via float()). Non-finite
    values are tolerated — an untrained-net probe can produce NaN/inf
    grad norms, and NaNs propagate at the same speed as numbers, so the
    TIMING stays valid (the caller records the value for diagnostics)."""
    for _ in range(warmup):
        out = fn(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / iters


def probe_vocoder(out_path: str, batch: int = 8, disc_dtype: str = None,
                  parts: bool = True):
    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.training.vocoder_trainer import VocoderTrainer

    cfg = Config.fromfile("configs/vocoder_nsf_hifigan.py")
    if disc_dtype:
        cfg.trainer["discriminator_dtype"] = disc_dtype
    segment = cfg.dataset.train.get("segment_size", 32768)
    trainer = VocoderTrainer(cfg, log_dir="/tmp/mfu_probe_vocoder",
                             steps_per_epoch=32)

    rng_np = np.random.default_rng(0)
    b = {
        "audio": jnp.asarray(
            rng_np.uniform(-0.5, 0.5, (batch, segment)), jnp.float32
        ),
        "pitches": jnp.asarray(
            np.repeat(
                rng_np.uniform(110, 440, (batch, segment // 512)), 512, axis=1
            ),
            jnp.float32,
        ),
    }
    state = trainer.init_state(b, seed=0)
    rng = jax.random.PRNGKey(0)

    gen_apply = trainer.generator_apply
    discs = trainer.discs

    report = {"batch": batch, "segment": segment,
              "disc_dtype": disc_dtype or "float32",
              "device": jax.devices()[0].device_kind}

    if not parts:
        _probe_vocoder_full(trainer, state, b, rng, report, out_path)
        return

    # 1. generator forward
    g_fwd = jax.jit(lambda p, bt, r: jnp.sum(gen_apply(p, bt, r)))
    report["gen_fwd"] = _cost(g_fwd, state.params_g, b, rng)
    report["gen_fwd"]["ms"] = 1e3 * _time_it(g_fwd, state.params_g, b, rng)
    print(json.dumps({"gen_fwd": report["gen_fwd"]}), flush=True)

    # 2. discriminator forward (both stacks, one wav)
    def d_fwd_fn(pd, sd, wav):
        (s1, f1), (s2, f2), _ = discs.apply(pd, wav, sd)
        tot = sum(jnp.sum(s) for s in s1 + s2)
        tot += sum(jnp.sum(f) for fm in f1 + f2 for f in fm)
        return tot

    d_fwd = jax.jit(d_fwd_fn)
    wav = b["audio"]
    report["disc_fwd_one_wav"] = _cost(d_fwd, state.params_d, state.spectral_d, wav)
    report["disc_fwd_one_wav"]["ms"] = 1e3 * _time_it(
        d_fwd, state.params_d, state.spectral_d, wav
    )
    print(json.dumps({"disc_fwd_one_wav": report["disc_fwd_one_wav"]}), flush=True)

    # 3. D-phase gradient (2 disc fwd + bwd)
    from fish_diffusion_tpu.models.discriminators import discriminator_loss

    def d_loss(pd, sd, y, y_hat):
        (s1r, _), (s2r, _), sd = discs.apply(pd, y, sd, update=True)
        (s1g, _), (s2g, _), sd = discs.apply(pd, y_hat, sd, update=True)
        return discriminator_loss(s1r, s1g) + discriminator_loss(s2r, s2g)

    d_grad = jax.jit(
        lambda pd, sd, y, yh: optax_global_norm(
            jax.grad(d_loss)(pd, sd, y, yh)
        )
    )
    y_hat = jax.jit(gen_apply)(state.params_g, b, rng)
    y_cut = wav[:, : y_hat.shape[1]]
    report["d_phase_grad"] = _cost(
        d_grad, state.params_d, state.spectral_d, y_cut, y_hat
    )
    report["d_phase_grad"]["ms"] = 1e3 * _time_it(
        d_grad, state.params_d, state.spectral_d, y_cut, y_hat
    )
    print(json.dumps({"d_phase_grad": report["d_phase_grad"]}), flush=True)

    # 4. G-phase gradient (gen fwd+bwd, 2 disc fwd + bwd-through-fake,
    #    mel/stft/env/fm losses)
    from fish_diffusion_tpu.models.discriminators import (
        envelope_loss,
        feature_loss,
        generator_adv_loss,
        multi_scale_mel_loss,
        multi_scale_stft_loss,
    )

    scales = tuple(
        tuple(s)
        for s in cfg.model.get(
            "multi_scale_mels",
            ((2048, 512, 2048), (2048, 270, 1080), (4096, 540, 2160)),
        )
    )

    def g_loss(pg, pd, sd, bt, r):
        y_hat = gen_apply(pg, bt, r)
        y = bt["audio"][:, : y_hat.shape[1]]
        (s1r, f1r), (s2r, f2r), _ = discs.apply(pd, y, sd)
        (s1g, f1g), (s2g, f2g), _ = discs.apply(pd, y_hat, sd)
        loss = generator_adv_loss(s1g) + generator_adv_loss(s2g)
        loss += 45.0 * multi_scale_mel_loss(y, y_hat, 44100, scales, loss="l1")
        loss += envelope_loss(y, y_hat)
        loss += feature_loss(f1r, f1g) + feature_loss(f2r, f2g)
        loss += multi_scale_stft_loss(y, y_hat)
        return loss

    g_grad = jax.jit(
        lambda pg, pd, sd, bt, r: optax_global_norm(
            jax.grad(g_loss)(pg, pd, sd, bt, r)
        )
    )
    report["g_phase_grad"] = _cost(
        g_grad, state.params_g, state.params_d, state.spectral_d, b, rng
    )
    report["g_phase_grad"]["ms"] = 1e3 * _time_it(
        g_grad, state.params_g, state.params_d, state.spectral_d, b, rng
    )
    print(json.dumps({"g_phase_grad": report["g_phase_grad"]}), flush=True)

    # 5. loss-only stack (mel+stft+env on two wavs) — the non-adversarial part
    def losses_only(y, y_hat):
        return (
            45.0 * multi_scale_mel_loss(y, y_hat, 44100, scales, loss="l1")
            + envelope_loss(y, y_hat)
            + multi_scale_stft_loss(y, y_hat)
        )

    l_fn = jax.jit(losses_only)
    report["mel_stft_env_losses_fwd"] = _cost(l_fn, y_cut, y_hat)
    report["mel_stft_env_losses_fwd"]["ms"] = 1e3 * _time_it(l_fn, y_cut, y_hat)
    print(json.dumps({"mel_stft_env_losses_fwd": report["mel_stft_env_losses_fwd"]}), flush=True)

    # 6. the full production step (for reference)
    from fish_diffusion_tpu.parallel.distributed import make_global_batch

    sb = make_global_batch(b, trainer.mesh)

    # NOTE: _train_step donates its state arg — always rebind it
    st = state
    for _ in range(4):
        st, m = trainer._train_step(st, sb, rng)
    _ = float(m["loss_g"])
    t0 = time.perf_counter()
    for _ in range(10):
        st, m = trainer._train_step(st, sb, rng)
    _ = float(m["loss_g"])
    report["full_step"] = {"ms": 1e2 * (time.perf_counter() - t0)}
    report["full_step"].update(_cost(trainer._train_step, st, sb, rng))

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1), flush=True)


def _probe_vocoder_full(trainer, state, b, rng, report, out_path):
    """Full-step-only timing (for dtype comparisons)."""
    from fish_diffusion_tpu.parallel.distributed import make_global_batch

    sb = make_global_batch(b, trainer.mesh)
    st = state
    for _ in range(5):
        st, m = trainer._train_step(st, sb, rng)
    report["loss_g_probe"] = float(m["loss_g"])
    report["loss_mel_probe"] = float(m["loss_mel"])
    t0 = time.perf_counter()
    for _ in range(15):
        st, m = trainer._train_step(st, sb, rng)
    _ = float(m["loss_g"])
    dt = (time.perf_counter() - t0) / 15
    report["full_step"] = {"ms": round(1e3 * dt, 2),
                           "steps_per_sec": round(1 / dt, 3)}
    report["full_step"].update(_cost(trainer._train_step, st, sb, rng))
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1), flush=True)


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)


def probe_unroll(out_path: str, unrolls=(1, 2, 4)):
    from fish_diffusion_tpu.models import build_model
    from fish_diffusion_tpu.parallel import make_mesh, shard_batch
    from fish_diffusion_tpu.training import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    B, FRAMES = 20, 512
    rng_np = np.random.default_rng(0)
    batch = dict(
        speakers=jnp.zeros((B,), jnp.int32),
        contents=jnp.asarray(rng_np.standard_normal((B, FRAMES, 256)), jnp.float32),
        mel=jnp.asarray(rng_np.uniform(-4, 0, (B, FRAMES, 128)), jnp.float32),
        pitches=jnp.asarray(rng_np.uniform(80, 600, (B, FRAMES)), jnp.float32),
    )
    tx = build_optimizer(
        dict(type="AdamW", lr=1.0, weight_decay=1e-2, betas=(0.9, 0.98), eps=1e-9),
        None,
        grad_clip_val=0.5,
    )
    mesh = make_mesh(axis_shapes=(-1,), axis_names=("data",))

    out = {"B": B, "frames": FRAMES, "device": jax.devices()[0].device_kind,
           "variants": {}}
    for unroll in unrolls:
        model = build_model(
            dict(
                type="DiffSinger",
                diffusion=dict(
                    type="GaussianDiffusion",
                    mel_channels=128,
                    noise_schedule="linear",
                    timesteps=1000,
                    noise_loss="smoothed-l1",
                    denoiser=dict(
                        type="WaveNetDenoiser",
                        mel_channels=128,
                        d_encoder=256,
                        residual_channels=512,
                        residual_layers=20,
                        dilation_cycle=4,
                        use_linear_bias=True,
                        scan_unroll=unroll,
                    ),
                    sampler_interval=10,
                    spec_min=[-5],
                    spec_max=[0],
                ),
                text_encoder=dict(
                    type="NaiveProjectionEncoder", input_size=256, output_size=256
                ),
                speaker_encoder=dict(
                    type="NaiveProjectionEncoder", input_size=10,
                    output_size=256, use_embedding=True,
                ),
                pitch_encoder=dict(
                    type="NaiveProjectionEncoder", input_size=1,
                    output_size=256, use_embedding=False,
                    preprocessing="pitch_to_scale",
                ),
            ),
            precision="bf16-mixed",
        )
        state = create_train_state(
            model, batch, jax.random.PRNGKey(0), tx, ema_momentum=0.999
        )
        step = make_train_step(model, tx, ema_momentum=0.999, mesh=mesh)
        sb = shard_batch(batch, mesh)
        for _ in range(8):
            state, m = step(state, sb, jax.random.PRNGKey(1))
        _ = float(m["loss"])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, sb, jax.random.PRNGKey(1))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        cost = _cost(step, state, sb, jax.random.PRNGKey(1))
        out["variants"][str(unroll)] = {
            "ms_per_step": round(1e3 * dt, 2),
            "mel_frames_per_sec": round(B * FRAMES / dt, 1),
            **cost,
        }
        print(f"unroll={unroll}: {1e3 * dt:.2f} ms/step", flush=True)
        del state, step, model

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


def _train_fixture():
    """(model_cfg builder, batch, tx, mesh) for the reference train shape."""
    from fish_diffusion_tpu.parallel import make_mesh
    from fish_diffusion_tpu.training import build_optimizer

    B, FRAMES = 20, 512
    rng_np = np.random.default_rng(0)
    batch = dict(
        speakers=jnp.zeros((B,), jnp.int32),
        contents=jnp.asarray(rng_np.standard_normal((B, FRAMES, 256)), jnp.float32),
        mel=jnp.asarray(rng_np.uniform(-4, 0, (B, FRAMES, 128)), jnp.float32),
        pitches=jnp.asarray(rng_np.uniform(80, 600, (B, FRAMES)), jnp.float32),
    )
    tx = build_optimizer(
        dict(type="AdamW", lr=1.0, weight_decay=1e-2, betas=(0.9, 0.98), eps=1e-9),
        None,
        grad_clip_val=0.5,
    )
    mesh = make_mesh(axis_shapes=(-1,), axis_names=("data",))

    def model_cfg():
        return dict(
            type="DiffSinger",
            diffusion=dict(
                type="GaussianDiffusion",
                mel_channels=128,
                noise_schedule="linear",
                timesteps=1000,
                noise_loss="smoothed-l1",
                denoiser=dict(
                    type="WaveNetDenoiser",
                    mel_channels=128,
                    d_encoder=256,
                    residual_channels=512,
                    residual_layers=20,
                    dilation_cycle=4,
                    use_linear_bias=True,
                ),
                sampler_interval=10,
                spec_min=[-5],
                spec_max=[0],
            ),
            text_encoder=dict(
                type="NaiveProjectionEncoder", input_size=256, output_size=256
            ),
            speaker_encoder=dict(
                type="NaiveProjectionEncoder", input_size=10,
                output_size=256, use_embedding=True,
            ),
            pitch_encoder=dict(
                type="NaiveProjectionEncoder", input_size=1,
                output_size=256, use_embedding=False,
                preprocessing="pitch_to_scale",
            ),
        )

    return model_cfg, batch, tx, mesh, B, FRAMES


def probe_train_variants(out_path: str):
    """Attribute the train-step MFU deficit (0.456 measured vs 0.695 at
    inference): time (a) the full step, (b) forward loss only, (c) the step
    without the grad-norm metric, (d) the step with the dynamic time-shifts
    in DilatedConvK3 replaced by STATIC shift-by-1 (wrong numerics,
    identical FLOPs/shapes) — isolating the cost of traced-dilation
    roll+mask inside the scan body."""
    from fish_diffusion_tpu import models as _models_pkg  # noqa: F401
    from fish_diffusion_tpu.models import build_model, common
    from fish_diffusion_tpu.parallel import shard_batch
    from fish_diffusion_tpu.training import create_train_state, make_train_step

    model_cfg, batch, tx, mesh, B, FRAMES = _train_fixture()
    out = {"B": B, "frames": FRAMES, "device": jax.devices()[0].device_kind,
           "variants": {}}

    def measure_step(step, state, sb, iters=20):
        for _ in range(8):
            state, m = step(state, sb, jax.random.PRNGKey(1))
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, sb, jax.random.PRNGKey(1))
        _ = float(m["loss"])
        return 1e3 * (time.perf_counter() - t0) / iters

    # (a) baseline
    model = build_model(model_cfg(), precision="bf16-mixed")
    state = create_train_state(
        model, batch, jax.random.PRNGKey(0), tx, ema_momentum=0.999
    )
    step = make_train_step(model, tx, ema_momentum=0.999, mesh=mesh)
    sb = shard_batch(batch, mesh)
    out["variants"]["baseline_ms"] = round(measure_step(step, state, sb), 2)
    print(f"baseline: {out['variants']['baseline_ms']} ms", flush=True)

    # (b) forward loss only
    from fish_diffusion_tpu.training.state import _model_kwargs

    state_f = create_train_state(
        model, batch, jax.random.PRNGKey(0), tx, ema_momentum=None
    )

    @jax.jit
    def fwd(params, bt, rng):
        return model.apply(
            {"params": params}, **_model_kwargs(bt), rngs={"diffusion": rng}
        )["loss"]

    def run_fwd():
        t = _time_it(fwd, state_f.params, sb, jax.random.PRNGKey(1),
                     iters=20, warmup=8)
        return round(1e3 * t, 2)

    out["variants"]["fwd_only_ms"] = run_fwd()
    print(f"fwd only: {out['variants']['fwd_only_ms']} ms", flush=True)

    # (c) no grad-norm metric
    import optax

    def step_no_gn(state, bt, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            return model.apply(
                {"params": p}, **_model_kwargs(bt), rngs={"diffusion": rng}
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * 0.999 + p * 0.001, state.ema_params, params
        )
        return (
            state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema),
            {"loss": loss},
        )

    step_ngn = jax.jit(step_no_gn, donate_argnums=(0,))
    state2 = create_train_state(
        model, batch, jax.random.PRNGKey(0), tx, ema_momentum=0.999
    )
    out["variants"]["no_grad_norm_ms"] = round(
        measure_step(step_ngn, state2, sb), 2
    )
    print(f"no grad_norm: {out['variants']['no_grad_norm_ms']} ms", flush=True)

    # (d) static shifts (numerics-wrong probe; FLOPs identical)
    real_shift = common.shift_seq

    def static_shift(x, shift):
        del shift
        return jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, : x.shape[1]]

    common.shift_seq = static_shift
    try:
        model_s = build_model(model_cfg(), precision="bf16-mixed")
        state_s = create_train_state(
            model_s, batch, jax.random.PRNGKey(0), tx, ema_momentum=0.999
        )
        step_s = make_train_step(model_s, tx, ema_momentum=0.999, mesh=mesh)
        out["variants"]["static_shift_ms"] = round(
            measure_step(step_s, state_s, sb), 2
        )
    finally:
        common.shift_seq = real_shift
    print(f"static shift: {out['variants']['static_shift_ms']} ms", flush=True)

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vocoder", action="store_true")
    p.add_argument("--unroll", action="store_true")
    p.add_argument("--train-variants", action="store_true")
    p.add_argument("--vocoder-bf16", action="store_true",
                   help="full-step timing with bf16 discriminator compute")
    p.add_argument("--disc-dtype", default=None,
                   help="discriminator dtype override for --vocoder")
    p.add_argument("--out-dir", default="docs/artifacts")
    args = p.parse_args()
    if args.unroll:
        probe_unroll(f"{args.out_dir}/train_mfu_sweep_r05.json")
    if args.train_variants:
        probe_train_variants(f"{args.out_dir}/train_variants_r05.json")
    if args.vocoder:
        suffix = "_bf16d" if args.disc_dtype else ""
        probe_vocoder(
            f"{args.out_dir}/vocoder_step_attribution_r05{suffix}.json",
            disc_dtype=args.disc_dtype,
        )
    if args.vocoder_bf16:
        probe_vocoder(
            f"{args.out_dir}/vocoder_step_bf16_r05.json",
            disc_dtype="bfloat16",
            parts=False,
        )


if __name__ == "__main__":
    main()
