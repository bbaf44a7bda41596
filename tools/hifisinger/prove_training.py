"""Drive the HiFiSinger GAN regime end-to-end on real hardware.

VERDICT r1 follow-up: the GAN training step had only single-step unit tests.
This script runs the full adversarial regime (HiFiSinger-v2: RefineGAN
generator + MPD/MRD, 45*mel + envelope + adv losses, per-EPOCH ExponentialLR)
for O(1000) steps on a synthetic-but-learnable singing dataset and records
the D/G loss series to a committed JSON artifact.

Synthetic data: harmonic-series "voices" with smooth random f0 contours and
amplitude envelopes; `contents` are a fixed random projection of the
ground-truth log-mel (so the task is a learnable vocoder-like mapping), and
`pitches` are the true f0 — the same information the real pipeline provides.

Usage (single TPU chip; serialize with other TPU users):
    python tools/hifisinger/prove_training.py --steps 1200 \
        --out docs/artifacts/gan_run_r02.json
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def synth_dataset(n, segment_size, hop, sr, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    n_frames = segment_size // hop

    # smooth log-f0 contours in [110, 440] Hz
    ctrl = rng.uniform(np.log(110.0), np.log(440.0), size=(n, 8))
    t = np.linspace(0, 7, n_frames)
    idx = np.floor(t).astype(int)
    frac = (t - idx).astype(np.float32)
    logf0 = ctrl[:, idx] * (1 - frac) + ctrl[:, np.minimum(idx + 1, 7)] * frac
    f0 = np.exp(logf0).astype(np.float32)  # [n, n_frames]

    f0_up = np.repeat(f0, hop, axis=1)  # [n, segment]
    phase = 2 * np.pi * np.cumsum(f0_up, axis=1) / sr

    # harmonic stack with per-voice timbre + smooth envelope
    audio = np.zeros_like(phase, dtype=np.float64)
    timbre = rng.uniform(0.3, 1.0, size=(n, 8))
    for k in range(1, 9):
        audio += (timbre[:, k - 1 : k] / k) * np.sin(k * phase)
    env_ctrl = rng.uniform(0.3, 0.9, size=(n, 8))
    env = env_ctrl[:, idx] * (1 - frac) + env_ctrl[:, np.minimum(idx + 1, 7)] * frac
    audio *= np.repeat(env, hop, axis=1)
    audio /= np.abs(audio).max(axis=1, keepdims=True) + 1e-6
    audio = (0.8 * audio + 0.002 * rng.standard_normal(audio.shape)).astype(
        np.float32
    )
    return audio, f0


def run_vocoder(args):
    """Drive the standalone vocoder GAN trainer (VocoderTrainer / v1
    regime) for args.steps on synthetic (audio, f0) pairs."""
    import jax
    import numpy as np

    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.training.vocoder_trainer import VocoderTrainer

    cfg = Config.fromfile(args.config)
    hop = cfg.model.generator.get("hop_size", 512)
    sr = cfg.model.generator.get("sampling_rate", 44100)
    segment = cfg.dataset.train.get("segment_size", 32768)
    print(f"[prove:vocoder] hop={hop} sr={sr} segment={segment} "
          f"platform={jax.devices()[0].platform}", flush=True)

    audio_np, f0_np = synth_dataset(args.n_samples, segment, hop, sr, args.seed)
    pitches_np = np.repeat(f0_np, hop, axis=1)  # sample-rate f0

    spe = args.n_samples // args.batch
    log_dir = Path("logs/prove_vocoder")
    (log_dir / "metrics.jsonl").unlink(missing_ok=True)  # fresh series
    # fresh run, fresh dir: the manager would overwrite a previous run's
    # step anyway, but a proof artifact should not inherit ANY old steps
    shutil.rmtree(log_dir / "checkpoints", ignore_errors=True)
    trainer = VocoderTrainer(cfg, log_dir=str(log_dir), steps_per_epoch=spe)
    # cap to requested steps via a bounded loader
    rng_np = np.random.default_rng(args.seed)

    class Loader:
        # one epoch per __iter__: fit() cycles epochs itself, and the
        # device batch cache needs a bounded first epoch
        def __iter__(self):
            order = np.arange(args.n_samples)
            rng_np.shuffle(order)
            for i in range(spe):
                sel = order[i * args.batch : (i + 1) * args.batch]
                yield {"audio": audio_np[sel], "pitches": pitches_np[sel]}

    # held-out audio for a val_mel_l1 series (VERDICT r2 next #8)
    val_audio, val_f0 = synth_dataset(args.batch, segment, hop, sr, args.seed + 999)
    val_pitches = np.repeat(val_f0, hop, axis=1)

    class ValLoader:
        def __iter__(self):
            yield {"audio": val_audio, "pitches": val_pitches}

    state = trainer.fit(
        Loader(), max_steps=args.steps, log_every=args.log_every,
        save_every=args.steps,
        valid_loader=ValLoader(), valid_every=args.val_every,
        cache_batches=args.cache_batches,
    )

    import json

    all_rows = [json.loads(l) for l in open(log_dir / "metrics.jsonl")]
    rows = [r for r in all_rows if "loss_mel" in r]
    val_rows = [
        {"step": r["step"], "val_mel_l1": r["valid_mel_l1"]}
        for r in all_rows
        if "valid_mel_l1" in r
    ]
    first = [r for r in rows if r["step"] <= args.steps // 5]
    last = [r for r in rows if r["step"] > 4 * args.steps // 5]
    summary = {
        "config": args.config,
        "flavor": "vocoder_v1",
        "steps": args.steps,
        "batch": args.batch,
        "segment_size": segment,
        "platform": jax.devices()[0].platform,
        "steps_per_sec_steady": float(
            np.mean([r["steps_per_sec"] for r in rows[len(rows) // 2 :]])
        ),
        "loss_mel_first_fifth": float(np.mean([r["loss_mel"] for r in first])),
        "loss_mel_last_fifth": float(np.mean([r["loss_mel"] for r in last])),
        "loss_d_first_fifth": float(np.mean([r["loss_d"] for r in first])),
        "loss_d_last_fifth": float(np.mean([r["loss_d"] for r in last])),
        "val_mel_l1_first": val_rows[0]["val_mel_l1"] if val_rows else None,
        "val_mel_l1_last": val_rows[-1]["val_mel_l1"] if val_rows else None,
        "cache_batches_on_device": bool(args.cache_batches),
        "val_series": val_rows,
        "series": rows,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    print(f"[prove:vocoder] mel {summary['loss_mel_first_fifth']:.4f} -> "
          f"{summary['loss_mel_last_fifth']:.4f}; wrote {out}", flush=True)
    return state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/svc_hifisinger_v2.py")
    parser.add_argument("--steps", type=int, default=1200)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--n-samples", type=int, default=256)
    parser.add_argument("--log-every", type=int, default=25)
    parser.add_argument("--val-every", type=int, default=200)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--out", default="docs/artifacts/gan_run_r02.json")
    parser.add_argument(
        "--cache-batches",
        action="store_true",
        help="keep epoch-1 device batches resident in HBM and replay them "
        "(permuted) for later epochs — zero steady-state H2D over the "
        "host tunnel (datasets/prefetch.py:CachedDeviceFeeder)",
    )
    parser.add_argument(
        "--regime",
        default="hifisinger",
        choices=("hifisinger", "vocoder"),
        help="'vocoder' drives the standalone NSF-HiFiGAN vocoder trainer "
        "(v1 losses: MPD+MSD+fm+multi-STFT/mel) on (audio, f0) pairs",
    )
    args = parser.parse_args()

    if args.regime == "vocoder":
        return run_vocoder(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.models.hifisinger import HiFiSinger
    from fish_diffusion_tpu.ops.mel import LogMelSpectrogram
    from fish_diffusion_tpu.parallel import make_mesh, shard_batch
    from fish_diffusion_tpu.training.gan import (
        Discriminators,
        create_gan_state,
        make_gan_train_step,
    )
    from fish_diffusion_tpu.training.optim import build_lr_schedule, build_optimizer

    cfg = Config.fromfile(args.config)
    mc = cfg.model
    flavor = "v2" if mc.encoder.get("type") == "RefineGAN" else "v1"
    hop = mc.encoder.get("hop_length", mc.encoder.get("hop_size", 512))
    sr = mc.encoder.get("sampling_rate", 44100)
    segment = cfg.dataset.train.get("segment_size", 32768)
    n_frames = segment // hop
    content_dim = mc.text_encoder.get("input_size", 768)
    print(f"[prove] flavor={flavor} hop={hop} sr={sr} segment={segment} "
          f"frames={n_frames} platform={jax.devices()[0].platform}", flush=True)

    # -- data ----------------------------------------------------------------
    audio_np, f0_np = synth_dataset(args.n_samples, segment, hop, sr, args.seed)
    rng_np = np.random.default_rng(args.seed)
    speakers_np = rng_np.integers(
        0, mc.speaker_encoder.get("input_size", 10), size=args.n_samples
    )

    mel_tf = LogMelSpectrogram(sample_rate=sr, hop_length=hop, n_mels=128)
    proj = rng_np.standard_normal((128, content_dim)).astype(np.float32) / np.sqrt(128)

    mel_fn = jax.jit(lambda a: jnp.swapaxes(mel_tf.wav2spec(a), 1, 2) @ proj)
    contents_np = np.concatenate(
        [
            np.asarray(mel_fn(jnp.asarray(audio_np[i : i + 32])))
            for i in range(0, args.n_samples, 32)
        ]
    )[:, :n_frames].astype(np.float32)
    # standardize like real content features (HuBERT activations are ~unit
    # scale; raw log-mel projections reach +-17 and destabilize early GAN
    # steps)
    contents_np = (contents_np - contents_np.mean()) / (contents_np.std() + 1e-6)
    print(f"[prove] contents {contents_np.shape}", flush=True)

    # -- model / optimizers ----------------------------------------------------
    model_cfg = {
        k: v
        for k, v in dict(mc).items()
        if k not in ("type", "mpd", "mrd", "msd", "multi_scale_mels")
    }
    model = HiFiSinger(**model_cfg)

    def generator_apply(params, batch, rng):
        return model.apply(
            {"params": params},
            speakers=batch["speaker"],
            contents=batch["contents"],
            pitches=batch["pitches"],
            rngs={"noise": rng},
        )

    import jax.numpy as _jnp

    _ddt = str((cfg.get("trainer") or {}).get("discriminator_dtype", "float32"))
    discs = Discriminators(
        flavor,
        mpd_cfg=dict(mc.get("mpd", {})) or None,
        mrd_cfg=dict(mc.get("mrd", {})) or None,
        dtype=_jnp.bfloat16 if "bf" in _ddt else None,
    )

    spe = args.n_samples // args.batch  # steps per epoch
    sched_cfg = dict(cfg.scheduler)
    tx_g = build_optimizer(dict(cfg.optimizer), sched_cfg, steps_per_epoch=spe)
    tx_d = build_optimizer(dict(cfg.optimizer), sched_cfg, steps_per_epoch=spe)
    lr_fn = build_lr_schedule(
        sched_cfg, dict(cfg.optimizer).get("lr", 1.0), steps_per_epoch=spe
    )

    # the schedule is jnp-based (optax traces it inside the jitted update);
    # evaluating it eagerly on the TPU would enqueue a tiny program behind
    # the dispatched step backlog and float() would sync on it — pin the
    # informational lr read to the host CPU backend
    try:
        _host_dev = jax.devices("cpu")[0]
    except RuntimeError:
        _host_dev = None

    def host_lr(s):
        if _host_dev is None:
            return float(lr_fn(s))
        with jax.default_device(_host_dev):
            return float(lr_fn(s))

    mesh = make_mesh()
    step_fn = make_gan_train_step(
        generator_apply,
        discs,
        tx_g,
        tx_d,
        sampling_rate=sr,
        multi_scale_mels=tuple(
            tuple(s) for s in mc.get("multi_scale_mels", [(2048, hop, 2048)])
        ),
        mesh=mesh,
    )

    rng = jax.random.PRNGKey(args.seed)

    def gen_init():
        return model.init(
            {"params": rng, "noise": jax.random.fold_in(rng, 1)},
            speakers=jnp.asarray(speakers_np[: 1]),
            contents=jnp.asarray(contents_np[:1]),
            pitches=jnp.asarray(f0_np[:1]),
        )["params"]

    example = {
        "audio": jnp.asarray(audio_np[:1]),
        "contents": jnp.asarray(contents_np[:1]),
        "pitches": jnp.asarray(f0_np[:1]),
        "speaker": jnp.asarray(speakers_np[:1]),
    }
    t0 = time.perf_counter()
    state = create_gan_state(
        gen_init, discs, example["audio"], rng, tx_g, tx_d
    )
    n_params_g = sum(x.size for x in jax.tree_util.tree_leaves(state.params_g))
    n_params_d = sum(x.size for x in jax.tree_util.tree_leaves(state.params_d))
    print(f"[prove] init in {time.perf_counter() - t0:.1f}s; "
          f"G params {n_params_g / 1e6:.2f}M, D params {n_params_d / 1e6:.2f}M", flush=True)

    # -- held-out validation (VERDICT r2 next #8: generalization evidence) ----
    n_val = min(args.batch * 2, args.n_samples // 8)
    val_audio, val_f0 = synth_dataset(n_val, segment, hop, sr, args.seed + 999)
    val_contents = np.asarray(mel_fn(jnp.asarray(val_audio)))[:, :n_frames]
    val_contents = (val_contents - contents_np.mean()) / (contents_np.std() + 1e-6)
    val_speakers = rng_np.integers(
        0, mc.speaker_encoder.get("input_size", 10), size=n_val
    )
    val_mel_tf = LogMelSpectrogram(sample_rate=sr, hop_length=hop, n_mels=128)

    from fish_diffusion_tpu.models.discriminators import multi_scale_stft_loss

    @jax.jit
    def val_fn(params_g, batch, vrng):
        y_hat = generator_apply(params_g, batch, vrng)
        y = batch["audio"][:, : y_hat.shape[1]]
        l1 = jnp.mean(
            jnp.abs(val_mel_tf.wav2spec(y) - val_mel_tf.wav2spec(y_hat))
        )
        stft = multi_scale_stft_loss(y, y_hat)
        return l1, stft, y_hat

    # held-out F0 deviation of the GENERATED audio (VERDICT r3 next #6:
    # val mel-L1 alone cannot see pitch errors) — native Harvest on the
    # first val items, compared to the true frame f0 in cents
    import fish_diffusion_tpu.extractors  # noqa: F401
    from fish_diffusion_tpu.registry import PITCH_EXTRACTORS

    f0_ext = PITCH_EXTRACTORS.build(
        dict(type="HarvestPitchExtractor", keep_zeros=False)
    )

    def val_f0_cents(y_hat_np, f0_true):
        raw = np.asarray(f0_ext(y_hat_np, sr, pad_to=None))
        n_true = int(np.ceil(len(y_hat_np) / f0_ext.hop_length))
        f0_hat = np.asarray(
            f0_ext.post_process(y_hat_np, sr, raw[:n_true], len(f0_true))
        )
        voiced = (np.asarray(f0_true) > 50) & (f0_hat > 50)
        if not voiced.any():
            return None
        return float(
            np.median(
                1200 * np.abs(np.log2(f0_hat[voiced] / np.asarray(f0_true)[voiced]))
            )
        )

    val_batch = shard_batch(
        {
            "audio": jnp.asarray(val_audio[: args.batch]),
            "contents": jnp.asarray(val_contents[: args.batch]),
            "pitches": jnp.asarray(val_f0[: args.batch]),
            "speaker": jnp.asarray(val_speakers[: args.batch]),
        },
        mesh,
    )

    # -- loop ------------------------------------------------------------------
    # async feed: a feeder thread dispatches device_puts for upcoming
    # batches while the device runs the current step; the host never syncs
    # except at (deferred) log points (datasets/prefetch.py). With
    # --cache-batches the collated epoch lives in HBM after epoch 1 and
    # later epochs replay device handles with zero H2D (the tunnel-bound
    # ~50 ms/step transfer wait in gan_run_r03.json disappears).
    from fish_diffusion_tpu.datasets.prefetch import (
        CachedDeviceFeeder,
        DeviceFeeder,
    )

    def host_batches():
        order = np.arange(args.n_samples)
        for step in range(1, args.steps + 1):
            if (step - 1) % spe == 0:
                rng_np.shuffle(order)
            i = (step - 1) % spe
            sel = order[i * args.batch : (i + 1) * args.batch]
            yield {
                "audio": audio_np[sel],
                "contents": contents_np[sel],
                "pitches": f0_np[sel],
                "speaker": speakers_np[sel],
            }

    def one_epoch():
        order = np.arange(args.n_samples)
        rng_np.shuffle(order)
        for i in range(spe):
            sel = order[i * args.batch : (i + 1) * args.batch]
            yield {
                "audio": audio_np[sel],
                "contents": contents_np[sel],
                "pitches": f0_np[sel],
                "speaker": speakers_np[sel],
            }

    put_fn = lambda b: shard_batch(
        {k: jnp.asarray(v) for k, v in b.items()}, mesh
    )
    if args.cache_batches:
        feeder = CachedDeviceFeeder(
            one_epoch(), put_fn=put_fn, epochs=None, seed=args.seed
        )
    else:
        feeder = DeviceFeeder(host_batches(), put_fn=put_fn)

    series = []
    val_series = []
    t_last = time.perf_counter()
    t_begin = t_last
    pending = None  # (step, metrics) materialized one interval late
    step = 0
    wait_last = 0.0
    for sharded in feeder:
        if step >= args.steps:  # cached feeder is endless
            break
        step += 1
        state, metrics = step_fn(state, sharded, rng)

        if step % args.log_every == 0 and pending is not None:
            p_step, p_metrics = pending
            row = {k: float(v) for k, v in p_metrics.items()}  # syncs p_step
            now = time.perf_counter()
            wait_now = feeder.stats["host_wait_s"]
            row.update(
                step=p_step,
                lr=host_lr(p_step),
                epoch=p_step // spe,
                steps_per_sec=args.log_every / max(now - t_last, 1e-9),
                host_wait_ms_per_step=1000
                * (wait_now - wait_last)
                / args.log_every,
            )
            series.append(row)
            print(
                f"step {p_step:5d} ep {row['epoch']:3d} "
                f"D {row['loss_d']:.4f} G {row['loss_g']:.3f} "
                f"mel {row['loss_mel']:.4f} env {row['loss_env']:.4f} "
                f"lr {row['lr']:.3e} {row['steps_per_sec']:.2f} it/s "
                f"wait {row['host_wait_ms_per_step']:.0f}ms",
                flush=True,
            )
            t_last = now
            wait_last = wait_now
            pending = None
        if step % args.log_every == 0:
            pending = (step, metrics)

        if step % args.val_every == 0 or step == args.steps:
            l1, stft, y_hat_val = val_fn(
                state.params_g, val_batch, jax.random.PRNGKey(0)
            )
            cents = [
                val_f0_cents(
                    np.asarray(y_hat_val[i], np.float32),
                    val_f0[i][: y_hat_val.shape[1] // hop],
                )
                for i in range(min(2, y_hat_val.shape[0]))
            ]
            cents = [c for c in cents if c is not None]
            val_series.append(
                {
                    "step": step,
                    "val_mel_l1": float(l1),
                    "val_stft_dist": float(stft),
                    "val_f0_cents_median": (
                        float(np.mean(cents)) if cents else None
                    ),
                }
            )
            print(
                f"  [val] step {step} mel_l1 {val_series[-1]['val_mel_l1']:.4f} "
                f"stft {val_series[-1]['val_stft_dist']:.4f} "
                f"f0 {val_series[-1]['val_f0_cents_median']} cents",
                flush=True,
            )
            t_last = time.perf_counter()  # don't count val in steps/s

    feeder.close()
    elapsed = time.perf_counter() - t_begin
    first = [r for r in series if r["step"] <= args.steps // 5]
    last = [r for r in series if r["step"] > 4 * args.steps // 5]

    # final val audio artifact (snippet + hash in the summary)
    import hashlib

    _, _, y_hat_val = val_fn(state.params_g, val_batch, jax.random.PRNGKey(0))
    snippet = np.asarray(y_hat_val[0], np.float32)
    out_wav = Path(args.out).with_suffix(".val_pred.wav")
    out_wav.parent.mkdir(parents=True, exist_ok=True)
    from fish_diffusion_tpu.utils.audio import save_wav

    save_wav(out_wav, snippet, sr)
    wav_sha = hashlib.sha256(out_wav.read_bytes()).hexdigest()[:16]

    def avg(rows, k):
        return float(np.mean([r[k] for r in rows])) if rows else float("nan")

    summary = {
        "config": args.config,
        "flavor": flavor,
        "steps": args.steps,
        "batch": args.batch,
        "segment_size": segment,
        "platform": jax.devices()[0].platform,
        "params_g": n_params_g,
        "params_d": n_params_d,
        "wall_seconds": elapsed,
        "steps_per_sec_steady": avg(series[len(series) // 2 :], "steps_per_sec"),
        "audio_sec_per_sec": avg(series[len(series) // 2 :], "steps_per_sec")
        * args.batch
        * segment
        / sr,
        "loss_mel_first_fifth": avg(first, "loss_mel"),
        "loss_mel_last_fifth": avg(last, "loss_mel"),
        "loss_g_first_fifth": avg(first, "loss_g"),
        "loss_g_last_fifth": avg(last, "loss_g"),
        "loss_d_first_fifth": avg(first, "loss_d"),
        "loss_d_last_fifth": avg(last, "loss_d"),
        "lr_final": series[-1]["lr"] if series else None,
        "host_wait_ms_per_step_steady": avg(
            series[len(series) // 2 :], "host_wait_ms_per_step"
        ),
        "val_mel_l1_first": val_series[0]["val_mel_l1"] if val_series else None,
        "val_mel_l1_last": val_series[-1]["val_mel_l1"] if val_series else None,
        "val_stft_dist_first": val_series[0].get("val_stft_dist") if val_series else None,
        "val_stft_dist_last": val_series[-1].get("val_stft_dist") if val_series else None,
        "val_f0_cents_first": val_series[0].get("val_f0_cents_median") if val_series else None,
        "val_f0_cents_last": val_series[-1].get("val_f0_cents_median") if val_series else None,
        "val_pred_wav": str(out_wav),
        "val_pred_wav_sha256_16": wav_sha,
        "cache_batches_on_device": bool(args.cache_batches),
        "cache_bytes": int(feeder.stats.get("cache_bytes", 0)),
        "val_series": val_series,
        "series": series,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    improved = summary["loss_mel_last_fifth"] < 0.7 * summary["loss_mel_first_fifth"]
    print(
        f"[prove] mel {summary['loss_mel_first_fifth']:.4f} -> "
        f"{summary['loss_mel_last_fifth']:.4f} "
        f"({'DECREASING' if improved else 'NOT CONVERGED'}); "
        f"{summary['steps_per_sec_steady']:.2f} steps/s = "
        f"{summary['audio_sec_per_sec']:.1f}x realtime audio throughput; "
        f"wrote {out}"
    )


if __name__ == "__main__":
    main()
