"""Split the e2e SVC benchmark into its two phases — reverse-diffusion
sampling (100 WaveNet evals via UniPC) and NSF-HiFiGAN vocoding — so the
perf work targets the dominant one.

Same methodology as bench.py: on-device scalar reduction, warmup past
tunnel/compile transients, bench shapes (B=4, T=1024, 44.1 kHz/hop 512).

Usage: python tools/profile_e2e.py  (serialize with other TPU users)
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from fish_diffusion_tpu.models import build_model
    from fish_diffusion_tpu.models.vocoders import NsfHifiGAN, NsfHifiGANGenerator

    SR, HOP, B, FRAMES, HIDDEN = 44100, 512, 4, 1024, 256
    dt = jnp.bfloat16

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
                    d_encoder=HIDDEN,
                    residual_channels=512,
                    residual_layers=20,
                    dilation_cycle=4,
                    use_linear_bias=True,
                    dtype=dt,
                ),
                sampler_interval=10,
                noise_predictor="unipc",
                spec_min=[-5],
                spec_max=[0],
            ),
            text_encoder=dict(
                type="NaiveProjectionEncoder", input_size=256, output_size=HIDDEN
            ),
            speaker_encoder=dict(
                type="NaiveProjectionEncoder",
                input_size=10,
                output_size=HIDDEN,
                use_embedding=True,
            ),
            pitch_encoder=dict(
                type="NaiveProjectionEncoder",
                input_size=1,
                output_size=HIDDEN,
                use_embedding=False,
                preprocessing="pitch_to_scale",
            ),
        )
    )

    rng = np.random.default_rng(0)
    batch = {
        "speakers": jnp.zeros((B,), jnp.int32),
        "contents": jnp.asarray(rng.standard_normal((B, FRAMES, 256)), jnp.float32),
        "mel": jnp.asarray(rng.uniform(-4, 0, (B, FRAMES, 128)), jnp.float32),
        "pitches": jnp.asarray(rng.uniform(80, 600, (B, FRAMES)), jnp.float32),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        **batch,
    )
    params = variables["params"]

    vocoder = NsfHifiGAN(
        sampling_rate=SR, mel_channels=128, hop_length=HOP, use_natural_log=False
    )
    vocoder.generator = NsfHifiGANGenerator(
        num_mels=128,
        sampling_rate=SR,
        hop_size=HOP,
        upsample_rates=(8, 8, 2, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4, 4),
        upsample_initial_channel=512,
        dtype=dt,
    )
    voc_params = vocoder.init_random(jax.random.PRNGKey(3), n_frames=8)

    @jax.jit
    def sample_only(params, batch, rng):
        mel = model.apply(
            {"params": params},
            speakers=batch["speakers"],
            contents=batch["contents"],
            pitches=batch["pitches"],
            method=model.sample,
            rngs={"diffusion": rng},
        )
        return jnp.sum(mel.astype(jnp.float32)), mel

    @jax.jit
    def vocode_only(voc_params, mel, pitches, rng):
        wav = vocoder.generator.apply(
            {"params": voc_params},
            0.434294 * mel,
            pitches,
            rngs={"noise": rng},
        )
        return jnp.sum(wav.astype(jnp.float32))

    def timeit(fn, *args, iters=10, warmup=6):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        s = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(float(s))
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = out[0] if isinstance(out, tuple) else out
        _ = float(s)
        return (time.perf_counter() - start) / iters

    t_sample = timeit(sample_only, params, batch, jax.random.PRNGKey(7))
    _, mel = sample_only(params, batch, jax.random.PRNGKey(7))
    t_vocode = timeit(vocode_only, voc_params, mel, batch["pitches"], jax.random.PRNGKey(8))

    audio_sec = B * FRAMES * HOP / SR
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "sample_ms": round(1000 * t_sample, 2),
                "vocode_ms": round(1000 * t_vocode, 2),
                "sample_frac": round(t_sample / (t_sample + t_vocode), 3),
                "e2e_rtf_if_sequential": round(audio_sec / (t_sample + t_vocode), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
