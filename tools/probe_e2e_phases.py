"""Phase-timing for bench.py's first (headline e2e) probe: where do the
~450 s go on a warm persistent cache?"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - t0:8.1f}s] {label}", flush=True)


from fish_diffusion_tpu.models import build_model
from fish_diffusion_tpu.models.vocoders import NsfHifiGAN, NsfHifiGANGenerator

mark("imports done")

SR, HOP, BATCH, FRAMES, HIDDEN = 44100, 512, 4, 1024, 256
compute_dtype = jnp.bfloat16

model_cfg = dict(
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
            dtype=compute_dtype,
        ),
        sampler_interval=10,
        spec_min=[-5],
        spec_max=[0],
    ),
    text_encoder=dict(
        type="NaiveProjectionEncoder", input_size=HIDDEN, output_size=HIDDEN
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
model = build_model(model_cfg)
mark("build_model")

rng = np.random.default_rng(0)
batch = {
    "speakers": jnp.zeros((BATCH,), jnp.int32),
    "contents": jnp.asarray(rng.standard_normal((BATCH, FRAMES, 256)), jnp.float32),
    "mel": jnp.asarray(rng.uniform(-4, 0, (BATCH, FRAMES, 128)), jnp.float32),
    "pitches": jnp.asarray(rng.uniform(80, 600, (BATCH, FRAMES)), jnp.float32),
}
mark("batch on device")

variables = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
    speakers=batch["speakers"],
    contents=batch["contents"],
    mel=batch["mel"],
    pitches=batch["pitches"],
)
jax.block_until_ready(variables)
mark("model.init")

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
    dtype=compute_dtype,
)
voc_params = vocoder.init_random(jax.random.PRNGKey(3), n_frames=8)
jax.block_until_ready(voc_params)
mark("vocoder init")


@jax.jit
def e2e(params, voc_params, batch, rng):
    mel = model.apply(
        {"params": params},
        speakers=batch["speakers"],
        contents=batch["contents"],
        pitches=batch["pitches"],
        method=model.sample,
        rngs={"diffusion": rng},
    )
    wav = vocoder.generator.apply(
        {"params": voc_params},
        0.434294 * mel,
        batch["pitches"],
        rngs={"noise": jax.random.fold_in(rng, 1)},
    )
    return jnp.sum(wav.astype(jnp.float32))


params = variables["params"]
c = e2e(params, voc_params, batch, jax.random.PRNGKey(10))
mark("e2e first call (compile)")
print("checksum", float(c), flush=True)
mark("e2e first value")
for i in range(5):
    c = e2e(params, voc_params, batch, jax.random.PRNGKey(11 + i))
    float(c)
mark("e2e 5 more calls")
