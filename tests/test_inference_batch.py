"""Batched + mesh-sharded SVC inference (``SVCInference.forward_batch``).

Beyond-parity scaling surface: the reference has no batched or multi-device
inference (its batch mode loops files, ``tools/diffusion/inference.py:
259-291``). Here the batch axis shards over the ``data`` axis of a
``jax.sharding.Mesh`` and GSPMD data-parallels sampling + vocoding.

Runs on the virtual 8-device CPU mesh (conftest.py forces
``--xla_force_host_platform_device_count=8``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_diffusion_tpu.config.config import Config, _to_config_dict
from fish_diffusion_tpu.inference.svc import SVCInference
from fish_diffusion_tpu.models import build_model
from fish_diffusion_tpu.models.vocoders import NsfHifiGAN
from fish_diffusion_tpu.parallel import make_mesh

SR, HOP, HIDDEN = 44100, 512, 32


class FakePitchExtractor:
    hop_length = HOP

    def __call__(self, x, sampling_rate=SR, pad_to=None):
        n = len(x) // HOP if pad_to is None else pad_to
        return np.full(n, 220.0, np.float32)

    def post_process(self, x, sampling_rate, f0, pad_to):
        return np.full(pad_to, 220.0, np.float32)


class FakeFeatureExtractor:
    def __call__(self, audio, sampling_rate=SR):
        t = max(len(audio) // HOP, 1)
        rng = np.random.default_rng(len(audio))
        return rng.standard_normal((1, 256, t)).astype(np.float32)


def tiny_engine(mesh=None):
    model_cfg = dict(
        type="DiffSinger",
        diffusion=dict(
            type="GaussianDiffusion",
            mel_channels=128,
            noise_schedule="linear",
            timesteps=20,
            noise_loss="l1",
            denoiser=dict(
                type="WaveNetDenoiser",
                mel_channels=128,
                d_encoder=HIDDEN,
                residual_channels=32,
                residual_layers=2,
                dilation_cycle=2,
                use_linear_bias=True,
            ),
            sampler_interval=5,
            spec_min=[-5],
            spec_max=[0],
        ),
        text_encoder=dict(
            type="NaiveProjectionEncoder", input_size=256, output_size=HIDDEN
        ),
        speaker_encoder=dict(
            type="NaiveProjectionEncoder",
            input_size=4,
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
        vocoder=dict(
            type="NsfHifiGAN", sampling_rate=SR, hop_length=HOP, mel_channels=128
        ),
    )

    engine = SVCInference.__new__(SVCInference)
    engine.config = Config(_to_config_dict(dict(model=model_cfg)))
    engine.mesh = mesh
    engine.text_features_extractor = FakeFeatureExtractor()
    engine.pitch_extractor = FakePitchExtractor()
    engine.energy_extractor = None
    engine.sampling_rate = SR
    engine.hop_length = HOP
    engine.mel_channels = 128
    engine._sample_cache = {}
    engine._mesh_params = None

    model = build_model(model_cfg)
    engine.model = model

    rng = np.random.default_rng(0)
    init_batch = dict(
        speakers=jnp.zeros((1,), jnp.int32),
        contents=jnp.asarray(rng.standard_normal((1, 64, 256)), jnp.float32),
        mel=jnp.asarray(rng.uniform(-4, 0, (1, 64, 128)), jnp.float32),
        pitches=jnp.full((1, 64), 220.0, jnp.float32),
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        **init_batch,
    )
    engine.params = variables["params"]

    vocoder = NsfHifiGAN(
        sampling_rate=SR,
        hop_length=HOP,
        mel_channels=128,
        use_natural_log=False,
        generator_config=dict(upsample_initial_channel=32),
        random_init=True,
    )
    engine.vocoder = vocoder
    return engine


@pytest.fixture(scope="module")
def engine():
    return tiny_engine()


def make_segments():
    t = np.arange(50000) / SR
    seg1 = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    seg2 = (0.2 * np.sin(2 * np.pi * 330 * t[:30000])).astype(np.float32)
    return [seg1, seg2]


def test_forward_batch_shapes(engine):
    segs = make_segments()
    speakers = jnp.zeros((1,), jnp.int32)
    outs = engine.forward_batch(segs, speakers, seed=3)
    assert len(outs) == 2
    for seg, out in zip(segs, outs):
        assert out.shape == seg.shape
        n_voiced = (len(seg) // HOP) * HOP
        assert np.isfinite(out).all()
        assert np.abs(out[:n_voiced]).max() > 0


def test_forward_batch_mesh_matches_single_device(engine):
    """Sharded sampling is the same program: GSPMD must not change the math
    (same PRNG key + same batch shape -> allclose outputs)."""
    segs = make_segments()
    speakers = jnp.zeros((1,), jnp.int32)

    ref = engine.forward_batch(segs, speakers, seed=7)

    mesh = make_mesh(axis_shapes=(2,), axis_names=("data",),
                     devices=jax.devices()[:2])
    sharded_engine = tiny_engine(mesh=mesh)
    # identical weights so outputs are comparable
    sharded_engine.params = engine.params
    sharded_engine.vocoder = engine.vocoder

    outs = sharded_engine.forward_batch(segs, speakers, seed=7)
    for a, b in zip(ref, outs):
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-3)


def test_inference_batch_segments_path(engine, tmp_path):
    """`inference(batch_segments=N)` groups slices into batched sample calls
    and still writes a full-length output file."""
    from fish_diffusion_tpu.utils.audio import load_wav, save_wav

    t = np.arange(int(1.8 * SR)) / SR
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    src = tmp_path / "in.wav"
    dst = tmp_path / "out.wav"
    save_wav(src, audio, SR)

    out = engine.inference(
        src, dst, speaker=0, max_slice_duration=0.6, batch_segments=4, seed=5
    )
    assert len(out) == len(audio)
    assert np.abs(out).max() > 0
    written, sr = load_wav(dst)
    assert sr == SR and len(written) == len(audio)


def test_forward_batch_unvoiced_padding(engine):
    """An all-silent segment comes back as silence; mesh batch padding (2
    voiced -> pad to 8 rows on an 8-way mesh) must not corrupt outputs."""
    mesh = make_mesh(axis_shapes=(-1,), axis_names=("data",))
    eng = tiny_engine(mesh=mesh)
    segs = make_segments() + [np.zeros(40000, np.float32)]

    class SilenceAwarePitch(FakePitchExtractor):
        def post_process(self, x, sampling_rate, f0, pad_to):
            if np.abs(x).max() < 1e-6:
                return np.zeros(pad_to, np.float32)
            return np.full(pad_to, 220.0, np.float32)

    eng.pitch_extractor = SilenceAwarePitch()
    outs = eng.forward_batch(segs, jnp.zeros((1,), jnp.int32), seed=1)
    assert len(outs) == 3
    assert np.abs(outs[2]).max() == 0  # unvoiced -> silence
    assert np.abs(outs[0]).max() > 0 and np.abs(outs[1]).max() > 0
