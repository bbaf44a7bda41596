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
path the CI parity tests use — at PRODUCTION shapes: the full 20x512
WaveNet (configs/_base_/archs/diff_svc_v2.py:28-35), the full 44.1 kHz
NSF-HiFiGAN stable-v1 config, ContentVec-sized HuBERT (HF base: 768 dim x
12 layers + final_proj, reference content_vec.py:16-54), the real RMVPE
E2E(4, 1, (2, 2)) net (reference rmvpe.py:390), and full-capacity CREPE.

``--all`` runs every check and emits a machine-readable parity report, so
the day real published checkpoints exist (none are in this image —
reference README.md:72-89 names nsf_hifigan-stable-v1 and
content-vec-best-legacy-500), verifying them is ONE command:

    python tools/parity_check.py --all --checkpoint-dir checkpoints/ \
        --report parity_report.json

Checkpoint-dir layout (the reference's own ``checkpoints/`` convention):
    nsf_hifigan/model (+config.json)    diffusion .ckpt at top level
    content-vec-best-legacy-500.pt      rmvpe.pt      crepe-full.pth
Any file absent falls back to random-init through the SAME converter path.

Usage:
    python tools/parity_check.py --random-init          # wavenet+vocoder
    python tools/parity_check.py --all --random-init    # every converter
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
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "preprocessing"))


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


def _make_random_diffusion_sd(ref_dir, production: bool):
    """Random torch checkpoint in the fish layout — production dims are the
    reference's published WaveNet config (diff_svc_v2.py:28-35)."""
    import torch

    ref = load_module(
        ref_dir / "fish_diffusion/modules/wavenet.py", "ref_wavenet_mk"
    )
    torch.manual_seed(0)
    if production:
        dims = dict(
            mel_channels=128, d_encoder=256, residual_channels=512,
            residual_layers=20,
        )
    else:
        dims = dict(
            mel_channels=32, d_encoder=16, residual_channels=24,
            residual_layers=4,
        )
    tnet = ref.WaveNet(use_linear_bias=True, dilation_cycle=4, **dims)
    # the reference zero-initializes the final output projection
    # (reference wavenet.py:192), which makes a random-init parity check
    # vacuous (both nets output exactly 0) — re-randomize it so the
    # comparison exercises the whole converted stack discriminatively
    torch.nn.init.normal_(tnet.output_projection.conv.weight, std=0.05)
    return {
        f"diffusion.denoise_fn.{k}": v.numpy()
        for k, v in tnet.state_dict().items()
    }


def check_contentvec(ckpt_path, report, random_init=False):
    """ContentVec-sized HuBERT (HF base 768x12 + final_proj->256, reference
    content_vec.py:16-54): HF torch forward vs converter -> flax
    HubertEncoder, layer-9 hiddens + projection on the same audio."""
    import torch
    import transformers

    import jax
    import jax.numpy as jnp

    from convert_hubert_checkpoint import convert_hf_hubert
    from fish_diffusion_tpu.extractors.feature import HubertEncoder

    class HubertModelWithFinalProj(transformers.HubertModel):
        def __init__(self, config):
            super().__init__(config)
            self.final_proj = torch.nn.Linear(
                config.hidden_size, config.classifier_proj_size
            )

    if random_init:
        cfg = transformers.HubertConfig(classifier_proj_size=256)
        torch.manual_seed(0)
        tnet = HubertModelWithFinalProj(cfg)
    else:
        tnet = HubertModelWithFinalProj.from_pretrained(ckpt_path)
        cfg = tnet.config
    tnet.eval()

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    output_layer = 9  # reference default

    with torch.no_grad():
        hiddens = tnet(
            torch.from_numpy(audio), output_hidden_states=True
        ).hidden_states
        t_out = tnet.final_proj(hiddens[output_layer]).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = convert_hf_hubert(sd, heads=cfg.num_attention_heads)

    jnet = HubertEncoder(
        dim=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        heads=cfg.num_attention_heads,
        ffn_dim=cfg.intermediate_size,
    )
    enc_params = {k: v for k, v in params.items() if k != "final_proj"}
    with jax.default_matmul_precision("float32"):
        j_hiddens = jnet.apply({"params": enc_params}, jnp.asarray(audio))
        j_out = np.asarray(
            j_hiddens[output_layer - 1] @ params["final_proj"]["kernel"]
            + params["final_proj"]["bias"]
        )

    report["contentvec_l1"] = float(np.abs(j_out - t_out).mean())
    report["contentvec_max"] = float(np.abs(j_out - t_out).max())


def _load_reference_rmvpe(ref_dir):
    """Load the reference's vendored RMVPE module standalone, shimming the
    imports this image lacks (librosa/torchaudio — only the net classes are
    exercised, not the audio frontend)."""
    import types

    ref_path = ref_dir / "fish_diffusion/modules/pitch_extractors/rmvpe.py"
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(*, sr, n_fft, n_mels, fmin, fmax, htk=True):
            from fish_diffusion_tpu.extractors.rmvpe import (
                htk_mel_filter_bank,
            )

            return np.asarray(htk_mel_filter_bank(sr, n_fft, n_mels, fmin, fmax))

        filters.mel = mel
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.functional = types.ModuleType("torchaudio.functional")
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = ta.functional

    pkg = types.ModuleType("refpitch")
    pkg.__path__ = [str(ref_path.parent)]
    sys.modules["refpitch"] = pkg
    builder = types.ModuleType("refpitch.builder")

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    builder.PITCH_EXTRACTORS = _Reg()
    builder.BasePitchExtractor = type(
        "BasePitchExtractor", (), {"__init__": lambda self, *a, **k: None}
    )
    sys.modules["refpitch.builder"] = builder

    spec = importlib.util.spec_from_file_location("refpitch.rmvpe", ref_path)
    m = importlib.util.module_from_spec(spec)
    sys.modules["refpitch.rmvpe"] = m
    spec.loader.exec_module(m)
    return m


def check_rmvpe(ckpt_path, ref_dir, report, random_init=False):
    """Full RMVPE net — E2E(4, 1, (2, 2)), the real published architecture
    (reference rmvpe.py:390): torch forward vs converter -> flax E2E."""
    import torch

    import jax
    import jax.numpy as jnp

    from convert_rmvpe_checkpoint import convert
    from fish_diffusion_tpu.extractors.rmvpe import E2E

    ref = _load_reference_rmvpe(ref_dir)
    # seed BEFORE construction: E2E draws its weights at __init__, so the
    # random-init parity numbers must not depend on ambient RNG state.
    torch.manual_seed(0)
    tnet = ref.E2E(4, 1, (2, 2))
    if not random_init:
        cp = torch.load(ckpt_path, map_location="cpu")
        sd_in = cp.get("model", cp.get("state_dict", cp))
        tnet.load_state_dict(
            {k.replace("model.", "", 1): v for k, v in sd_in.items()}
        )
    tnet.eval()

    rng = np.random.default_rng(11)
    B, T, M = 1, 128, 128
    mel = rng.uniform(0, 1, (B, M, T)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(mel)).numpy()

    variables = convert({k: v.numpy() for k, v in tnet.state_dict().items()})
    jnet = E2E(n_blocks=4, n_gru=1)
    with jax.default_matmul_precision("float32"):
        j_out = np.asarray(
            jnet.apply(variables, jnp.asarray(mel.transpose(0, 2, 1)))
        )

    report["rmvpe_l1"] = float(np.abs(j_out - t_out).mean())
    report["rmvpe_max"] = float(np.abs(j_out - t_out).max())


def check_crepe(ckpt_path, report, random_init=False):
    """Full-capacity CREPE: torchcrepe-layout torch mirror (the layout the
    converter maps — torchcrepe itself is not in this image) vs converter
    -> flax Crepe, same frames -> same 360-bin salience."""
    import torch

    import jax
    import jax.numpy as jnp

    from convert_crepe_checkpoint import convert_state_dict
    from fish_diffusion_tpu.extractors.crepe import Crepe

    # mirror of torchcrepe/model.py in its state-dict key layout
    import functools

    import torch.nn.functional as F

    class TorchCrepe(torch.nn.Module):
        def __init__(self):
            super().__init__()
            in_ch = [1, 1024, 128, 128, 128, 256]
            out_ch = [1024, 128, 128, 128, 256, 512]
            kernels = [(512, 1)] + 5 * [(64, 1)]
            strides = [(4, 1)] + 5 * [(1, 1)]
            bn = functools.partial(
                torch.nn.BatchNorm2d, eps=1e-3, momentum=0.0
            )
            for i in range(6):
                setattr(
                    self,
                    f"conv{i + 1}",
                    torch.nn.Conv2d(in_ch[i], out_ch[i], kernels[i], strides[i]),
                )
                setattr(self, f"conv{i + 1}_BN", bn(out_ch[i]))
            self.in_features = 2048
            self.classifier = torch.nn.Linear(self.in_features, 360)

        def forward(self, x):
            pads = [(254, 254)] + 5 * [(31, 32)]
            x = x[:, None, :, None]
            for i in range(6):
                x = F.pad(x, (0, 0, pads[i][0], pads[i][1]))
                x = getattr(self, f"conv{i + 1}")(x)
                x = F.relu(x)
                x = getattr(self, f"conv{i + 1}_BN")(x)
                x = F.max_pool2d(x, (2, 1), (2, 1))
            x = x.permute(0, 2, 1, 3).reshape(x.shape[0], self.in_features)
            return torch.sigmoid(self.classifier(x))

    torch.manual_seed(0)
    tnet = TorchCrepe()
    if not random_init:
        sd_in = torch.load(ckpt_path, map_location="cpu")
        tnet.load_state_dict(sd_in.get("state_dict", sd_in))
    tnet.eval()

    rng = np.random.default_rng(3)
    frames = rng.standard_normal((4, 1024)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(frames)).numpy()

    variables = convert_state_dict(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )
    jnet = Crepe(capacity="full")
    with jax.default_matmul_precision("float32"):
        j_out = np.asarray(jnet.apply(variables, jnp.asarray(frames)))

    report["crepe_l1"] = float(np.abs(j_out - t_out).mean())
    report["crepe_max"] = float(np.abs(j_out - t_out).max())


# (check, mean-L1 key, mean tolerance, max key, max tolerance). The 1e-4
# forward-parity bar is on the mean; max tolerances absorb single-element
# f32 reassociation outliers in the deep stacks.
_TOLERANCES = {
    "wavenet": ("denoiser_l1", 1e-4, "denoiser_max", 1e-3),
    "nsf_hifigan": ("vocoder_l1", 1e-4, "vocoder_max", 5e-3),
    "contentvec": ("contentvec_l1", 1e-4, "contentvec_max", 1e-3),
    "rmvpe": ("rmvpe_l1", 1e-4, "rmvpe_max", 1e-3),
    "crepe": ("crepe_l1", 1e-5, "crepe_max", 1e-4),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--diffusion-ckpt", default=None)
    parser.add_argument("--vocoder-ckpt", default=None)
    parser.add_argument("--reference-path", default="/root/reference")
    parser.add_argument("--random-init", action="store_true",
                        help="synthesize random torch checkpoints at "
                        "PRODUCTION shapes through the real reference/HF "
                        "modules and the actual converter scripts")
    parser.add_argument("--all", action="store_true",
                        help="run every converter parity check "
                        "(wavenet/nsf_hifigan/contentvec/rmvpe/crepe)")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="directory holding real published checkpoints "
                        "(reference checkpoints/ layout); any file absent "
                        "falls back to --random-init for that check")
    parser.add_argument("--report", default=None,
                        help="write the machine-readable JSON report here")
    parser.add_argument("--tiny", action="store_true",
                        help="small dims for fast CI self-checks")
    args = parser.parse_args()

    ref_dir = Path(args.reference_path)
    ckpt_dir = Path(args.checkpoint_dir) if args.checkpoint_dir else None

    def find_ckpt(*names):
        if ckpt_dir is None:
            return None
        for name in names:
            p = ckpt_dir / name
            if p.exists():
                return p
        return None

    report: dict = {}
    per_check: dict = {}
    checks = []

    if args.all:
        diff_ckpt = args.diffusion_ckpt or find_ckpt("model.ckpt", "diffusion.ckpt")
        voc_ckpt = args.vocoder_ckpt or find_ckpt("nsf_hifigan/model")
        checks = [
            ("wavenet", lambda: _run_wavenet(diff_ckpt, ref_dir, report, args)),
            ("nsf_hifigan", lambda: check_vocoder(
                voc_ckpt, ref_dir, report, random_init=voc_ckpt is None)),
            ("contentvec", lambda: check_contentvec(
                find_ckpt("content-vec-best-legacy-500.pt", "content-vec-best"),
                report,
                random_init=find_ckpt(
                    "content-vec-best-legacy-500.pt", "content-vec-best"
                ) is None,
            )),
            ("rmvpe", lambda: check_rmvpe(
                find_ckpt("rmvpe.pt", "rmvpe/model.pt"), ref_dir, report,
                random_init=find_ckpt("rmvpe.pt", "rmvpe/model.pt") is None)),
            ("crepe", lambda: check_crepe(
                find_ckpt("crepe-full.pth", "full.pth"), report,
                random_init=find_ckpt("crepe-full.pth", "full.pth") is None)),
        ]
    else:
        if args.diffusion_ckpt or args.random_init:
            checks.append(
                ("wavenet",
                 lambda: _run_wavenet(args.diffusion_ckpt, ref_dir, report, args))
            )
        if args.vocoder_ckpt or args.random_init:
            checks.append(
                ("nsf_hifigan", lambda: check_vocoder(
                    args.vocoder_ckpt, ref_dir, report,
                    random_init=args.random_init))
            )

    for name, fn in checks:
        try:
            fn()
            l1_key, l1_tol, max_key, max_tol = _TOLERANCES[name]
            per_check[name] = {
                "l1": report.get(l1_key),
                "max": report.get(max_key),
                "pass": (
                    report.get(l1_key) is not None
                    and report[l1_key] <= l1_tol
                    and report.get(max_key, 0) <= max_tol
                ),
            }
        except Exception as e:  # a failed check must not hide the others
            per_check[name] = {"error": f"{type(e).__name__}: {e}"[:300],
                               "pass": False}

    print("\n=== parity report ===")
    for k, v in report.items():
        print(f"{k}: {v:.6g}")

    all_pass = bool(per_check) and all(c["pass"] for c in per_check.values())
    summary = {"checks": per_check, "all_pass": all_pass, "report": report}
    if args.report:
        import json

        Path(args.report).write_text(json.dumps(summary, indent=1))
        print(f"wrote {args.report}")
    for name, c in per_check.items():
        print(f"{name}: {'PASS' if c['pass'] else 'FAIL ' + str(c)}")
    print("PASS" if all_pass else "CHECK TOLERANCES")
    return 0 if all_pass else 1


def _run_wavenet(diffusion_ckpt, ref_dir, report, args):
    if diffusion_ckpt is None:
        sd = _make_random_diffusion_sd(ref_dir, production=not args.tiny)
    else:
        import torch

        cp = torch.load(diffusion_ckpt, map_location="cpu")
        sd = {
            k[len("model."):] if k.startswith("model.") else k: v.numpy()
            for k, v in cp.get("state_dict", cp).items()
            if not k.startswith("vocoder.")
        }
    check_wavenet(sd, ref_dir, report)


if __name__ == "__main__":
    sys.exit(main())
