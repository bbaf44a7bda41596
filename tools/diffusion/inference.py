"""SVC inference CLI (parity with reference ``tools/diffusion/inference.py``
main: config/checkpoint/input/output/speaker/pitch-adjust/sampler-interval/
skip-steps/extract-vocals flags + batch directory mode)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--speaker", type=str, default="0")
    parser.add_argument("--pitch-adjust", type=float, default=0)
    parser.add_argument("--sampler-interval", type=int, default=None)
    parser.add_argument("--skip-steps", type=int, default=0)
    parser.add_argument("--sampler", type=str, default=None,
                        choices=[None, "naive", "plms", "unipc"])
    parser.add_argument("--silence-threshold", type=int, default=60)
    parser.add_argument("--max-slice-duration", type=float, default=30.0)
    parser.add_argument("--min-silence-duration", type=float, default=0)
    parser.add_argument("--extract-vocals", action="store_true",
                        help="separate vocals (needs local demucs weights); "
                        "NOTE: reference CLI defaults this ON, here it is "
                        "opt-in because demucs is not bundled")
    parser.add_argument("--pitches-path", type=str, default=None,
                        help="restore a frame-f0 curve from .json/.npy")
    parser.add_argument("--batch", action="store_true",
                        help="treat input/output as directories")
    parser.add_argument("--batch-segments", type=int, default=0,
                        help="group up to N same-bucket segments per sample "
                        "call (throughput mode; >1 enables batching)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard batched sample calls over all devices "
                        "(jax.sharding data axis); use with --batch-segments")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from fish_diffusion_tpu.inference import SVCInference

    mesh = None
    if args.data_parallel:
        from fish_diffusion_tpu.parallel import make_mesh

        mesh = make_mesh(axis_shapes=(-1,), axis_names=("data",))
        print(f"[inference] data-parallel over {mesh.shape['data']} devices")

    engine = SVCInference(args.config, args.checkpoint, mesh=mesh)

    kwargs = dict(
        speaker=args.speaker,
        pitch_adjust=args.pitch_adjust,
        sampler_interval=args.sampler_interval,
        skip_steps=args.skip_steps,
        noise_predictor=args.sampler,
        silence_threshold=args.silence_threshold,
        max_slice_duration=args.max_slice_duration,
        min_silence_duration=args.min_silence_duration,
        extract_vocals=args.extract_vocals,
        pitches_path=args.pitches_path,
        seed=args.seed,
        batch_segments=args.batch_segments,
    )

    if args.batch:
        engine.batch_inference(args.input, args.output, **kwargs)
    else:
        engine.inference(args.input, args.output, **kwargs)


if __name__ == "__main__":
    main()
