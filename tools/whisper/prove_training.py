"""Hardware proof run for the Whisper aligner trainer.

VERDICT r3 next #5 second half: the CPU test (tests/test_whisper_train.py)
drives ``tools/whisper/train.py`` ``main()`` on synthetic fixtures; this
driver repeats that on the real chip at a bigger aligner size and records
the loss/accuracy series + wall breakdown to a committed artifact.

Task: each phone is a pure tone at a distinct frequency (frame-separable),
so frame accuracy well above chance proves the CE head, masking, and the
jitted masked-optimizer step all work at scale on hardware.

SCOPE: this proof demonstrates TRAINING DYNAMICS (loss descent, voiced-frame
accuracy above chance on the train distribution, stable optimizer behavior
at production dims) — not held-out generalization. Generalization is pinned
at fixture scale by tests/test_whisper_train.py (val acc > 0 asserted); here
the corpus is tiny (default 24 synthetic files) so the held-out accuracy is
high-variance even with several files held out (``--val-frac`` below).

Matches reference ``tools/whisper/train.py:29-188``.

Usage (single TPU chip):
    python tools/whisper/prove_training.py \
        --out docs/artifacts/whisper_train_r04.json
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))


def _load(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--n-files", type=int, default=24)
    parser.add_argument("--data-dir", default="/tmp/whisper_hw_data")
    parser.add_argument("--out", default="docs/artifacts/whisper_train_r04.json")
    args = parser.parse_args()

    import jax

    import fish_diffusion_tpu  # noqa: F401  (honors JAX_PLATFORMS pre-init)

    test_mod = _load("whisper_fixtures", ROOT / "tests" / "test_whisper_train.py")
    train_mod = _load("whisper_train", ROOT / "tools" / "whisper" / "train.py")

    d = Path(args.data_dir)
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(args.n_files):
        test_mod._write_fixture(d, i, rng)
    dict_file = d / "dict.txt"
    dict_file.write_text(
        "".join(f"{p}\t{p}\n" for p in test_mod.PHONE_FREQS)
    )

    # whisper-tiny audio-tower dims (the aligner's production floor):
    # 4 layers x 384 state, 2 of them trainable, + the phone encoder
    dims = dict(
        n_audio_state=384,
        n_audio_head=6,
        n_audio_layer=4,
        n_audio_trainable_layers=2,
        n_phone_state=384,
        n_phone_head=6,
        n_phone_layer=2,
        n_outputs=256,
    )

    t0 = time.perf_counter()
    series, val = train_mod.main(
        [
            "--data", str(d),
            "--dictionary", str(dict_file),
            "--output", str(d / "aligned_whisper_hw.pkl"),
            "--batch-size", str(args.batch_size),
            "--max-steps", str(args.steps),
            "--log-every", "10",
            # hyperparameter record (three failed regimes on hardware):
            # 1e-3, no warmup  -> diverges by step ~30 at this size;
            # 3e-4 + warmup    -> stable, ~3x chance train acc by step 500,
            #                     val still noise;
            # 1e-3 + warmup    -> embedding collapse (emb->0.08, CE pinned
            #                     at chance) because the random-init tower
            #                     has no pretrained features anchoring the
            #                     L1 term. The emb-loss ramp (CE learns
            #                     discriminative features first) is the
            #                     stable fast point.
            "--lr", "1e-3",
            "--warmup-steps", "100",
            "--emb-warmup-steps", "400",
            # hold out ~4 of 24 files (not 1) so the recorded val metrics
            # average over more than a single fixture (ADVICE r4)
            "--val-frac", "0.15",
            "--dims", json.dumps(dims),
            "--artifact", str(d / "inner_artifact.json"),
        ]
    )
    wall = time.perf_counter() - t0

    inner = json.loads((d / "inner_artifact.json").read_text())
    summary = {
        **inner,
        "platform": jax.devices()[0].platform,
        "n_files": args.n_files,
        "total_wall_seconds": wall,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    print(
        f"[whisper-hw] {args.steps} steps in {wall:.0f}s, "
        f"loss {series[0]['loss']:.3f}->{series[-1]['loss']:.3f}, "
        f"val_acc={val.get('acc')}; wrote {out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
