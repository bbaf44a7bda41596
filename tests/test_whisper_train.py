"""Drive the Whisper aligner trainer end-to-end on synthetic fixtures
(VERDICT r3 next #5: the only training loop with zero execution evidence).

Synthetic task: each phone is a pure tone at a distinct frequency, so a
tiny AlignedWhisper must learn frame-aligned phone classification well
above chance within a few dozen steps. The test runs the real
``tools/whisper/train.py`` ``main()`` — TextGrid parsing, augmentation,
masked-optimizer step, artifact writing — not a reimplementation.

Matches reference ``tools/whisper/train.py:29-188``.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _load_train_module():
    spec = importlib.util.spec_from_file_location(
        "whisper_train", ROOT / "tools" / "whisper" / "train.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PHONE_FREQS = {"a": 220.0, "b": 440.0, "c": 880.0, "d": 1760.0}


def _write_fixture(d: Path, idx: int, rng: np.random.Generator):
    """One (wav, TextGrid) pair: 10 tone segments of 1.2 s at 16 kHz —
    dense enough that voiced frames are ~40% of the 30 s Whisper context
    (with sparse targets the CE head just learns the <PAD> majority)."""
    sr = 16000
    phones = rng.choice(list(PHONE_FREQS), 10)
    seg_s = 1.2
    seg = int(seg_s * sr)
    audio = []
    intervals = []
    t0 = 0.0
    for p in phones:
        t = np.arange(seg) / sr
        audio.append(0.5 * np.sin(2 * np.pi * PHONE_FREQS[p] * t))
        intervals.append((t0, t0 + seg_s, p))
        t0 += seg_s
    audio = np.concatenate(audio).astype(np.float32)

    from fish_diffusion_tpu.utils.audio import save_wav

    save_wav(d / f"{idx:03d}.wav", audio, sr)

    body = "".join(
        f"        intervals [{k + 1}]:\n"
        f"            xmin = {s}\n"
        f"            xmax = {e}\n"
        f'            text = "{p}"\n'
        for k, (s, e, p) in enumerate(intervals)
    )
    (d / f"{idx:03d}.TextGrid").write_text(
        'File type = "ooTextFile"\nitem []:\n    item [1]:\n'
        '        class = "IntervalTier"\n        name = "phones"\n'
        + body
    )


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("whisper_data")
    rng = np.random.default_rng(0)
    for i in range(12):
        _write_fixture(d, i, rng)
    # dictionary: one pinyin entry per phone
    dict_file = d / "dict.txt"
    dict_file.write_text(
        "".join(f"{p}\t{p}\n" for p in PHONE_FREQS)
    )
    return d


def test_textgrid_parser(fixture_dir):
    mod = _load_train_module()
    tg = sorted(Path(fixture_dir).glob("*.TextGrid"))[0]
    intervals = mod.parse_textgrid_intervals(tg)
    assert len(intervals) == 10
    assert intervals[0][0] == 0.0
    assert all(p in PHONE_FREQS for _, _, p in intervals)
    assert abs(intervals[-1][1] - 12.0) < 1e-6


def test_trainer_main_learns_above_chance(fixture_dir, tmp_path):
    """Run main() for 150 tiny steps: loss must descend, frame accuracy
    must beat chance by a wide margin on this separable task, and the
    held-out file must classify above zero (150 steps is the validated
    floor for val generalization with the class-balanced CE; at 60 the
    single val file is still chance-level noise)."""
    mod = _load_train_module()
    artifact = tmp_path / "whisper_run.json"
    output = tmp_path / "aligned.pkl"

    series, val = mod.main(
        [
            "--data", str(fixture_dir),
            "--dictionary", str(fixture_dir / "dict.txt"),
            "--output", str(output),
            "--batch-size", "2",
            "--max-steps", "150",
            "--log-every", "10",
            "--lr", "2e-3",
            "--artifact", str(artifact),
            "--dims",
            json.dumps(
                dict(
                    n_audio_state=64,
                    n_audio_head=2,
                    n_audio_layer=2,
                    n_audio_trainable_layers=2,
                    n_phone_state=64,
                    n_phone_head=2,
                    n_phone_layer=1,
                    n_outputs=32,
                )
            ),
        ]
    )

    losses = [r["loss"] for r in series]
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"

    summary = json.loads(artifact.read_text())
    # 4 phones + 7 specials -> chance ~0.09 among voiced frames; distinct
    # pure tones must classify far above that. Per-batch accuracy is noisy
    # (batch 2), so average the last few logged steps.
    acc_tail = float(np.mean([r["acc"] for r in series[-4:]]))
    assert acc_tail > 2.0 * summary["chance_acc"], (acc_tail, summary)
    assert summary["val"] is not None and summary["val"]["acc"] > 0
    assert output.exists()

    # saved checkpoint round-trips through the extractor wrapper
    from fish_diffusion_tpu.extractors.whisper import AlignedWhisperForAudio

    ex = AlignedWhisperForAudio(checkpoint=str(output))
    feats = ex(np.sin(2 * np.pi * 440 * np.arange(16000) / 16000), 16000)
    assert feats.shape[0] == 1 and feats.shape[1] == 32  # n_outputs
