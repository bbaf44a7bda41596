"""AlignedWhisper trainer: align a (partially frozen) Whisper audio encoder
with a tiny phone encoder in a shared embedding space.

Capability parity with the reference ``tools/whisper/train.py:29-188``:
- TextGrid-supervised frame-aligned phone targets at 20 ms (50 fps)
- audio aug: time-stretch, pitch-shift, additive noise
- loss: L1 embedding match on voiced frames + 0.2 * CE phone decoding +
  accuracy metric
- partial freezing of the audio encoder = optax.masked updates (the
  TPU-native requires_grad)

Run:
    python tools/whisper/train.py --dictionary dictionaries/opencpop-strict.txt \
        --data dataset/mfa-data [--whisper-checkpoint whisper_flax.pkl]
"""

from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def parse_textgrid_intervals(path: Path, tier_index: int = 1):
    """Minimal TextGrid parser: [(min_time, max_time, mark)] for one tier."""
    import re

    text = Path(path).read_text(encoding="utf-8", errors="ignore")
    tiers = re.split(r"item \[\d+\]:", text)[1:]
    if tier_index >= len(tiers):
        tier_index = len(tiers) - 1
    tier = tiers[tier_index]

    intervals = []
    for m in re.finditer(
        r'xmin = ([\d.]+)\s*\n\s*xmax = ([\d.]+)\s*\n\s*text = "([^"]*)"', tier
    ):
        intervals.append((float(m.group(1)), float(m.group(2)), m.group(3)))
    return intervals


def augment(audio: np.ndarray, rng: random.Random):
    """Resample-based stretch + noise (reference :54-61)."""
    speed = rng.randint(80, 120) / 100
    new_len = int(round(len(audio) / speed))
    audio = np.interp(
        np.linspace(0, len(audio) - 1, new_len), np.arange(len(audio)), audio
    ).astype(np.float32)
    audio = audio + (
        np.random.normal(0, 0.005, audio.shape) * np.abs(audio).max()
    ).astype(np.float32)
    return audio, speed


def load_sample(tg_file: Path, phonemes, train: bool, rng: random.Random):
    import jax.numpy as jnp

    from fish_diffusion_tpu.extractors.whisper import (
        WHISPER_CTX_FRAMES,
        whisper_log_mel,
    )
    from fish_diffusion_tpu.utils.audio import load_wav
    from fish_diffusion_tpu.extractors.feature import resample_linear

    wav_file = Path(str(tg_file).replace(".TextGrid.opt", ".wav").replace(
        ".TextGrid", ".wav"))
    audio, sr = load_wav(wav_file)
    audio = resample_linear(audio, sr, 16000)

    speed = 1.0
    if train:
        audio, speed = augment(audio, rng)

    mel = np.asarray(whisper_log_mel(audio))[0]  # [80, T]
    mel_len = mel.shape[1]
    if mel_len < WHISPER_CTX_FRAMES:
        mel = np.pad(mel, ((0, 0), (0, WHISPER_CTX_FRAMES - mel_len)))
    else:
        mel = mel[:, :WHISPER_CTX_FRAMES]

    intervals = parse_textgrid_intervals(tg_file)
    aligned = np.zeros(WHISPER_CTX_FRAMES // 2, np.int32)
    for start, end, phone in intervals:
        if phone in phonemes:
            s = int(round(start * 50 / speed))
            e = int(round(end * 50 / speed))
            aligned[s:e] = phonemes.index(phone)

    return mel, aligned


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="dataset/mfa-data")
    parser.add_argument("--dictionary", default="dictionaries/opencpop-strict.txt")
    parser.add_argument("--whisper-checkpoint", default=None,
                        help="converted whisper encoder weights (.pkl)")
    parser.add_argument("--output", default="checkpoints/aligned_whisper.pkl")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--max-steps", type=int, default=40000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--warmup-steps", type=int, default=0,
                        help="linear lr warmup from 0 over this many steps "
                        "(transformer stability at n_audio_state>=384: "
                        "without warmup the embedding losses diverge within "
                        "~100 steps; mirrors the reference trainer's "
                        "warmup scheduler)")
    parser.add_argument("--emb-warmup-steps", type=int, default=0,
                        help="ramp the embedding-match L1 weight 0->1 over "
                        "this many steps. With a RANDOM-INIT audio tower "
                        "the L1 term collapses audio and phone embeddings "
                        "to a shared constant before the CE head can learn "
                        "(observed on the r4 hardware run: emb_loss dove to "
                        "0.08 while voiced CE pinned at chance and accuracy "
                        "at 0). The reference never hits this basin because "
                        "it aligns a PRETRAINED whisper-medium tower "
                        "(reference tools/whisper/train.py:103); ramping "
                        "the term lets CE carve discriminative features "
                        "first. Default 0 = reference-parity constant "
                        "weight.")
    parser.add_argument("--plain-ce", action="store_true",
                        help="use the reference's plain frame-mean "
                        "cross-entropy (reference tools/whisper/train.py "
                        "loss) instead of the default class-balanced CE. "
                        "The balanced CE (voiced and <PAD> frame "
                        "populations averaged separately) is a deliberate "
                        "STANDING DEVIATION from the reference: with "
                        "~60% <PAD> frames a plain mean lets the decoder "
                        "collapse to the majority class (observed on the "
                        "r4 hardware run: CE fell to 1.25 with 0% "
                        "voiced-frame accuracy). Pass this flag for "
                        "strict loss parity.")
    parser.add_argument("--val-frac", type=float, default=0.02,
                        help="fraction of files held out for validation "
                        "(at tiny corpus sizes raise this so the held-out "
                        "accuracy is measured on more than one file)")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--dims", default=None,
                        help="JSON dict of AlignedWhisper size overrides, "
                        "e.g. '{\"n_audio_state\": 64, \"n_audio_layer\": 1}'")
    parser.add_argument("--artifact", default=None,
                        help="write a JSON run summary (loss/acc series, "
                        "steps/s, held-out accuracy)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from fish_diffusion_tpu.extractors.whisper import (
        AlignedWhisper,
        AlignedWhisperForAudio,
    )
    from fish_diffusion_tpu.utils.dictionary import load_dictionary

    _, phonemes = load_dictionary(args.dictionary)
    phonemes = ["<PAD>", "<EOS>", "<UNK>", "AP", "SP"] + phonemes

    files = sorted(Path(args.data).rglob("*.TextGrid*"))
    rng = random.Random(42)
    rng.shuffle(files)
    split = max(int(len(files) * (1.0 - args.val_frac)), 1)
    train_files, val_files = files[:split], files[split:]
    assert train_files, f"no TextGrid files under {args.data}"

    import json

    dims = json.loads(args.dims) if args.dims else {}
    model = AlignedWhisper(n_phones=len(phonemes), **dims)
    wrapper = AlignedWhisperForAudio(
        random_init=True, n_phones=len(phonemes), **dims
    )
    params = wrapper.params
    if args.whisper_checkpoint:
        import pickle

        from fish_diffusion_tpu.training.checkpoint import load_pretrained_params

        with open(args.whisper_checkpoint, "rb") as f:
            pre = pickle.load(f)
        params = load_pretrained_params(pre.get("params", pre), params)

    mask = model.trainable_mask(params)
    if args.warmup_steps > 0:
        lr_sched = optax.linear_schedule(0.0, args.lr, args.warmup_steps)
    else:
        lr_sched = args.lr
    tx = optax.masked(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr_sched)),
        mask,
    )
    opt_state = tx.init(params)

    def loss_fn(params, mels, phones, emb_w=1.0):
        audio_emb = model.apply({"params": params}, mels,
                                method=model.forward_audio)
        phone_emb = model.apply({"params": params}, phones,
                                method=model.forward_phones)

        keep = (phones != 0)[:, :, None]
        emb_loss = jnp.sum(
            jnp.abs(audio_emb - phone_emb) * keep
        ) / jnp.maximum(keep.sum() * audio_emb.shape[-1], 1)

        logits = model.apply({"params": params}, audio_emb,
                             method=model.forward_decoder)
        # Default: class-balanced CE — a deliberate standing deviation from
        # the reference's plain frame-mean F.cross_entropy (gate with
        # --plain-ce for strict parity). Silence/<PAD> frames usually
        # outnumber voiced frames (a 12 s utterance in the 30 s whisper
        # context is ~40% voiced), and a plain frame-mean lets the decoder
        # collapse to the majority <PAD> class (observed: the r4 hardware
        # run descended to CE 1.25 with 0% voiced-frame accuracy). Average
        # the voiced and pad populations separately so each carries equal
        # weight.
        ce_all = optax.softmax_cross_entropy_with_integer_labels(
            logits, phones
        )
        if args.plain_ce:
            ce = jnp.mean(ce_all)
        else:
            voiced = (phones != 0).astype(ce_all.dtype)
            ce_voiced = jnp.sum(ce_all * voiced) / jnp.maximum(
                voiced.sum(), 1
            )
            ce_pad = jnp.sum(ce_all * (1 - voiced)) / jnp.maximum(
                (1 - voiced).sum(), 1
            )
            ce = 0.5 * ce_voiced + 0.5 * ce_pad

        acc = jnp.mean(
            (jnp.argmax(logits, -1) == phones) * (phones != 0)
        ) / jnp.maximum(jnp.mean(phones != 0), 1e-9)

        total = emb_w * emb_loss + 0.2 * ce
        return total, {"emb_loss": emb_loss, "ce": ce, "acc": acc}

    @jax.jit
    def train_step(params, opt_state, mels, phones, emb_w):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mels, phones, emb_w
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    series = []
    step = 0
    t0 = time.time()
    while step < args.max_steps:
        batch_files = [rng.choice(train_files) for _ in range(args.batch_size)]
        mels, phones = zip(
            *(load_sample(f, phonemes, True, rng) for f in batch_files)
        )
        emb_w = (
            min(1.0, step / args.emb_warmup_steps)
            if args.emb_warmup_steps > 0
            else 1.0
        )
        params, opt_state, loss, aux = train_step(
            params, opt_state,
            jnp.asarray(np.stack(mels)), jnp.asarray(np.stack(phones)),
            jnp.float32(emb_w),
        )
        step += 1
        if step % args.log_every == 0:
            row = dict(
                step=step,
                loss=float(loss),
                emb_loss=float(aux["emb_loss"]),
                ce=float(aux["ce"]),
                acc=float(aux["acc"]),
                time=time.time(),
            )
            series.append(row)
            print(
                f"[whisper] step {step}: loss={row['loss']:.4f} "
                f"emb={row['emb_loss']:.4f} ce={row['ce']:.4f} "
                f"acc={row['acc']:.3f} "
                f"({step / (time.time() - t0):.2f} it/s)",
                flush=True,
            )

    wall = time.time() - t0
    wrapper.params = params
    wrapper.save(args.output)
    print(f"[whisper] saved {args.output}")

    # held-out evaluation (no augmentation)
    val_metrics = None
    if val_files:
        vm, vp = zip(
            *(load_sample(f, phonemes, False, rng) for f in val_files[:8])
        )
        _, val_aux = jax.jit(loss_fn)(
            params, jnp.asarray(np.stack(vm)), jnp.asarray(np.stack(vp))
        )
        val_metrics = {k: float(v) for k, v in val_aux.items()}
        print(f"[whisper] val: {val_metrics}", flush=True)

    if args.artifact:
        summary = dict(
            n_train_files=len(train_files),
            n_val_files=len(val_files),
            n_phones=len(phonemes),
            dims=dims,
            max_steps=args.max_steps,
            batch_size=args.batch_size,
            wall_seconds=wall,
            steps_per_sec_wall=args.max_steps / max(wall, 1e-9),
            lr=args.lr,
            warmup_steps=args.warmup_steps,
            emb_warmup_steps=args.emb_warmup_steps,
            series=series[:: max(len(series) // 50, 1)],
            loss_first=series[0]["loss"] if series else None,
            loss_last=series[-1]["loss"] if series else None,
            acc_last=series[-1]["acc"] if series else None,
            val=val_metrics,
            chance_acc=1.0 / len(phonemes),
        )
        Path(args.artifact).parent.mkdir(parents=True, exist_ok=True)
        Path(args.artifact).write_text(json.dumps(summary, indent=1))
        print(f"[whisper] artifact -> {args.artifact}", flush=True)
    return series, val_metrics


if __name__ == "__main__":
    main()
