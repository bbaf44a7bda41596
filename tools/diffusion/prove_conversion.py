"""End-to-end SVC conversion proof: the PRODUCT, not the loss curve.

VERDICT r3 next #1. Runs the real pipeline on a synthetic multi-speaker
corpus (``synth_voices.py``: 3 speakers with distinct f0 registers and
static spectral envelopes, parallel phrases):

1. corpus      — render wavs into ``dataset/{train,valid}/<speaker>/``
2. preprocess  — the real CLI (``tools/preprocessing/extract_features.py``)
3. vocoder     — NSF-HiFiGAN trainer CLI (``tools/nsf_hifigan/train.py``)
                 + packaging (``tools/nsf_hifigan/export.py``)
4. diffusion   — training CLI (``tools/diffusion/train.py``), cached-soak
                 regime, multi-speaker config
5. convert     — ``inference/svc.py:SVCInference`` converting held-out
                 speaker-A phrases to speaker B for all ordered pairs
6. evaluate    — objective evidence:
                 * output F0 tracks the (transposed) source within a cents
                   budget (reference knob: ``pitch_adjust``,
                   tools/diffusion/inference.py:107-116)
                 * timbre moves to the target: log-mel embedding confusion
                   matrix (tools/speaker_verification.py)
                 * mel-L1 against the ORACLE rendition — the target
                   speaker singing the same phrase at the transposed
                   source f0 (only possible because the corpus is
                   synthetic and parallel)
                 * same-speaker reconstruction mel-L1 on held-out phrases

Artifact: ``docs/artifacts/svc_conversion_r04.json`` + committed wavs,
with a wall-clock breakdown per phase (VERDICT r3 next #3).

Usage (single TPU chip):
    python tools/diffusion/prove_conversion.py --work /tmp/conv_proof \
        --out docs/artifacts/svc_conversion_r04.json
    python tools/diffusion/prove_conversion.py --smoke   # tiny CPU check
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools" / "diffusion"))

import synth_voices as sv  # noqa: E402

EVAL_PHRASES = 4


# ---------------------------------------------------------------------------
# phase 1: corpus
# ---------------------------------------------------------------------------


def build_corpus(work: Path, n_train: int, n_valid: int, seed: int = 0):
    """Parallel corpus + held-out eval sources and per-pair oracles."""
    from fish_diffusion_tpu.utils.audio import save_wav

    rng = np.random.default_rng(seed)
    phrases = sv.make_phrases(rng, n_train + n_valid + EVAL_PHRASES)
    train_p = phrases[:n_train]
    valid_p = phrases[n_train : n_train + n_valid]
    eval_p = phrases[n_train + n_valid :]

    for split, plist in [("train", train_p), ("valid", valid_p)]:
        for spk in sv.SPEAKERS:
            d = work / "dataset" / split / spk
            d.mkdir(parents=True, exist_ok=True)
            for i, phrase in enumerate(plist):
                audio, _ = sv.render(
                    phrase, spk, np.random.default_rng(hash((spk, split, i)) % 2**31)
                )
                save_wav(d / f"{i:03d}.wav", audio, sv.SR)

    # eval: source renditions + oracle targets for every ordered pair
    eval_dir = work / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    manifest = []
    speakers = list(sv.SPEAKERS)
    for i, phrase in enumerate(eval_p):
        srcs = {}
        for spk in speakers:
            audio, f0 = sv.render(phrase, spk, np.random.default_rng(9000 + i))
            save_wav(eval_dir / f"src_{spk}_{i}.wav", audio, sv.SR)
            srcs[spk] = f0
        for src in speakers:
            for tgt in speakers:
                if src == tgt:
                    continue
                adjust = 12.0 * np.log2(
                    sv.SPEAKERS[tgt]["register"] / sv.SPEAKERS[src]["register"]
                )
                oracle, _ = sv.render(
                    phrase,
                    tgt,
                    np.random.default_rng(9500 + i),
                    f0_override=srcs[src] * 2 ** (adjust / 12),
                )
                save_wav(eval_dir / f"oracle_{src}2{tgt}_{i}.wav", oracle, sv.SR)
                manifest.append(
                    dict(
                        phrase=i,
                        src=src,
                        tgt=tgt,
                        pitch_adjust=float(adjust),
                        source=f"src_{src}_{i}.wav",
                        oracle=f"oracle_{src}2{tgt}_{i}.wav",
                    )
                )
    (eval_dir / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return manifest


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


# content extractors for the proof. "hubert" (default, VERDICT r4 next #4)
# is the REAL full-depth 768x12 HubertSoft tower + 256-d soft-unit
# projection — random-init (no published weights exist in this image) but
# deterministic (PRNGKey(0)), so preprocessing and inference see identical
# features. "cmvn" is the weight-free stand-in the r4 proof used.
_EXTRACTORS = {
    "hubert": 'dict(type="HubertSoft", random_init=True)',
    "cmvn": 'dict(type="CMVNMelExtractor")',
}
_EXTRACTOR_DIM = {"hubert": 256, "cmvn": 128}


def write_preprocess_config(work: Path, extractor: str = "hubert") -> Path:
    cfg = work / "cfg_pre.py"
    cfg.write_text(
        f"""
# preprocessing-only view: content features + native Harvest f0.
# One mel convention everywhere (natural log), shared with the vocoder.
preprocessing = dict(
    text_features_extractor={_EXTRACTORS[extractor]},
    pitch_extractor=dict(type="HarvestPitchExtractor", keep_zeros=False),
)
model = dict(
    vocoder=dict(
        sampling_rate={sv.SR},
        hop_length={sv.HOP},
        mel_channels=128,
        use_natural_log=True,
    ),
)
"""
    )
    return cfg


def write_vocoder_config(work: Path, steps: int, smoke: bool) -> Path:
    cfg = work / "cfg_vocoder.py"
    small = """
model = dict(
    generator=dict(
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    ),
)
""" if smoke else ""
    cfg.write_text(
        f"""
_base_ = ["{ROOT}/configs/vocoder_nsf_hifigan.py"]

dataset = dict(
    train=dict(
        path="{work}/dataset/train",
        segment_size={8192 if smoke else 16384},
        pitch_shift=None,
        loudness_shift=[0.2, 0.9],
    ),
    valid=dict(path="{work}/dataset/valid", segment_size=32768),
)
dataloader = dict(
    train=dict(batch_size={2 if smoke else 16}, shuffle=True, num_workers=1),
    valid=dict(batch_size=2, shuffle=False, num_workers=1),
)
trainer = dict(
    max_steps={steps},
    cache_batches_on_device=True,
    transfer_dtype="float16",
)
{small}
"""
    )
    return cfg


def write_train_config(
    work: Path, spec_min: float, spec_max: float, steps: int,
    val_interval: int, smoke: bool, extractor: str = "hubert",
) -> Path:
    cfg = work / "cfg_train.py"
    smoke_diffusion = (
        "timesteps=50,\n        sampler_interval=5,\n"
        "        denoiser=dict(residual_channels=64, residual_layers=4),"
        if smoke
        else ""
    )
    # the smoke vocoder is trained shrunken — the wrapper must build the
    # matching generator to load its params
    smoke_voc = (
        "generator_config=dict(upsample_initial_channel=64, "
        "resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)),"
        if smoke
        else ""
    )
    cfg.write_text(
        f"""
_base_ = ["{ROOT}/configs/svc_hubert_soft.py"]

from fish_diffusion_tpu.datasets import (
    get_datasets_from_subfolder,
    get_speaker_map_from_subfolder,
)

speaker_mapping = get_speaker_map_from_subfolder("{work}/dataset/train")

dataset = dict(
    _delete_=True,
    train=dict(
        type="ConcatDataset",
        datasets=get_datasets_from_subfolder(
            "NaiveSVCDataset", "{work}/dataset/train", speaker_mapping
        ),
    ),
    valid=dict(
        type="ConcatDataset",
        datasets=get_datasets_from_subfolder(
            "NaiveSVCDataset", "{work}/dataset/valid", speaker_mapping
        ),
    ),
)

preprocessing = dict(
    text_features_extractor=dict(_delete_=True, **{_EXTRACTORS[extractor]}),
    pitch_extractor=dict(type="HarvestPitchExtractor", keep_zeros=False),
)

model = dict(
    text_encoder=dict(input_size={_EXTRACTOR_DIM[extractor]}),
    speaker_encoder=dict(input_size=len(speaker_mapping)),
    diffusion=dict(
        spec_min=[{spec_min}],
        spec_max=[{spec_max}],
        {smoke_diffusion}
    ),
    vocoder=dict(
        checkpoint_path="{work}/vocoder_pkg/model.pkl",
        use_natural_log=True,
        {smoke_voc}
    ),
)

dataloader = dict(
    train=dict(batch_size={4 if smoke else 20}, shuffle=True, num_workers=1),
    valid=dict(batch_size=2, shuffle=False, num_workers=1),
)

trainer = dict(
    max_steps={steps},
    val_check_interval={val_interval},
    limit_val_batches=2,
    log_every_n_steps={5 if smoke else 50},
    cache_batches_on_device=True,
    transfer_dtype="float16",
)
"""
    )
    return cfg


# ---------------------------------------------------------------------------
# subprocess phases
# ---------------------------------------------------------------------------


def run_cli(argv, log_file: Path):
    print(f"[prove] $ {' '.join(str(a) for a in argv)}", flush=True)
    with open(log_file, "w") as f:
        proc = subprocess.run(
            [sys.executable] + [str(a) for a in argv],
            stdout=f, stderr=subprocess.STDOUT, cwd=str(ROOT),
        )
    if proc.returncode != 0:
        print(Path(log_file).read_text()[-4000:], flush=True)
        raise RuntimeError(f"phase failed: {argv[0]} (see {log_file})")


def compute_spec_stats(train_dir: Path):
    mins, maxs = [], []
    for f in sorted(train_dir.rglob("*.npy"))[:200]:
        mel = np.asarray(np.load(f, allow_pickle=True).item()["mel"])
        mins.append(float(mel.min()))
        maxs.append(float(mel.max()))
    assert mins, f"no preprocessed .npy under {train_dir}"
    return min(mins), max(maxs)


def parse_metrics(log_dir: Path):
    """steps/s + val series + wall attribution from a metrics.jsonl."""
    path = log_dir / "metrics.jsonl"
    if not path.exists():
        return {}
    rows = [json.loads(l) for l in open(path)]
    train_rows = [r for r in rows if "train_loss" in r or "loss_mel" in r]
    val_rows = [
        {k: r[k] for k in r if k in ("step", "valid_loss", "valid_mel_l1")}
        for r in rows
        if "valid_loss" in r or "valid_mel_l1" in r
    ]
    out = {"n_validations": len(val_rows), "val_series": val_rows}
    if len(train_rows) >= 2:
        steps = np.asarray([r["step"] for r in train_rows], float)
        times = np.asarray([r["time"] for r in train_rows], float)
        dt, ds = np.diff(times), np.diff(steps)
        keep = (ds > 0) & (dt > 0)
        if keep.any():
            sps = ds[keep] / dt[keep]
            out["steps_per_sec_median"] = float(np.median(sps))
            # wall spent inside logged step intervals vs everything else
            out["stepping_seconds"] = float(dt[keep].sum())
        first_key = "train_loss" if "train_loss" in train_rows[0] else "loss_mel"
        out["train_loss_first"] = train_rows[0].get(first_key)
        out["train_loss_last"] = train_rows[-1].get(first_key)
    return out


# ---------------------------------------------------------------------------
# conversion + evaluation
# ---------------------------------------------------------------------------


def _log_mel(audio: np.ndarray):
    import jax.numpy as jnp

    from fish_diffusion_tpu.ops.mel import LogMelSpectrogram

    # wav2spec applies the log compression (__call__ is the linear mel)
    mel = LogMelSpectrogram(sample_rate=sv.SR, hop_length=sv.HOP).wav2spec(
        jnp.asarray(audio, jnp.float32)[None]
    )
    return np.asarray(mel)[0]  # [M, T]


def _rms_norm(audio: np.ndarray) -> np.ndarray:
    rms = np.sqrt(np.mean(audio**2) + 1e-12)
    return audio * (10 ** (-23 / 20) / (rms + 1e-12))


def _timbre_embedding(audio: np.ndarray) -> np.ndarray:
    mel = _log_mel(_rms_norm(audio))
    return np.concatenate([mel.mean(axis=1), mel.std(axis=1)])


def _cosine_dist(a, b):
    return float(
        1 - np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    )


def convert_and_evaluate(work: Path, cfg_train: Path, manifest, out_wav_dir: Path):
    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.inference.svc import SVCInference
    from fish_diffusion_tpu.registry import PITCH_EXTRACTORS
    from fish_diffusion_tpu.utils.audio import load_wav

    cfg = Config.fromfile(str(cfg_train))
    engine = SVCInference(cfg, checkpoint=str(work / "logs" / "cfg_train" / "checkpoints"))
    eval_dir = work / "eval"
    out_wav_dir.mkdir(parents=True, exist_ok=True)

    f0_ext = PITCH_EXTRACTORS.build(
        dict(type="HarvestPitchExtractor", keep_zeros=False)
    )

    def f0_of(audio):
        n_frames = len(audio) // sv.HOP
        raw = np.asarray(f0_ext(audio, sv.SR, pad_to=None))
        n_true = int(np.ceil(len(audio) / f0_ext.hop_length))
        return np.asarray(
            f0_ext.post_process(audio, sv.SR, raw[:n_true], n_frames)
        )

    # real-speaker timbre centroids from held-out (valid) audio
    centroids = {}
    for spk in sv.SPEAKERS:
        vecs = [
            _timbre_embedding(load_wav(p)[0])
            for p in sorted((work / "dataset" / "valid" / spk).glob("*.wav"))[:6]
        ]
        centroids[spk] = np.mean(vecs, axis=0)

    pair_rows = []
    emb_rows = {}  # row label -> mean distances to centroids
    for m in manifest:
        src_wav = eval_dir / m["source"]
        out_wav = out_wav_dir / f"conv_{m['src']}2{m['tgt']}_{m['phrase']}.wav"
        t0 = time.perf_counter()
        converted = engine.inference(
            src_wav,
            out_wav,
            speaker=m["tgt"],
            pitch_adjust=m["pitch_adjust"],
        )
        convert_s = time.perf_counter() - t0

        source, _ = load_wav(src_wav)
        oracle, _ = load_wav(eval_dir / m["oracle"])

        # F0 tracking (cents vs transposed source, voiced frames)
        f0_src = f0_of(source) * 2 ** (m["pitch_adjust"] / 12)
        f0_out = f0_of(converted)
        n = min(len(f0_src), len(f0_out))
        voiced = (f0_src[:n] > 50) & (f0_out[:n] > 50)
        cents = 1200 * np.abs(np.log2(f0_out[:n][voiced] / f0_src[:n][voiced]))
        voiced_frac = float(voiced.mean())

        # mel-L1 vs the oracle rendition (gain-normalized)
        mel_c = _log_mel(_rms_norm(converted))
        mel_o = _log_mel(_rms_norm(oracle))
        tt = min(mel_c.shape[1], mel_o.shape[1])
        mel_l1 = float(np.mean(np.abs(mel_c[:, :tt] - mel_o[:, :tt])))

        emb = _timbre_embedding(converted)
        dists = {s: _cosine_dist(emb, c) for s, c in centroids.items()}

        row = dict(
            src=m["src"],
            tgt=m["tgt"],
            phrase=m["phrase"],
            pitch_adjust=round(m["pitch_adjust"], 3),
            f0_cents_median=float(np.median(cents)) if cents.size else None,
            f0_cents_mean=float(np.mean(cents)) if cents.size else None,
            voiced_frac=voiced_frac,
            mel_l1_vs_oracle=mel_l1,
            timbre_dist=dists,
            timbre_to_target=dists[m["tgt"]],
            timbre_to_source=dists[m["src"]],
            convert_seconds=convert_s,
        )
        pair_rows.append(row)
        emb_rows.setdefault(f"conv_{m['src']}2{m['tgt']}", []).append(dists)
        print(
            f"[prove] {m['src']}->{m['tgt']} #{m['phrase']}: "
            f"f0 {row['f0_cents_median'] and round(row['f0_cents_median'], 1)}c "
            f"mel-L1 {mel_l1:.3f} "
            f"timbre tgt {dists[m['tgt']]:.4f} src {dists[m['src']]:.4f}",
            flush=True,
        )

    # same-speaker reconstruction on held-out phrases
    recon = []
    for spk in sv.SPEAKERS:
        for i in range(min(2, EVAL_PHRASES)):
            src_wav = eval_dir / f"src_{spk}_{i}.wav"
            out_wav = out_wav_dir / f"recon_{spk}_{i}.wav"
            converted = engine.inference(src_wav, out_wav, speaker=spk)
            source, _ = load_wav(src_wav)
            mel_c = _log_mel(_rms_norm(converted))
            mel_s = _log_mel(_rms_norm(source))
            tt = min(mel_c.shape[1], mel_s.shape[1])
            recon.append(float(np.mean(np.abs(mel_c[:, :tt] - mel_s[:, :tt]))))

    # confusion matrix: real rows + converted rows vs real centroids
    labels = list(sv.SPEAKERS)
    confusion = {}
    for spk in labels:
        vecs = [
            _timbre_embedding(load_wav(p)[0])
            for p in sorted((work / "dataset" / "valid" / spk).glob("*.wav"))[6:10]
        ] or [centroids[spk]]
        emb = np.mean(vecs, axis=0)
        confusion[f"real_{spk}"] = {
            s: _cosine_dist(emb, c) for s, c in centroids.items()
        }
    for key, rows in emb_rows.items():
        confusion[key] = {
            s: float(np.mean([r[s] for r in rows])) for s in labels
        }

    # headline aggregates
    med = [r["f0_cents_median"] for r in pair_rows if r["f0_cents_median"] is not None]
    means = [r["f0_cents_mean"] for r in pair_rows if r["f0_cents_mean"] is not None]
    timbre_wins = sum(
        1 for r in pair_rows if r["timbre_to_target"] < r["timbre_to_source"]
    )
    return dict(
        pairs=pair_rows,
        confusion_matrix=confusion,
        f0_cents_median_overall=float(np.median(med)) if med else None,
        f0_cents_mean_overall=float(np.mean(means)) if means else None,
        mel_l1_vs_oracle_mean=float(
            np.mean([r["mel_l1_vs_oracle"] for r in pair_rows])
        ),
        timbre_moved_to_target=f"{timbre_wins}/{len(pair_rows)}",
        reconstruction_mel_l1_mean=float(np.mean(recon)),
    )


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work", default="/tmp/conv_proof")
    parser.add_argument("--out", default="docs/artifacts/svc_conversion_r04.json")
    parser.add_argument("--wav-out", default="docs/artifacts/conversion_r04")
    parser.add_argument("--n-train", type=int, default=45)
    parser.add_argument("--n-valid", type=int, default=8)
    parser.add_argument("--diffusion-steps", type=int, default=12000)
    parser.add_argument("--val-interval", type=int, default=3000)
    parser.add_argument("--vocoder-steps", type=int, default=6000)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny sizes for a CPU plumbing check")
    parser.add_argument("--skip-corpus", action="store_true")
    parser.add_argument("--skip-preprocess", action="store_true")
    parser.add_argument("--skip-vocoder", action="store_true")
    parser.add_argument("--skip-diffusion", action="store_true")
    parser.add_argument("--fresh", action="store_true")
    parser.add_argument("--extractor", choices=("hubert", "cmvn"),
                        default="hubert",
                        help="content feature stack: the real full-depth "
                        "HubertSoft tower (random-init, deterministic) or "
                        "the weight-free CMVN stand-in the r4 proof used")
    args = parser.parse_args()

    if args.smoke:
        args.n_train, args.n_valid = 3, 2
        args.diffusion_steps, args.val_interval = 40, 20
        args.vocoder_steps = 10

    work = Path(args.work)
    if args.fresh and work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True, exist_ok=True)
    walls = {}

    # 1. corpus ------------------------------------------------------------
    t0 = time.perf_counter()
    if args.skip_corpus and (work / "eval" / "manifest.json").exists():
        manifest = json.loads((work / "eval" / "manifest.json").read_text())
    else:
        manifest = build_corpus(work, args.n_train, args.n_valid)
    walls["corpus"] = time.perf_counter() - t0
    print(f"[prove] corpus: {walls['corpus']:.0f}s "
          f"({args.n_train}+{args.n_valid} phrases x {len(sv.SPEAKERS)} speakers, "
          f"{len(manifest)} conversion pairs)", flush=True)

    # 2. preprocess (real CLI) ----------------------------------------------
    cfg_pre = write_preprocess_config(work, args.extractor)
    t0 = time.perf_counter()
    if not args.skip_preprocess:
        for split in ("train", "valid"):
            run_cli(
                [ROOT / "tools/preprocessing/extract_features.py",
                 "--config", cfg_pre, "--path", work / "dataset" / split],
                work / f"preprocess_{split}.log",
            )
    walls["preprocess"] = time.perf_counter() - t0
    print(f"[prove] preprocess: {walls['preprocess']:.0f}s", flush=True)

    # 3. vocoder (real CLI + export) -----------------------------------------
    cfg_voc = write_vocoder_config(work, args.vocoder_steps, args.smoke)
    t0 = time.perf_counter()
    if not args.skip_vocoder:
        if (work / "logs" / "vocoder").exists():
            shutil.rmtree(work / "logs" / "vocoder")  # fresh run, fresh steps
        run_cli(
            [ROOT / "tools/nsf_hifigan/train.py", "--config", cfg_voc,
             "--log-dir", work / "logs" / "vocoder"],
            work / "vocoder.log",
        )
        run_cli(
            [ROOT / "tools/nsf_hifigan/export.py",
             "--checkpoint", work / "logs" / "vocoder" / "checkpoints",
             "--config", cfg_voc, "--output", work / "vocoder_pkg"],
            work / "vocoder_export.log",
        )
    walls["vocoder_train"] = time.perf_counter() - t0
    voc_metrics = parse_metrics(work / "logs" / "vocoder")
    print(f"[prove] vocoder: {walls['vocoder_train']:.0f}s {voc_metrics.get('steps_per_sec_median')}", flush=True)

    # 4. diffusion (real CLI) -------------------------------------------------
    smin, smax = compute_spec_stats(work / "dataset" / "train")
    cfg_train = write_train_config(
        work, smin, smax, args.diffusion_steps, args.val_interval, args.smoke,
        extractor=args.extractor,
    )
    t0 = time.perf_counter()
    if not args.skip_diffusion:
        if (work / "logs" / "cfg_train").exists():
            shutil.rmtree(work / "logs" / "cfg_train")  # fresh run
        run_cli(
            [ROOT / "tools/diffusion/train.py", "--config", cfg_train,
             "--log-dir", work / "logs"],
            work / "diffusion.log",
        )
    walls["diffusion_train"] = time.perf_counter() - t0
    diff_metrics = parse_metrics(work / "logs" / "cfg_train")
    print(f"[prove] diffusion: {walls['diffusion_train']:.0f}s "
          f"{diff_metrics.get('steps_per_sec_median')} steps/s", flush=True)

    # 5+6. convert + evaluate -------------------------------------------------
    t0 = time.perf_counter()
    results = convert_and_evaluate(
        work, cfg_train, manifest, Path(args.wav_out)
    )
    walls["convert_evaluate"] = time.perf_counter() - t0

    import jax

    summary = dict(
        platform=jax.devices()[0].platform,
        corpus=dict(
            speakers={k: {kk: vv for kk, vv in v.items() if kk != "vib"}
                      for k, v in sv.SPEAKERS.items()},
            n_train_per_speaker=args.n_train,
            n_valid_per_speaker=args.n_valid,
            n_eval_phrases=EVAL_PHRASES,
            content_features=(
                "HubertSoft full-depth 768x12 tower + 256-d soft-unit "
                "projection, random-init PRNGKey(0) (no published weights "
                "in this image; the NETWORK stack is the real one)"
                if args.extractor == "hubert"
                else "CMVNMelExtractor (energy-gated per-utterance CMVN of "
                "log-mel; weight-free stand-in)"
            ),
        ),
        spec_stats=[smin, smax],
        diffusion_steps=args.diffusion_steps,
        vocoder_steps=args.vocoder_steps,
        wall_seconds=walls,
        wall_seconds_total=sum(walls.values()),
        diffusion_metrics=diff_metrics,
        vocoder_metrics=voc_metrics,
        **results,
    )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    print(
        f"[prove] DONE: f0 median {summary['f0_cents_median_overall']} cents, "
        f"mel-L1 vs oracle {summary['mel_l1_vs_oracle_mean']:.3f}, "
        f"timbre moved {summary['timbre_moved_to_target']}, "
        f"recon mel-L1 {summary['reconstruction_mel_l1_mean']:.3f}; "
        f"wrote {out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
