"""Dataset -> MFA-corpus converters.

Capability parity with the reference ``tools/mfa/`` converter stable
(LJSpeech / LibriSpeech / JSUT / aishell / opencpop / opensinger /
m4singer): each dataset layout is rewritten into the Montreal Forced
Aligner corpus format (``<speaker>/<utt>.wav`` + ``<utt>.lab`` transcript
sidecars), consolidated behind one ``--format`` CLI.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path


def write_lab(path: Path, text: str):
    path.with_suffix(".lab").write_text(text.strip() + "\n", encoding="utf-8")


def convert_ljspeech(src: Path, dst: Path):
    meta = src / "metadata.csv"
    spk = dst / "ljspeech"
    spk.mkdir(parents=True, exist_ok=True)
    for line in meta.read_text(encoding="utf-8").splitlines():
        parts = line.split("|")
        if len(parts) < 3:
            continue
        name, _, normalized = parts[0], parts[1], parts[2]
        wav = src / "wavs" / f"{name}.wav"
        if not wav.exists():
            continue
        shutil.copy2(wav, spk / wav.name)
        write_lab(spk / wav.name, normalized)


def convert_librispeech(src: Path, dst: Path):
    for trans in src.rglob("*.trans.txt"):
        for line in trans.read_text().splitlines():
            utt, _, text = line.partition(" ")
            speaker = utt.split("-")[0]
            wav = trans.parent / f"{utt}.flac"
            if not wav.exists():
                wav = trans.parent / f"{utt}.wav"
            if not wav.exists():
                continue
            spk = dst / speaker
            spk.mkdir(parents=True, exist_ok=True)
            shutil.copy2(wav, spk / wav.name)
            write_lab(spk / wav.name, text.lower())


def convert_opencpop(src: Path, dst: Path):
    trans = src / "transcriptions.txt"
    spk = dst / "opencpop"
    spk.mkdir(parents=True, exist_ok=True)
    for line in trans.read_text(encoding="utf-8").splitlines():
        parts = line.split("|")
        if len(parts) < 4:
            continue
        name, _text, pinyin = parts[0], parts[1], parts[2]
        wav = src / "wavs" / f"{name}.wav"
        if not wav.exists():
            continue
        shutil.copy2(wav, spk / wav.name)
        write_lab(spk / wav.name, pinyin)


def convert_jsut(src: Path, dst: Path):
    spk = dst / "jsut"
    spk.mkdir(parents=True, exist_ok=True)
    for trans in src.rglob("transcript_utf8.txt"):
        for line in trans.read_text(encoding="utf-8").splitlines():
            name, _, text = line.partition(":")
            wav = trans.parent / "wav" / f"{name}.wav"
            if not wav.exists():
                continue
            shutil.copy2(wav, spk / wav.name)
            write_lab(spk / wav.name, text)


def convert_aishell(src: Path, dst: Path):
    trans_file = next(src.rglob("*transcript*.txt"), None)
    assert trans_file, "no transcript file found"
    transcripts = {}
    for line in trans_file.read_text(encoding="utf-8").splitlines():
        utt, _, text = line.partition(" ")
        transcripts[utt.strip()] = text.replace(" ", "")
    for wav in src.rglob("*.wav"):
        utt = wav.stem
        if utt not in transcripts:
            continue
        speaker = utt[6:11] if len(utt) > 11 else "aishell"
        spk = dst / speaker
        spk.mkdir(parents=True, exist_ok=True)
        shutil.copy2(wav, spk / wav.name)
        write_lab(spk / wav.name, transcripts[utt])


def convert_singing_folder(src: Path, dst: Path):
    """opensinger / m4singer-style: speaker folders with per-utterance wav +
    txt pairs."""
    for wav in src.rglob("*.wav"):
        txt = wav.with_suffix(".txt")
        if not txt.exists():
            continue
        speaker = wav.parent.name
        spk = dst / speaker
        spk.mkdir(parents=True, exist_ok=True)
        shutil.copy2(wav, spk / wav.name)
        write_lab(spk / wav.name, txt.read_text(encoding="utf-8"))


CONVERTERS = {
    "ljspeech": convert_ljspeech,
    "librispeech": convert_librispeech,
    "opencpop": convert_opencpop,
    "jsut": convert_jsut,
    "aishell": convert_aishell,
    "opensinger": convert_singing_folder,
    "m4singer": convert_singing_folder,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--format", choices=sorted(CONVERTERS), required=True)
    parser.add_argument("--source", required=True)
    parser.add_argument("--target", required=True)
    args = parser.parse_args()

    CONVERTERS[args.format](Path(args.source), Path(args.target))
    n = sum(1 for _ in Path(args.target).rglob("*.lab"))
    print(f"[mfa] {args.format}: {n} utterances -> {args.target}")


if __name__ == "__main__":
    main()
