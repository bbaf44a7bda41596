"""Phoneme dictionary loading (parity with reference
``fish_diffusion/utils/dictionary.py:5-33``): TSV pinyin->phones, unique
sorted phone list with optional AP/SP special tokens."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple, Union


def load_dictionary(
    path: Union[str, Path], with_special_tokens: bool = True
) -> Tuple[Dict[str, List[str]], List[str]]:
    pinyin_to_phones = {}

    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            pinyin, phones = line.split("\t")
            pinyin_to_phones[pinyin] = phones.split(" ")

    unique_phones = sorted(
        set(phone for phones in pinyin_to_phones.values() for phone in phones)
    )

    if with_special_tokens:
        unique_phones = ["AP", "SP"] + unique_phones

    return pinyin_to_phones, unique_phones
