"""IPA text -> phoneme-id sequences (parity with the reference's standalone
``dictionaries/ipa/sequence_phonemes.py``, which tokenises via the ``ipatok``
package and a hand-maintained ``symbols.yaml``).

This version is self-contained: the symbol table is built from the IPA
Unicode blocks at import time (stable, sorted-codepoint ordering), and
tokenisation is NFD decomposition — every base char and combining mark maps
to its own id, with diacritics/tones kept as separate tokens. Reserved ids:
0=<pad>, 1=<bos>, 2=<eos>, 3=<unk>, 4=<bar>.
"""

from __future__ import annotations

import unicodedata

PAD, BOS, EOS, UNK, BAR = 0, 1, 2, 3, 4
_RESERVED = 5


def _build_symbol_table():
    """id table over the IPA-relevant Unicode ranges, sorted by codepoint."""
    ranges = (
        (0x0041, 0x007A),  # basic latin letters
        (0x00E0, 0x00FF),  # latin-1 letters (ç, ø, ...)
        (0x0100, 0x017F),  # latin extended-A
        (0x0250, 0x02AF),  # IPA extensions
        (0x02B0, 0x02FF),  # spacing modifier letters (ʰ, ː, tones)
        (0x0300, 0x036F),  # combining diacritics
        (0x1D00, 0x1D7F),  # phonetic extensions
        (0x2070, 0x209F),  # sub/superscripts
    )
    extras = ".?:!,;'’͡‿|"  # punctuation + tie bars
    chars = []
    for lo, hi in ranges:
        for cp in range(lo, hi + 1):
            ch = chr(cp)
            cat = unicodedata.category(ch)
            if cat.startswith(("L", "M", "S")):
                chars.append(ch)
    for ch in extras:
        if ch not in chars:
            chars.append(ch)
    return {ch: i + _RESERVED for i, ch in enumerate(sorted(set(chars)))}


phonemes_dict = _build_symbol_table()
VOCAB_SIZE = _RESERVED + len(phonemes_dict)


def text_to_sequence(text: str, add_special: bool = False):
    """IPA string -> list of ids. Unknown chars map to <unk> (warned once).

    ``add_special`` wraps the sequence in <bos>/<eos>; ``|`` becomes <bar>.
    """
    seq = [BOS] if add_special else []
    for char in unicodedata.normalize("NFD", text):
        if char.isspace():
            continue
        if char == "|":
            seq.append(BAR)
        elif char in phonemes_dict:
            seq.append(phonemes_dict[char])
        else:
            print(f"Unknown phoneme: {char!r}")
            seq.append(UNK)
    if add_special:
        seq.append(EOS)
    return seq


def sequence_to_text(seq) -> str:
    inv = {v: k for k, v in phonemes_dict.items()}
    special = {PAD: "", BOS: "", EOS: "", UNK: "�", BAR: "|"}
    return "".join(special.get(i, inv.get(i, "�")) for i in seq)
