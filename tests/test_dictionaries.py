"""Dictionary / phoneme tooling tests (reference ``dictionaries/ipa/`` and
``fish_diffusion/utils/dictionary.py``)."""

import importlib.util
import sys
import unicodedata
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load_ipa():
    spec = importlib.util.spec_from_file_location(
        "sequence_phonemes", ROOT / "dictionaries/ipa/sequence_phonemes.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sequence_phonemes"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestIPATokenizer:
    def test_roundtrip(self):
        ipa = _load_ipa()
        text = unicodedata.normalize("NFD", "ˈhɛloʊ wɜːld t͡ʃaɪ")
        seq = ipa.text_to_sequence(text)
        assert all(0 <= i < ipa.VOCAB_SIZE for i in seq)
        assert ipa.sequence_to_text(seq) == text.replace(" ", "")

    def test_special_tokens(self):
        ipa = _load_ipa()
        seq = ipa.text_to_sequence("a | b", add_special=True)
        assert seq[0] == ipa.BOS and seq[-1] == ipa.EOS
        assert ipa.BAR in seq

    def test_unknown_maps_to_unk(self):
        ipa = _load_ipa()
        seq = ipa.text_to_sequence("a中")  # CJK char is not IPA
        assert ipa.UNK in seq

    def test_deterministic_table(self):
        a, b = _load_ipa(), _load_ipa()
        assert a.phonemes_dict == b.phonemes_dict


class TestLoadDictionary:
    def test_opencpop_strict(self):
        from fish_diffusion_tpu.utils.dictionary import load_dictionary

        dictionary, phonemes = load_dictionary(
            ROOT / "dictionaries/opencpop-strict.txt"
        )
        assert "AP" in phonemes and "SP" in phonemes
        assert dictionary  # non-empty pinyin -> phonemes map
