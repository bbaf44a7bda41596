"""Tokenizer feature extractors + Encodec.

Capability parity with the reference:
- ``BertTokenizer`` / ``LlamaTokenizer``
  (``modules/feature_extractors/bert_tokenizer.py:11``,
  ``llama_tokenizer.py:11-31``): read the ``.txt`` transcript sidecar next
  to the audio file and emit token ids with the ``[spk] X [txt] Y [mel]``
  prompt format.
- ``Encodec`` (``encodec.py:10-56``): HF EncodecModel codes; decode-from-
  codes override, optional first-codebook-only.

Pretrained tokenizers/models load from explicit local paths (HF hub access
requires network, which production TPU pods often lack — pass
``model_name`` as a local directory).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..registry import FEATURE_EXTRACTORS
from .feature import BaseFeatureExtractor


class _TokenizerBase(BaseFeatureExtractor):
    prompt = "[spk] {speaker} [txt] {text} [mel]"

    def __init__(self, model_name: str, speaker: str = "default"):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.speaker = speaker

    def __call__(self, audio_path, sampling_rate=None) -> np.ndarray:
        """Reads ``<audio>.txt`` sidecar -> token ids [1, 1, n_tokens]."""
        txt_path = Path(audio_path).with_suffix(".txt")
        text = txt_path.read_text(encoding="utf-8").strip()
        prompt = self.prompt.format(speaker=self.speaker, text=text)
        ids = np.asarray(self.tokenizer.encode(prompt), np.int64)
        return ids[None, None, :]


@FEATURE_EXTRACTORS.register_module()
class BertTokenizer(_TokenizerBase):
    def __init__(self, model_name: str = "bert-base-cased", **kwargs):
        super().__init__(model_name, **kwargs)


@FEATURE_EXTRACTORS.register_module()
class LlamaTokenizer(_TokenizerBase):
    def __init__(self, model_name: str = "meta-llama/Llama-2-7b-chat-hf", **kwargs):
        super().__init__(model_name, **kwargs)


@FEATURE_EXTRACTORS.register_module()
class Encodec(BaseFeatureExtractor):
    """Encodec codes as content features (reference encodec.py:10-56).

    Runs the HF torch EncodecModel on host at preprocessing time (a one-off
    offline step; the training/inference hot paths never touch it). Weights
    must be available locally.
    """

    sampling_rate = 24000

    def __init__(
        self,
        model_name: str = "facebook/encodec_24khz",
        first_codebook_only: bool = False,
    ):
        self.model_name = model_name
        self.first_codebook_only = first_codebook_only
        self._model = None

    def _load(self):
        if self._model is None:
            from transformers import EncodecModel

            self._model = EncodecModel.from_pretrained(self.model_name)
            self._model.eval()
        return self._model

    def __call__(self, audio, sampling_rate=44100) -> np.ndarray:
        import torch

        model = self._load()
        audio = self.preprocess(audio, sampling_rate)

        with torch.no_grad():
            out = model.encode(
                torch.from_numpy(np.asarray(audio))[None, None, :],
                bandwidth=6.0,
            )
        codes = out.audio_codes[0, 0]  # [n_codebooks, T]
        if self.first_codebook_only:
            codes = codes[:1]
        return codes.numpy().astype(np.float32)[None]  # [1, C, T]

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """Decode-from-codes override (reference encodec.py:32-49)."""
        import torch

        model = self._load()
        with torch.no_grad():
            audio = model.decode(
                torch.from_numpy(np.asarray(codes, np.int64))[None, None],
                [None],
            ).audio_values
        return audio[0, 0].numpy()
