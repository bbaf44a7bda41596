"""SVC inference engine (voice conversion serve path).

Capability parity with the reference ``tools/diffusion/inference.py``
(SVCInference):
- builds feature/pitch/energy extractors from ``config.preprocessing`` (:54-66)
- loads the latest checkpoint from a directory (natural step order, :68-74)
- end-to-end ``inference()``: load -> loudness norm -> silence slicing ->
  per-segment forward (pitch shift x 2^(n/12), contents repeat_expand,
  condition assembly, reverse diffusion, vocoder) -> overlap-write (:222-389)
- speaker parsing: int id | name via ``config.speaker_mapping`` |
  ``"a:0.6,b:0.4"`` embedding mix (:164-220)
- shallow diffusion: ``skip_steps`` + input-audio mel warm start (:98-104)
- batch-directory mode (:259-291)

TPU-first: every segment is padded to a FRAME BUCKET (power-of-two-ish
ladder) before the jitted sample step, so arbitrary-length audio reuses a
handful of compiled programs; padding is masked out of the condition.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import build_model
from ..registry import (
    ENERGY_EXTRACTORS,
    FEATURE_EXTRACTORS,
    PITCH_EXTRACTORS,
    VOCODERS,
)
from ..ops.tensor import repeat_expand
from ..utils.audio import load_wav, save_wav, slice_audio

# frame buckets for jit reuse: ~1.5 s .. 30 s at hop 512 / 44.1 kHz
_BUCKETS = (128, 256, 512, 1024, 1536, 2048, 2600)


def _bucket_for(n_frames: int) -> int:
    for b in _BUCKETS:
        if n_frames <= b:
            return b
    return ((n_frames + 255) // 256) * 256


class SVCInference:
    def __init__(self, config, checkpoint: Optional[str] = None):
        if isinstance(config, (str, Path)):
            config = Config.fromfile(config)
        self.config = config

        import fish_diffusion_tpu.extractors  # noqa: F401

        pre = config.preprocessing
        self.text_features_extractor = FEATURE_EXTRACTORS.build(
            dict(pre.text_features_extractor)
        )
        self.pitch_extractor = PITCH_EXTRACTORS.build(dict(pre.pitch_extractor))
        self.energy_extractor = (
            ENERGY_EXTRACTORS.build(dict(pre.energy_extractor))
            if pre.get("energy_extractor")
            else None
        )

        self.model = build_model(config.model)
        self.params = None
        if checkpoint is not None:
            self.load_checkpoint(checkpoint)

        voc_cfg = dict(config.model.vocoder)
        try:
            self.vocoder = VOCODERS.build(voc_cfg)
        except Exception as e:
            print(f"[inference] vocoder checkpoint unavailable ({e}); "
                  "call set_vocoder() before synthesis")
            self.vocoder = None

        self.sampling_rate = config.model.vocoder.get("sampling_rate", 44100)
        self.hop_length = config.model.vocoder.get("hop_length", 512)
        self.mel_channels = config.model.vocoder.get("mel_channels", 128)

        self._sample_cache = {}

    @classmethod
    def from_package(cls, package_dir):
        """Load a deployable artifact written by
        ``tools/diffusion/export_package.py`` (the MoeSS-folder-equivalent
        packaging story): resolved config + checkpoint + speaker mapping in
        one directory."""
        import json

        package_dir = Path(package_dir)
        manifest = json.loads((package_dir / "package.json").read_text())
        assert manifest.get("format_version") == 1, manifest

        from ..config.config import _to_config_dict

        cfg = Config(_to_config_dict(json.loads((package_dir / "config.json").read_text())))
        mapping_file = package_dir / "speaker_mapping.json"
        if mapping_file.exists():
            mapping = json.loads(mapping_file.read_text())
            if mapping:
                cfg["speaker_mapping"] = mapping
        return cls(cfg, checkpoint=str(package_dir / "checkpoint.pkl"))

    # -- checkpoint loading -------------------------------------------------

    def load_checkpoint(self, path):
        """Accepts an orbax checkpoint dir (picks the latest step), a single
        step dir, or a pickle of params (reference natsort behavior,
        inference.py:68-74)."""
        import pickle

        path = Path(path)
        if path.is_file():
            with open(path, "rb") as f:
                state = pickle.load(f)
            self.params = state.get("ema_params") or state["params"] if isinstance(
                state, dict
            ) else state
            return

        import orbax.checkpoint as ocp

        # directory: find latest step via the checkpoint manager
        mngr = ocp.CheckpointManager(path.absolute())
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        restored = mngr.restore(step)
        params = restored.get("ema_params") or restored.get("params")
        if params is None:
            raise ValueError(f"checkpoint at step {step} has no params")
        self.params = params
        mngr.close()
        print(f"[inference] loaded checkpoint step {step}")

    def set_params(self, params):
        self.params = params

    def set_vocoder(self, vocoder):
        self.vocoder = vocoder

    # -- speaker parsing (reference inference.py:164-220) -------------------

    def parse_speaker(self, speaker):
        mapping = self.config.get("speaker_mapping", {}) or {}

        if isinstance(speaker, (int, np.integer)):
            return jnp.asarray([int(speaker)], jnp.int32)

        speaker = str(speaker)
        if speaker.isdigit():
            return jnp.asarray([int(speaker)], jnp.int32)

        if ":" not in speaker:
            if speaker not in mapping:
                raise ValueError(f"unknown speaker {speaker!r}")
            return jnp.asarray([int(mapping[speaker])], jnp.int32)

        # "a:0.6,b:0.4" -> weighted average of embedding rows
        assert self.params is not None, "speaker mix needs loaded params"
        table = self._speaker_table()
        mixed = np.zeros(table.shape[1], np.float32)
        total = 0.0
        for part in speaker.split(","):
            name, weight = part.split(":")
            weight = float(weight)
            idx = int(mapping[name]) if name in mapping else int(name)
            mixed += weight * np.asarray(table[idx])
            total += weight
        mixed /= max(total, 1e-8)
        return jnp.asarray(mixed)[None, None, :]  # [1, 1, H] float embedding

    def _speaker_table(self):
        p = self.params
        for key in ("speaker_encoder_mod", "speaker_encoder"):
            if key in p:
                return p[key]["embedding"]["embedding"]
        raise KeyError("no speaker embedding table in params")

    # -- per-segment forward ------------------------------------------------

    def _sample_fn(self, n_frames: int, sampler_interval, skip_steps, predictor,
                   shallow: bool, has_energy: bool, has_pitch_shift: bool):
        key = (n_frames, sampler_interval, skip_steps, predictor, shallow,
               has_energy, has_pitch_shift)
        if key not in self._sample_cache:
            def fn(params, speakers, contents, contents_lens, pitches,
                   original_mel, energy, pitch_shift, rng):
                return self.model.apply(
                    {"params": params},
                    speakers=speakers,
                    contents=contents,
                    contents_lens=contents_lens,
                    mel_lens=contents_lens,
                    pitches=pitches,
                    energy=energy,
                    pitch_shift=pitch_shift,
                    sampler_interval=sampler_interval,
                    skip_steps=skip_steps,
                    original_mel=original_mel if shallow else None,
                    noise_predictor=predictor,
                    method=self.model.sample,
                    rngs={"diffusion": rng},
                )

            self._sample_cache[key] = jax.jit(fn)
        return self._sample_cache[key]

    def forward(
        self,
        audio: np.ndarray,
        speakers,
        pitch_adjust: float = 0.0,
        sampler_interval: Optional[int] = None,
        skip_steps: int = 0,
        noise_predictor: Optional[str] = None,
        seed: int = 0,
        pitches: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """One audio segment -> converted audio (reference inference.py:81-162).

        ``pitches``: optional externally-supplied frame f0 curve; bypasses the
        pitch extractor (reference inference.py:107-111) — the curve is
        repeat_expand-ed to the mel length and NaNs are zeroed.
        """
        mel_len = len(audio) // self.hop_length
        bucket = _bucket_for(mel_len)

        # extract on bucket-padded audio so extractor jits compile once per
        # bucket (static-shape discipline), then crop to true frames
        audio_padded = np.pad(
            np.asarray(audio, np.float32),
            (0, bucket * self.hop_length - len(audio)),
        )

        if pitches is not None:
            pitches = np.nan_to_num(np.asarray(pitches, np.float32))
            pitches = np.asarray(repeat_expand(jnp.asarray(pitches), mel_len))
        else:
            f0_raw = np.asarray(
                self.pitch_extractor(audio_padded, self.sampling_rate, pad_to=None)
            )
            n_true = int(np.ceil(len(audio) / self.pitch_extractor.hop_length))
            pitches = np.asarray(
                self.pitch_extractor.post_process(
                    audio, self.sampling_rate, f0_raw[:n_true], mel_len
                )
            )
        pitches = pitches * 2 ** (pitch_adjust / 12)
        if (pitches == 0).all():
            return np.zeros_like(audio)  # no voice, skip (inference.py:112)

        contents = self.text_features_extractor(audio_padded, self.sampling_rate)
        t_feat = contents.shape[-1]
        t_true = max(
            int(round(t_feat * len(audio) / len(audio_padded))), 1
        )
        contents = np.asarray(
            repeat_expand(jnp.asarray(contents[0, :, :t_true]), mel_len)
        ).T

        # pad to bucket
        pad = bucket - mel_len
        contents_p = np.pad(contents, ((0, pad), (0, 0)))
        pitches_p = np.pad(pitches, (0, pad))

        # optional conditions (reference inference.py:122-131): energy from
        # the configured extractor; pitch shift pinned to 0 at inference
        # "to avoid distortion"
        energy = None
        if self.energy_extractor is not None and self.config.model.get(
            "energy_encoder"
        ):
            e = np.asarray(
                self.energy_extractor(audio, self.sampling_rate, pad_to=mel_len)
            )
            energy = jnp.asarray(np.pad(e, (0, pad)))[None, :, None]
        pitch_shift = (
            jnp.zeros((1, 1))
            if self.config.model.get("pitch_shift_encoder")
            else None
        )

        shallow = skip_steps > 0
        original_mel = None
        if shallow:
            mel = np.asarray(
                self.vocoder.wav2spec(jnp.asarray(audio)[None])
            )[0]
            original_mel = np.pad(mel, ((0, pad), (0, 0)))[None]

        fn = self._sample_fn(
            bucket,
            sampler_interval,
            skip_steps,
            noise_predictor,
            shallow,
            energy is not None,
            pitch_shift is not None,
        )
        mel_out = fn(
            self.params,
            speakers,
            jnp.asarray(contents_p)[None],
            jnp.asarray([mel_len], jnp.int32),
            jnp.asarray(pitches_p)[None],
            jnp.asarray(original_mel) if original_mel is not None else None,
            energy,
            pitch_shift,
            jax.random.PRNGKey(seed),
        )

        mel_out = mel_out[:, :mel_len]
        wav = self.vocoder.spec2wav(
            mel_out, jnp.asarray(pitches[:mel_len])[None]
        )
        return np.asarray(wav[0])[: len(audio)]

    # -- end-to-end ---------------------------------------------------------

    def inference(
        self,
        input_path,
        output_path,
        speaker=0,
        pitch_adjust: float = 0.0,
        sampler_interval: Optional[int] = None,
        skip_steps: int = 0,
        noise_predictor: Optional[str] = None,
        silence_threshold: int = 60,
        max_slice_duration: float = 30.0,
        min_silence_duration: float = 0,
        pitches_path: Optional[str] = None,
        extract_vocals: bool = False,
        seed: int = 0,
    ):
        """Full pipeline (reference inference.py:222-389).

        NOTE: ``extract_vocals`` defaults to False here, while the reference
        CLI defaults to True — demucs is not bundled with this image, so
        vocal separation is opt-in; pass ``--extract-vocals`` explicitly when
        converting mixed tracks (the demucs-missing error will surface).
        """
        assert self.params is not None, "load a checkpoint first"
        assert self.vocoder is not None, "vocoder unavailable"

        audio, sr = load_wav(input_path)
        if sr != self.sampling_rate:
            from ..extractors.feature import resample_linear

            audio = resample_linear(audio, sr, self.sampling_rate)

        if extract_vocals:
            from ..utils.audio import separate_vocals

            print("[inference] extracting vocals...")
            audio, _ = separate_vocals(audio, self.sampling_rate)

        # loudness norm (reference uses pyloudnorm)
        rms = np.sqrt(np.mean(audio**2) + 1e-12)
        audio = np.clip(audio * (10 ** (-23 / 20) / (rms + 1e-12)), -1, 1)

        # pitch-curve restore (reference inference.py:319-333): a .json list
        # or .npy array of frame f0s covering the whole input
        full_pitches = None
        if pitches_path is not None:
            if Path(pitches_path).suffix == ".json":
                import json

                with open(pitches_path) as f:
                    full_pitches = np.asarray(json.load(f), np.float32)
            else:
                full_pitches = np.load(pitches_path).astype(np.float32)

        speakers = self.parse_speaker(speaker)

        generated = np.zeros_like(audio)
        segments = list(
            slice_audio(
                audio,
                self.sampling_rate,
                max_duration=max_slice_duration,
                top_db=silence_threshold,
                min_silence_duration=min_silence_duration,
            )
        )
        print(f"[inference] {len(segments)} segments")

        for i, (start, end) in enumerate(segments):
            segment = audio[start:end]
            seg_pitches = None
            if full_pitches is not None:
                seg_pitches = full_pitches[
                    start // self.hop_length : end // self.hop_length
                ]
            out = self.forward(
                segment,
                speakers,
                pitch_adjust=pitch_adjust,
                sampler_interval=sampler_interval,
                skip_steps=skip_steps,
                noise_predictor=noise_predictor,
                seed=seed + i,
                pitches=seg_pitches,
            )
            generated[start : start + len(out)] = out[: end - start]

        save_wav(output_path, generated, self.sampling_rate)
        return generated

    def batch_inference(self, input_dir, output_dir, **kwargs):
        """Directory mode (reference inference.py:259-291)."""
        input_dir, output_dir = Path(input_dir), Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        for wav in sorted(input_dir.rglob("*.wav")):
            rel = wav.relative_to(input_dir)
            out = output_dir / rel
            out.parent.mkdir(parents=True, exist_ok=True)
            print(f"[inference] {wav} -> {out}")
            self.inference(wav, out, **kwargs)
