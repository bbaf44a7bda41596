"""DiffSinger architecture: condition assembly + diffusion.

Capability parity with the reference
``fish_diffusion/archs/diffsinger/diffsinger.py:20-179`` (DiffSinger nn.Module):
text encoder + optional speaker / pitch / pitch-shift / energy encoders summed
into a ``features`` tensor, ``phones2mel`` gather for phoneme→frame alignment
(SVS), speaker given as an id OR a precomputed float embedding (speaker-mix).

The Lightning wrapper's responsibilities (EMA, optimizers, validation logging,
``diffsinger.py:182-406``) live in ``training/`` as pure functions instead.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import get_mask_from_lengths
from ..registry import ARCHS, DIFFUSIONS, ENCODERS

Dtype = Any


@ARCHS.register_module(name="DiffSVC")
@ARCHS.register_module()
class DiffSinger(nn.Module):
    """Config surface mirrors reference ``model`` configs
    (``configs/_base_/archs/diff_svc_v2.py:17-63``)."""

    text_encoder: dict
    diffusion: dict
    speaker_encoder: Optional[dict] = None
    pitch_encoder: Optional[dict] = None
    pitch_shift_encoder: Optional[dict] = None
    energy_encoder: Optional[dict] = None

    def setup(self):
        self.text_encoder_mod = ENCODERS.build(dict(self.text_encoder))
        self.diffusion_mod = DIFFUSIONS.build(dict(self.diffusion))

        if self.speaker_encoder:
            self.speaker_encoder_mod = ENCODERS.build(dict(self.speaker_encoder))
        if self.pitch_encoder:
            self.pitch_encoder_mod = ENCODERS.build(dict(self.pitch_encoder))
        if self.pitch_shift_encoder:
            self.pitch_shift_encoder_mod = ENCODERS.build(
                dict(self.pitch_shift_encoder)
            )
        if self.energy_encoder:
            self.energy_encoder_mod = ENCODERS.build(dict(self.energy_encoder))

    def forward_features(
        self,
        speakers: Optional[jax.Array],
        contents: jax.Array,
        contents_lens: Optional[jax.Array],
        mel_lens: Optional[jax.Array] = None,
        mel_max_len: Optional[int] = None,
        pitches: Optional[jax.Array] = None,
        pitch_shift: Optional[jax.Array] = None,
        phones2mel: Optional[jax.Array] = None,
        energy: Optional[jax.Array] = None,
    ):
        """Assemble the summed condition tensor
        (reference diffsinger.py:57-134). contents: [B, T, C] or [B, T] ids."""
        src_masks = (
            get_mask_from_lengths(contents_lens, contents.shape[1])
            if contents_lens is not None
            else None
        )
        mel_masks = (
            get_mask_from_lengths(mel_lens, mel_max_len or contents.shape[1])
            if mel_lens is not None
            else None
        )

        features = self.text_encoder_mod(contents, src_masks)

        if phones2mel is not None:
            # phoneme -> frame gather (SVS alignment)
            features = jnp.take_along_axis(
                features, phones2mel[:, :, None].astype(jnp.int32), axis=1
            )
            if mel_masks is not None:
                features = features * (1.0 - mel_masks[:, :, None].astype(features.dtype))

        speaker_embed = None
        if speakers is not None and speakers.ndim in (2, 3) and jnp.issubdtype(
            speakers.dtype, jnp.floating
        ):
            speaker_embed = speakers  # precomputed embedding (speaker-mix)
        elif speakers is not None and self.speaker_encoder:
            speaker_embed = self.speaker_encoder_mod(speakers)

        if speaker_embed is not None and speaker_embed.ndim == 2:
            speaker_embed = speaker_embed[:, None, :]
        if speaker_embed is not None:
            features = features + speaker_embed

        if self.pitch_encoder:
            features = features + self.pitch_encoder_mod(pitches)

        if pitch_shift is not None and self.pitch_shift_encoder:
            embed = self.pitch_shift_encoder_mod(pitch_shift)
            if embed.ndim == 2:
                embed = embed[:, None, :]
            features = features + embed

        if energy is not None and self.energy_encoder:
            embed = self.energy_encoder_mod(energy)
            if embed.ndim == 2:
                embed = embed[:, None, :]
            features = features + embed

        return dict(
            features=features,
            x_masks=mel_masks,
            x_lens=mel_lens,
            cond_masks=mel_masks,
        )

    def __call__(
        self,
        speakers,
        contents,
        contents_lens=None,
        mel=None,
        mel_lens=None,
        mel_max_len=None,
        pitches=None,
        pitch_shift=None,
        phones2mel=None,
        energy=None,
    ):
        """Training forward: features + diffusion train_step
        (reference diffsinger.py:136-179)."""
        features = self.forward_features(
            speakers=speakers,
            contents=contents,
            contents_lens=contents_lens,
            mel_lens=mel_lens,
            mel_max_len=mel_max_len,
            pitches=pitches,
            pitch_shift=pitch_shift,
            phones2mel=phones2mel,
            energy=energy,
        )

        output = self.diffusion_mod.train_step(
            features["features"],
            mel,
            x_masks=features["x_masks"],
            cond_masks=features["cond_masks"],
        )

        output["features"] = features["features"]
        output["x_masks"] = features["x_masks"]
        output["x_lens"] = features["x_lens"]
        output["cond_masks"] = features["cond_masks"]
        return output

    def sample(
        self,
        speakers,
        contents,
        contents_lens=None,
        mel_lens=None,
        mel_max_len=None,
        pitches=None,
        pitch_shift=None,
        phones2mel=None,
        energy=None,
        sampler_interval: Optional[int] = None,
        skip_steps: int = 0,
        original_mel=None,
        noise_predictor: Optional[str] = None,
    ):
        """Inference: features + full reverse diffusion -> mel [B, T, M]."""
        features = self.forward_features(
            speakers=speakers,
            contents=contents,
            contents_lens=contents_lens,
            mel_lens=mel_lens,
            mel_max_len=mel_max_len,
            pitches=pitches,
            pitch_shift=pitch_shift,
            phones2mel=phones2mel,
            energy=energy,
        )
        return self.diffusion_mod(
            features["features"],
            sampler_interval=sampler_interval,
            skip_steps=skip_steps,
            original_mel=original_mel,
            noise_predictor=noise_predictor,
            x_masks=features["x_masks"],
            cond_masks=features["cond_masks"],
        )
