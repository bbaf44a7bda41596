"""HiFiSinger: GAN-based SVC generator (condition encoders + waveform GAN).

Capability parity with the reference ``fish_diffusion/archs/hifisinger/core.py``:
text/speaker/pitch-shift/energy encoders summed, ``feature_fuser``
(2x Linear+SiLU), then either the NSF-HiFiGAN ``Generator`` or
``RefineGANGenerator`` as the waveform decoder (encoder_type switch :31-37).

The adversarial training losses live in ``training/gan.py``
(HiFiSingerV1/V2 Lightning equivalents as pure jitted steps).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import get_mask_from_lengths
from ..registry import ARCHS, ENCODERS
from .vocoders.nsf_hifigan import NsfHifiGANGenerator
from .vocoders.refinegan import RefineGANGenerator

Dtype = Any


@ARCHS.register_module(name="HiFiSVC")
@ARCHS.register_module()
class HiFiSinger(nn.Module):
    """Config surface mirrors reference ``configs/_base_/archs/hifi_svc*.py``."""

    text_encoder: dict
    speaker_encoder: dict
    encoder: dict  # the waveform generator config (type: RefineGAN | HiFiGAN dict)
    hidden_size: int = 256
    pitch_shift_encoder: Optional[dict] = None
    energy_encoder: Optional[dict] = None
    # accepted for config parity; discriminators are built by the GAN trainer
    pitch_encoder: Optional[dict] = None
    mpd: Optional[dict] = None
    mrd: Optional[dict] = None
    msd: Optional[dict] = None
    multi_scale_mels: Optional[tuple] = None

    def setup(self):
        self.text_encoder_mod = ENCODERS.build(dict(self.text_encoder))
        self.speaker_encoder_mod = ENCODERS.build(dict(self.speaker_encoder))

        if self.pitch_shift_encoder:
            self.pitch_shift_encoder_mod = ENCODERS.build(
                dict(self.pitch_shift_encoder)
            )
        if self.energy_encoder:
            self.energy_encoder_mod = ENCODERS.build(dict(self.energy_encoder))

        self.fuser_dense1 = nn.Dense(self.hidden_size, name="fuser_dense1")
        self.fuser_dense2 = nn.Dense(self.hidden_size, name="fuser_dense2")

        enc_cfg = dict(self.encoder)
        enc_type = enc_cfg.pop("type", "HiFiGAN")
        if enc_type == "RefineGAN":
            self.encoder_type = "RefineGAN"
            self.generator = RefineGANGenerator(**enc_cfg)
        else:
            self.encoder_type = "HiFiGAN"
            self.generator = NsfHifiGANGenerator(**enc_cfg)

    def forward_features(
        self,
        speakers,
        contents,
        contents_lens=None,
        pitch_shift=None,
        phones2mel=None,
        energy=None,
    ):
        """reference core.py:55-113: summed embeddings -> SiLU fuser."""
        src_masks = (
            get_mask_from_lengths(contents_lens, contents.shape[1])
            if contents_lens is not None
            else None
        )

        features = self.text_encoder_mod(contents, src_masks)

        if phones2mel is not None:
            features = jnp.take_along_axis(
                features, phones2mel[:, :, None].astype(jnp.int32), axis=1
            )
            if src_masks is not None:
                features = features * (
                    1.0 - src_masks[:, :, None].astype(features.dtype)
                )

        if speakers.ndim in (2, 3) and jnp.issubdtype(speakers.dtype, jnp.floating):
            speaker_embed = speakers
        else:
            speaker_embed = self.speaker_encoder_mod(speakers)
        if speaker_embed.ndim == 2:
            speaker_embed = speaker_embed[:, None, :]
        features = features + speaker_embed

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

        features = nn.silu(self.fuser_dense1(features))
        features = nn.silu(self.fuser_dense2(features))

        if src_masks is not None:
            features = features * (1.0 - src_masks[:, :, None].astype(features.dtype))

        return dict(features=features, src_masks=src_masks)

    def __call__(
        self,
        speakers,
        contents,
        contents_lens=None,
        pitches=None,
        pitch_shift=None,
        phones2mel=None,
        energy=None,
    ):
        """-> waveform [B, T * hop] (reference core.py:115-141)."""
        out = self.forward_features(
            speakers=speakers,
            contents=contents,
            contents_lens=contents_lens,
            pitch_shift=pitch_shift,
            phones2mel=phones2mel,
            energy=energy,
        )

        if pitches is not None and pitches.ndim == 3:
            pitches = pitches[:, :, 0]

        return self.generator(out["features"], pitches)
