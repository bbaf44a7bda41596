"""GradTTS: minimal TTS arch — token contents pass straight through as the
diffusion condition.

Capability parity with the reference
``fish_diffusion/archs/diffsinger/grad_tts.py:12-124``: no encoders; mel-len
jitter of +-10% at eval (:57-59); loss only in training; used with the
LlamaDenoiser (token condition prefix handled inside the denoiser).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import get_mask_from_lengths
from ..registry import ARCHS, DIFFUSIONS


@ARCHS.register_module()
class GradTTS(nn.Module):
    diffusion: dict
    gradient_checkpointing: bool = False

    def setup(self):
        diff_cfg = dict(self.diffusion)
        if self.gradient_checkpointing:
            denoiser = dict(diff_cfg.get("denoiser", {}))
            denoiser["gradient_checkpointing"] = True
            diff_cfg["denoiser"] = denoiser
        self.diffusion_mod = DIFFUSIONS.build(diff_cfg)

    def forward_features(
        self,
        speakers,
        contents,
        contents_lens=None,
        mel_lens=None,
        mel_max_len: Optional[int] = None,
        deterministic: bool = True,
        **_unused,
    ):
        src_masks = (
            get_mask_from_lengths(contents_lens, contents.shape[1])
            if contents_lens is not None
            else None
        )

        if not deterministic and mel_lens is not None:
            # eval-time +-10% mel length jitter (reference grad_tts.py:57-59)
            jitter = 0.9 + 0.2 * jax.random.uniform(
                self.make_rng("diffusion"), mel_lens.shape
            )
            mel_lens = (mel_lens.astype(jnp.float32) * jitter).astype(jnp.int32)

        mel_masks = (
            get_mask_from_lengths(mel_lens, mel_max_len)
            if mel_lens is not None and mel_max_len is not None
            else None
        )

        return dict(
            features=contents,
            cond_masks=src_masks,
            x_masks=mel_masks,
            x_lens=mel_lens,
        )

    def __call__(
        self,
        speakers,
        contents,
        contents_lens=None,
        mel=None,
        mel_lens=None,
        mel_max_len=None,
        **_unused,
    ):
        if mel_max_len is None and mel is not None:
            mel_max_len = mel.shape[1]

        features = self.forward_features(
            speakers=speakers,
            contents=contents,
            contents_lens=contents_lens,
            mel_lens=mel_lens,
            mel_max_len=mel_max_len,
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
        sampler_interval=None,
        skip_steps: int = 0,
        noise_predictor=None,
        **_unused,
    ):
        features = self.forward_features(
            speakers=speakers,
            contents=contents,
            contents_lens=contents_lens,
            mel_lens=mel_lens,
            mel_max_len=mel_max_len,
        )
        # the diffusion shapes x from features' time axis; for token
        # conditions the caller provides mel_max_len via x_masks
        return self.diffusion_mod(
            features["features"],
            sampler_interval=sampler_interval,
            skip_steps=skip_steps,
            noise_predictor=noise_predictor,
            x_masks=features["x_masks"],
            cond_masks=features["cond_masks"],
        )
