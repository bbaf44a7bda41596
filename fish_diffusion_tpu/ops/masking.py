"""Length-mask utilities (parity with reference
``archs/diffsinger/diffsinger.py:41-55``). On TPU we always pass a static
``max_len`` (bucketed padding) so shapes stay fixed under jit.

Mask convention follows the reference: ``True`` marks PADDING positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_mask_from_lengths(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] lengths -> [B, max_len] bool mask, True where index >= length."""
    ids = jnp.arange(max_len)[None, :]
    return ids >= lengths[:, None]
