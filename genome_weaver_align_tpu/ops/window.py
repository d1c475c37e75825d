"""Genome window gather: packed text in HBM -> per-candidate code windows.

Used by the DP verify stage: each candidate locus extracts W codes starting
at ``ws`` from the 2-bit packed text.  Out-of-range positions return code 4
(never matches, counts as an edit) so callers need no masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("width",))
def gather_windows(
    text_words: jax.Array,  # (nw,) uint32 packed text
    n: int | jax.Array,  # text length in bases
    starts: jax.Array,  # (Q,) int32 window starts (may be negative)
    width: int,
):
    """-> (Q, width) int8 codes, 4 where out of range.

    int8: the verify stage holds (B*C, W) windows — the narrow dtype keeps
    the HBM footprint 4x smaller than int32."""
    idx = starts[:, None] + jnp.arange(width, dtype=jnp.int32)[None, :]
    valid = (idx >= 0) & (idx < n)
    safe = jnp.clip(idx, 0, jnp.asarray(n, jnp.int32) - 1)
    w = text_words[safe >> 4]
    codes = ((w >> (2 * (safe & 15)).astype(jnp.uint32)) & jnp.uint32(3)).astype(jnp.int8)
    return jnp.where(valid, codes, jnp.int8(4))


def pack_text_for_device(text_words: np.ndarray) -> jax.Array:
    return jnp.asarray(text_words, dtype=jnp.uint32)
