"""Batched exact-match FM backward search (SURVEY.md §3.2; acceptance config 1).

The reference's per-read loop (`FMIndex.backwardSearch`) becomes a read-cohort
state machine: a (B,) pair of interval tensors advanced L steps in lockstep
under ``lax.fori_loop``; dead lanes (empty interval) and exhausted lanes
(past the read's first char) are frozen by masking, not branching.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rank
from ..ops.rank import DeviceFMIndex


@partial(jax.jit, static_argnames=("max_len",))
def exact_interval_search(
    fm: DeviceFMIndex,
    reads: jax.Array,  # (B, L) int32 codes, left-aligned, pad arbitrary
    lengths: jax.Array,  # (B,) int32
    max_len: int | None = None,
):
    """SA intervals [lo, hi) of each read's exact occurrences; hi<=lo => none."""
    B, L = reads.shape
    steps = L if max_len is None else max_len

    def body(t, state):
        lo, hi = state
        j = lengths - 1 - t
        active = (j >= 0) & (lo < hi)
        c = jnp.take_along_axis(reads, jnp.clip(j, 0)[:, None], axis=1)[:, 0]
        nlo, nhi = rank.backward_step(fm, c, lo, hi)
        return jnp.where(active, nlo, lo), jnp.where(active, nhi, hi)

    lo0 = jnp.zeros(B, jnp.int32)
    hi0 = jnp.full(B, fm.n + 1, jnp.int32)
    return jax.lax.fori_loop(0, steps, body, (lo0, hi0))


@partial(jax.jit, static_argnames=("max_hits",))
def locate_hits(fm: DeviceFMIndex, lo: jax.Array, hi: jax.Array, max_hits: int):
    """Text positions for up to ``max_hits`` rows of each interval.

    Returns (positions (B, max_hits) int32, valid (B, max_hits) bool).
    """
    rows = lo[:, None] + jnp.arange(max_hits, dtype=jnp.int32)[None, :]
    valid = rows < hi[:, None]
    safe = jnp.clip(rows, 0, fm.n)
    pos = rank.locate(fm, safe.reshape(-1)).reshape(rows.shape)
    return jnp.where(valid, pos, -1), valid


def revcomp_batch(reads: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Host-side reverse complement of a left-aligned padded batch."""
    B, L = reads.shape
    out = np.zeros_like(reads)
    for i in range(B):
        l = int(lengths[i])
        out[i, :l] = (3 - reads[i, :l][::-1]) % 4
    return out
