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


@partial(jax.jit, static_argnames=("max_len", "kmer_j"))
def exact_interval_search(
    fm: DeviceFMIndex,
    reads: jax.Array,  # (B, L) int32 codes, left-aligned, pad arbitrary
    lengths: jax.Array,  # (B,) int32
    max_len: int | None = None,
    kmer_tab: tuple[jax.Array, jax.Array] | None = None,  # (lo, hi) of size 4^j
    kmer_j: int = 0,
):
    """SA intervals [lo, hi) of each read's exact occurrences; hi<=lo => none.

    With a k-mer prefix table (``index.kmer``), the last ``kmer_j`` characters
    of every read resolve with one table lookup instead of 2*kmer_j occ
    gathers; the backward loop then covers only the remaining prefix.
    """
    B, L = reads.shape
    steps = L if max_len is None else max_len

    if kmer_tab is not None and kmer_j > 0:
        use_tab = lengths >= kmer_j
        idx = jnp.zeros(B, jnp.int32)
        for t in range(kmer_j):
            pos = jnp.clip(lengths - kmer_j + t, 0)
            c = jnp.take_along_axis(reads, pos[:, None], axis=1)[:, 0]
            idx = (idx << 2) | c
        lo0 = jnp.where(use_tab, kmer_tab[0][idx], 0)
        hi0 = jnp.where(use_tab, kmer_tab[1][idx], fm.n + 1)
        skip = jnp.where(use_tab, kmer_j, 0)
        # reads shorter than kmer_j still need up to kmer_j - 1 steps
        trip = steps - kmer_j if steps >= 2 * kmer_j - 1 else steps
    else:
        lo0 = jnp.zeros(B, jnp.int32)
        hi0 = jnp.full(B, fm.n + 1, jnp.int32)
        skip = jnp.zeros(B, jnp.int32)
        trip = steps

    def body(t, state):
        lo, hi = state
        j = lengths - 1 - skip - t
        active = (j >= 0) & (lo < hi)
        c = jnp.take_along_axis(reads, jnp.clip(j, 0)[:, None], axis=1)[:, 0]
        nlo, nhi = rank.backward_step(fm, c, lo, hi)
        return jnp.where(active, nlo, lo), jnp.where(active, nhi, hi)

    return jax.lax.fori_loop(0, trip, body, (lo0, hi0))


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
