"""Shared test-input generators for the DP-verify engine suites."""

import numpy as np


def mixed_stream(rng, S, L, W, k):
    """Planted sub/indel reads + junk rows + ragged lengths + N codes.

    Every 5th row is pure junk (codes 0-4 incl. N); the rest are genome
    windows with up to k random substitutions/insertions/deletions planted,
    so both engines' match, mismatch, gap, boundary, and dead-lane paths are
    exercised.  Returns (reads (S, L) int32, lengths (S,), windows (S, W))."""
    reads = rng.integers(0, 5, size=(S, L)).astype(np.int32)
    wins = rng.integers(0, 5, size=(S, W)).astype(np.int32)
    for t in range(S):
        if t % 5 == 0:
            continue
        r = rng.integers(0, 4, size=L)
        reads[t] = r
        seg = r.copy().tolist()
        for _ in range(rng.integers(0, k + 1)):
            kind = rng.integers(0, 3)
            at = int(rng.integers(5, len(seg) - 5))
            if kind == 0:
                seg[at] = (seg[at] + 1) % 4
            elif kind == 1:
                seg.insert(at, int(rng.integers(0, 4)))
            else:
                del seg[at]
        seg = (seg + [int(x) for x in rng.integers(0, 4, size=W)])[: W - k]
        wins[t, k : k + len(seg)] = seg
    lens = np.full(S, L, np.int64)
    lens[::7] = L - rng.integers(1, min(L - 1, 40))
    return reads, lens, wins
