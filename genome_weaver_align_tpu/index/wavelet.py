"""Wavelet-matrix rank over the BWT (SURVEY.md §2 #6 — the reference's
`WaveletArray` alternative to the sampled occurrence table).

For the 4-letter DNA alphabet the wavelet matrix is two bit-vector levels:
level 0 stores each symbol's high bit; level 1 stores the low bit after a
stable partition by the high bit.  ``rank(c, i)`` is two bit-vector rank
queries per level.

This is the *space-lean* backend (2n bits + rank samples ~ 0.31 n bytes vs.
0.375 n for the fused occ layout) but costs 4 dependent lookups per query
instead of one fused row gather, so the HBM-fused layout (`ops.rank`)
remains the TPU default; the wavelet backend exists for rank-structure
parity and as the better choice for larger alphabets.
"""

from __future__ import annotations

import numpy as np

from ..utils.bitvector import BitVector


class WaveletRank:
    """occ(c, i) over a 2-bit symbol sequence via a 2-level wavelet matrix."""

    def __init__(self, codes: np.ndarray):
        codes = np.asarray(codes, dtype=np.uint8)
        self.n = codes.size
        hi = (codes >> 1) & 1
        self.l0 = BitVector(hi.astype(bool))
        self.z0 = int((hi == 0).sum())  # symbols with high bit 0
        # stable partition by high bit, then low bits
        order = np.argsort(hi, kind="stable")
        lo_bits = (codes[order] & 1).astype(bool)
        self.l1 = BitVector(lo_bits)
        # zeros (low bit 0) inside each partition, for per-partition rank
        self.z1_left = int((~lo_bits[: self.z0]).sum())

    def rank(self, c: int, i) -> np.ndarray:
        """#occurrences of code c in codes[0, i); vectorised over i."""
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        b0 = (c >> 1) & 1
        b1 = c & 1
        # step into level 1: position inside the b0 partition
        r1 = self.l0.rank1(i)
        i1 = (i - r1) if b0 == 0 else r1
        base = 0 if b0 == 0 else self.z0
        lo_rank = self.l1.rank1(base + i1) - self.l1.rank1(np.full_like(i1, base))
        if b1 == 1:
            return lo_rank
        return i1 - lo_rank

    def device_arrays(self):
        """Bit-vector words + checkpoints, ready for a device twin."""
        return {
            "l0_words": self.l0._wpad,
            "l0_cp": self.l0.checkpoints,
            "l1_words": self.l1._wpad,
            "l1_cp": self.l1.checkpoints,
            "z0": self.z0,
        }
