"""Synthetic genome + read simulator (test/bench data; no network in env).

BASELINE.json names real datasets only by *scale* (E. coli 4.6 Mbp, chr20
~64 Mbp, chr1 ~230 Mbp); synthetic sequences of those sizes exercise the same
code paths.  Reads carry their true locus in the name for accuracy checks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import dna
from .fasta import Read

E_COLI_LEN = 4_641_652
CHR20_LEN = 64_444_167
CHR1_LEN = 230_481_012


def random_genome(n: int, seed: int = 0, gc: float = 0.5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    p_at = (1.0 - gc) / 2
    p_gc = gc / 2
    return rng.choice(4, size=n, p=[p_at, p_gc, p_gc, p_at]).astype(np.uint8)


@dataclass
class SimRead:
    read: Read
    true_pos: int
    true_strand: int  # 0 fwd, 1 rev
    n_sub: int
    n_ins: int
    n_del: int


def simulate_reads(
    genome: np.ndarray,
    n_reads: int,
    read_len: int,
    seed: int = 1,
    sub_rate: float = 0.0,
    max_subs: int | None = None,
    indel_rate: float = 0.0,
    max_indels: int = 0,
) -> list[SimRead]:
    """Sample reads uniformly from both strands with planted errors.

    ``max_subs``/``max_indels`` cap the per-read error count so acceptance
    configs ("1-mismatch", "edit distance <= 4") can be generated exactly.
    """
    rng = np.random.default_rng(seed)
    n = genome.size
    out: list[SimRead] = []
    for ridx in range(n_reads):
        # leave indel slack at the template edge
        pos = int(rng.integers(0, n - read_len - max_indels - 1))
        strand = int(rng.integers(0, 2))
        n_sub = _count(rng, read_len, sub_rate, max_subs)
        n_indel = _count(rng, read_len, indel_rate, max_indels)
        tmpl = genome[pos : pos + read_len + max_indels].copy()

        n_ins = n_del = 0
        seq = tmpl[:read_len].copy()
        if n_indel:
            seq = tmpl.copy()
            for _ in range(n_indel):
                at = int(rng.integers(1, read_len - 1))
                if rng.integers(0, 2):  # deletion from the template
                    seq = np.delete(seq, at)
                    n_del += 1
                else:  # insertion of a random base into the read
                    seq = np.insert(seq, at, rng.integers(0, 4))
                    n_ins += 1
            seq = seq[:read_len]
        for _ in range(n_sub):
            at = int(rng.integers(0, read_len))
            seq[at] = (seq[at] + 1 + rng.integers(0, 3)) % 4
        if strand:
            seq = dna.revcomp(seq)
        name = f"r{ridx}_p{pos}_s{strand}_m{n_sub}_i{n_ins}_d{n_del}"
        out.append(
            SimRead(
                Read(name, seq.astype(np.uint8), None),
                pos,
                strand,
                n_sub,
                n_ins,
                n_del,
            )
        )
    return out


def _count(rng, read_len: int, rate: float, cap: int | None) -> int:
    if rate <= 0:
        return 0
    c = int(rng.binomial(read_len, rate))
    return min(c, cap) if cap is not None else c


def reads_to_batch(reads: list[Read], pad_to: int | None = None) -> np.ndarray:
    """Stack equal-length reads into a (B, L) uint8 batch (N -> code 0)."""
    L = max(len(r) for r in reads)
    if pad_to is not None:
        L = max(L, pad_to)
    out = np.zeros((len(reads), L), dtype=np.uint8)
    for i, r in enumerate(reads):
        c = np.where(r.codes >= 4, 0, r.codes)
        out[i, : len(r)] = c
    return out


@dataclass
class SimPair:
    r1: SimRead
    r2: SimRead
    fragment_start: int
    fragment_len: int


def simulate_pairs(
    genome: np.ndarray,
    n_pairs: int,
    read_len: int,
    seed: int = 1,
    insert_mean: int = 350,
    insert_sd: int = 30,
    sub_rate: float = 0.0,
    max_subs: int | None = None,
) -> list[SimPair]:
    """FR-oriented pairs: R1 = fragment start (fwd), R2 = fragment end (rc)."""
    rng = np.random.default_rng(seed)
    n = genome.size
    out: list[SimPair] = []
    for pidx in range(n_pairs):
        frag = int(np.clip(rng.normal(insert_mean, insert_sd), 2 * read_len, None))
        pos = int(rng.integers(0, n - frag - 1))
        segs = []
        for mate, (p, strand) in enumerate(
            [(pos, 0), (pos + frag - read_len, 1)]
        ):
            seq = genome[p : p + read_len].copy()
            n_sub = _count(rng, read_len, sub_rate, max_subs)
            for _ in range(n_sub):
                at = int(rng.integers(0, read_len))
                seq[at] = (seq[at] + 1 + rng.integers(0, 3)) % 4
            if strand:
                seq = dna.revcomp(seq)
            name = f"p{pidx}"
            segs.append(
                SimRead(Read(name, seq.astype(np.uint8), None), p, strand, n_sub, 0, 0)
            )
        out.append(SimPair(segs[0], segs[1], pos, frag))
    return out
