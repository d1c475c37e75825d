"""Paired-end alignment (BASELINE.json config 5: "150bp paired-style read
stream").

The single-end flagship pipeline aligns both mates; pairing logic then
classifies FR-oriented pairs within the insert-size window as proper pairs
and attempts *mate rescue* for half-mapped pairs: the unmapped mate is
verified directly (Myers bit-parallel over the expected insert window next
to its mapped mate) — a pure batched device op, no FM search needed.

SAM pair semantics: flags 0x1/0x2/0x8/0x20/0x40/0x80, RNEXT '=' for
same-contig mates, PNEXT, signed TLEN (leftmost mate positive).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils import dna, sam
from ..utils.fasta import Read
from .pipeline import ApproxHit, SuffixFilterAligner, reads_to_batch_verify


@dataclass
class PairHit:
    h1: ApproxHit | None
    h2: ApproxHit | None
    proper: bool
    rescued: int  # 0 none, 1 = mate1 rescued, 2 = mate2 rescued


class PairedAligner:
    def __init__(
        self,
        aligner: SuffixFilterAligner,
        min_insert: int = 50,
        max_insert: int = 1000,
        rescue: bool = True,
    ):
        self.al = aligner
        self.min_insert = min_insert
        self.max_insert = max_insert
        self.rescue = rescue

    def _is_proper(self, h1: ApproxHit, h2: ApproxHit, l1: int, l2: int) -> bool:
        if h1.strand == h2.strand:
            return False
        fwd, fl, rev, rl = (
            (h1, l1, h2, l2) if h1.strand == 0 else (h2, l2, h1, l1)
        )
        tlen = (rev.pos + rl) - fwd.pos
        return fwd.pos <= rev.pos and self.min_insert <= tlen <= self.max_insert

    def _rescue_mate(
        self, read: Read, anchor: ApproxHit, anchor_len: int
    ) -> ApproxHit | None:
        """Verify the unmapped mate against the insert window by its anchor."""
        import jax.numpy as jnp

        from ..ops import dp as dp_ops
        from ..ops import myers, window

        l = len(read)
        if anchor.strand == 0:
            ws = anchor.pos + self.min_insert - l
            we = anchor.pos + self.max_insert
            strand = 1
        else:
            ws = anchor.pos + anchor_len - self.max_insert
            we = anchor.pos + anchor_len - self.min_insert + l
            strand = 0
        W = int(we - ws)
        if W <= l:
            return None
        codes = read.codes if strand == 0 else dna.revcomp(read.codes)
        reads = jnp.asarray(codes[None, :].astype(np.int32))
        lengths = jnp.asarray(np.array([l], np.int32))
        wins = window.gather_windows(
            self.al.text_words, self.al.fm.n, jnp.asarray(np.array([ws], np.int32)), W
        )
        nwords = (l + 31) // 32
        d = int(np.asarray(myers.myers_semiglobal(reads, lengths, wins.astype(jnp.int32), nwords))[0])
        max_k = max(self.al.k, l // 20)  # permissive threshold for rescue
        if d > max_k:
            return None
        # recover exact locus + cigar on host
        win_codes = np.asarray(wins[0]).astype(np.int64)
        d2, start, _, cigar = dp_ops.traceback_semiglobal_host(
            codes.astype(np.int64), win_codes
        )
        return ApproxHit(int(ws + start), strand, int(d2), cigar, 1, False)

    def align_pairs(self, pairs: list[tuple[Read, Read]]) -> list[PairHit]:
        r1 = [p[0] for p in pairs]
        r2 = [p[1] for p in pairs]
        h1s = self.al.align_batch(r1)
        h2s = self.al.align_batch(r2)
        out = []
        for (m1, m2), h1, h2 in zip(pairs, h1s, h2s):
            rescued = 0
            if self.rescue and h1 is not None and h2 is None:
                h2 = self._rescue_mate(m2, h1, len(m1))
                rescued = 2 if h2 is not None else 0
            elif self.rescue and h2 is not None and h1 is None:
                h1 = self._rescue_mate(m1, h2, len(m2))
                rescued = 1 if h1 is not None else 0
            proper = (
                h1 is not None
                and h2 is not None
                and self._is_proper(h1, h2, len(m1), len(m2))
            )
            out.append(PairHit(h1, h2, proper, rescued))
        return out

    def to_sam(self, pairs: list[tuple[Read, Read]], hits: list[PairHit]):
        recs = []
        for (m1, m2), ph in zip(pairs, hits):
            recs.extend(self._pair_records(m1, m2, ph))
        return recs

    def _pair_records(self, m1: Read, m2: Read, ph: PairHit):
        gi = self.al.gi
        recs = []
        for mate_idx, (read, own, other, other_read) in enumerate(
            [(m1, ph.h1, ph.h2, m2), (m2, ph.h2, ph.h1, m1)]
        ):
            flag = 0x1 | (0x40 if mate_idx == 0 else 0x80)
            if ph.proper:
                flag |= 0x2
            if own is None:
                flag |= 0x4
            elif own.strand:
                flag |= 0x10
            if other is None:
                flag |= 0x8
            elif other.strand:
                flag |= 0x20

            if own is None:
                rec = sam.unmapped(read.name, read.codes, read.qual)
                rec.flag = flag | 0x4
                if other is not None:
                    ci, local = gi.genome.coord(other.pos)
                    rec.rname = gi.genome.names[int(ci[0])]
                    rec.pos = int(local[0])
                recs.append(rec)
                continue
            ci, local = gi.genome.coord(own.pos)
            rec = sam.mapped(
                read.name,
                read.codes,
                gi.genome.names[int(ci[0])],
                int(local[0]),
                own.strand,
                own.cigar,
                edit_distance=own.dist,
                mapq=37 if own.n_good == 1 else 3,
                qual=read.qual,
            )
            rec.flag = flag
            recs.append(rec)
        # mate linkage + TLEN
        r1, r2 = recs
        if not (r1.flag & 0x4) and not (r2.flag & 0x4):
            same = r1.rname == r2.rname
            tlen = 0
            if same:
                left = min(r1.pos, r2.pos)
                right = max(
                    r1.pos + _ref_span(r1.cigar), r2.pos + _ref_span(r2.cigar)
                )
                tlen = right - left
            recs = [
                _with_mate(r1, "=" if same else r2.rname, r2.pos,
                           tlen if r1.pos <= r2.pos else -tlen),
                _with_mate(r2, "=" if same else r1.rname, r1.pos,
                           tlen if r2.pos < r1.pos else -tlen),
            ]
        return recs


def _ref_span(cigar: str) -> int:
    import re

    return sum(int(c) for c, op in re.findall(r"(\d+)([MIDSH])", cigar) if op in "MD")


def _with_mate(rec: sam.SamRecord, rnext: str, pnext: int, tlen: int) -> sam.SamRecord:
    rec.rnext = rnext
    rec.pnext = pnext
    rec.tlen = tlen
    return rec
