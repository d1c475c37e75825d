"""Alignment pipeline (SURVEY.md §2 #13, §3.2/§3.3 call stacks).

Per read-batch: forward + reverse-complement search -> candidate SA intervals
-> genome coordinates (sparse-SA locate on device) -> deterministic best-hit
selection -> SAM records.  Tie-breaking among equal-score candidates is
(genome position, strand) lexicographic so output is identical for any mesh
shape (SURVEY.md §7 "bit-identical SAM").
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..index.files import GenomeIndex
from ..ops import rank
from ..ops.rank import DeviceFMIndex
from ..utils import sam
from ..utils.fasta import Read
from ..utils.simulate import reads_to_batch
from . import exact


@dataclass
class ExactHit:
    pos: int  # global genome coordinate
    strand: int  # 0 fwd, 1 rev (read maps as revcomp)
    n_hits: int  # multiplicity across both strands


class ExactAligner:
    """Acceptance config 1: exact-match backward search end-to-end."""

    def __init__(self, gi: GenomeIndex, max_hits: int = 16):
        self.gi = gi
        self.fm = rank.from_host(gi.fwd)
        self.max_hits = max_hits

    def align_batch(self, reads: list[Read]):
        import jax.numpy as jnp

        lengths = np.array([len(r) for r in reads], dtype=np.int32)
        fwd = reads_to_batch(reads).astype(np.int32)
        rc = exact.revcomp_batch(fwd, lengths)

        hits_per_strand = []
        for batch in (fwd, rc):
            lo, hi = exact.exact_interval_search(
                self.fm, jnp.asarray(batch), jnp.asarray(lengths)
            )
            pos, valid = exact.locate_hits(self.fm, lo, hi, self.max_hits)
            hits_per_strand.append(
                (np.asarray(pos), np.asarray(valid), np.asarray(hi) - np.asarray(lo))
            )

        out: list[ExactHit | None] = []
        for i in range(len(reads)):
            cands = []
            total = 0
            for strand, (pos, valid, width) in enumerate(hits_per_strand):
                total += max(0, int(width[i]))
                for p in pos[i][valid[i]]:
                    cands.append((int(p), strand))
            if not cands:
                out.append(None)
            else:
                p, s = min(cands)
                out.append(ExactHit(p, s, total))
        return out

    def to_sam(self, reads: list[Read], hits) -> list[sam.SamRecord]:
        recs = []
        for r, h in zip(reads, hits):
            if h is None:
                recs.append(sam.unmapped(r.name, r.codes, r.qual))
                continue
            ci, local = self.gi.genome.coord(h.pos)
            recs.append(
                sam.mapped(
                    r.name,
                    r.codes,
                    self.gi.genome.names[int(ci[0])],
                    int(local[0]),
                    h.strand,
                    f"{len(r)}M",
                    edit_distance=0,
                    mapq=37 if h.n_hits == 1 else 0,
                    qual=r.qual,
                )
            )
        return recs

    def sam_header(self) -> str:
        return sam.header(self.gi.genome.names, self.gi.genome.lengths)
