"""SAM emission (SURVEY.md §2 #15; reference used net.sf.samtools).

Deterministic, device-count-independent output: records are emitted in input
read order and tie-breaking among equal-score candidates is resolved upstream
by (position, strand) order — see ``models.pipeline`` — so the SAM bytes are
identical whatever mesh produced the alignments.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import dna

FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10

# BWA-style multiplicity reporting cap: X0 counts AT OR above this are
# emitted as the cap with XO:i:1 set ("X0 is a floor, not exact").  The >=
# (not >) is deliberate: a pipeline whose candidate budget equals the cap
# cannot distinguish exactly-cap from above-cap, so n_hits == X0_CAP must be
# flagged as possibly-truncated for SAM bytes to be identical across
# pipelines/budgets (ADVICE r2 low adjudicated: semantics kept, comment
# fixed).  Candidate budgets
# differ between the single-device and mesh-sharded pipelines, so exact
# counts above the smallest budget are truncation artifacts — capping at the
# smallest budget keeps SAM bytes identical across mesh shapes while X0
# stays exact for every read below the cap.
X0_CAP = 8


@dataclass
class SamRecord:
    qname: str
    flag: int
    rname: str
    pos: int  # 0-based; emitted 1-based
    mapq: int
    cigar: str
    seq: str
    qual: str
    tags: tuple = ()
    rnext: str = "*"  # mate reference ('=' for same contig)
    pnext: int = -1  # mate position, 0-based; emitted 1-based
    tlen: int = 0

    def line(self) -> str:
        fields = [
            self.qname,
            str(self.flag),
            self.rname,
            str(self.pos + 1),
            str(self.mapq),
            self.cigar,
            self.rnext,
            str(self.pnext + 1),
            str(self.tlen),
            self.seq,
            self.qual,
        ]
        fields += [f"{k}:{t}:{v}" for (k, t, v) in self.tags]
        return "\t".join(fields)


def unmapped(read_name: str, codes: np.ndarray, qual=None, overflow: bool = False) -> SamRecord:
    # XO:i:1 marks reads whose search budget overflowed (candidate or verify
    # lanes) — "unmapped because dropped" is distinguishable from "genuinely
    # unmapped" in the output (ADVICE r1 medium)
    tags = (("XO", "i", "1"),) if overflow else ()
    return SamRecord(
        qname=read_name,
        flag=FLAG_UNMAPPED,
        rname="*",
        pos=-1,
        mapq=0,
        cigar="*",
        seq=dna.decode(codes),
        qual=_qual_str(qual, codes.size),
        tags=tags,
    )


def alignment_score(cigar: str, edit_distance: int, match=1, mismatch=4, gap_open=6, gap_ext=1) -> int:
    """BWA-style score from CIGAR + NM: indel bases come from I/D ops,
    mismatches are the remainder of NM (reference #12 produced scores)."""
    import re as _re

    ops = _re.findall(r"(\d+)([MIDSH])", cigar)
    m_bases = sum(int(c) for c, op in ops if op == "M")
    gaps = [(int(c)) for c, op in ops if op in "ID"]
    indel_bases = sum(gaps)
    mismatches = max(0, edit_distance - indel_bases)
    return (
        match * (m_bases - mismatches)
        - mismatch * mismatches
        - sum(gap_open + gap_ext * (g - 1) for g in gaps)
    )


def mapped(
    read_name: str,
    codes: np.ndarray,
    rname: str,
    pos: int,
    strand: int,
    cigar: str,
    edit_distance: int,
    mapq: int = 37,
    qual=None,
    n_hits: int | None = None,
    overflow: bool = False,
    score: int | None = None,
) -> SamRecord:
    seq_codes = dna.revcomp(codes) if strand else codes
    q = _qual_str(qual, codes.size)
    if strand:
        q = q[::-1]
    tags = [
        ("NM", "i", str(edit_distance)),
        # AS from the scored aligner when available; CIGAR+NM formula as the
        # fallback (VERDICT r1 missing-#3)
        ("AS", "i", str(alignment_score(cigar, edit_distance) if score is None else score)),
    ]
    if n_hits is not None:
        if n_hits >= X0_CAP:
            overflow = True
        tags.append(("X0", "i", str(min(n_hits, X0_CAP))))
    if overflow:
        tags.append(("XO", "i", "1"))
    return SamRecord(
        qname=read_name,
        flag=FLAG_REVERSE if strand else 0,
        rname=rname,
        pos=pos,
        mapq=mapq,
        cigar=cigar,
        seq=dna.decode(seq_codes),
        qual=q,
        tags=tuple(tags),
    )


def _qual_str(qual, n: int) -> str:
    if qual is None:
        return "*"
    return (np.asarray(qual, dtype=np.int32) + 33).astype(np.uint8).tobytes().decode()


def header(names: list[str], lengths: list[int], prog: str = "gwa-tpu") -> str:
    lines = ["@HD\tVN:1.6\tSO:unsorted"]
    lines += [f"@SQ\tSN:{n}\tLN:{ln}" for n, ln in zip(names, lengths)]
    lines.append(f"@PG\tID:{prog}\tPN:{prog}")
    return "\n".join(lines)


def write_sam(path, hdr: str, records) -> None:
    with open(path, "w") as fh:
        fh.write(hdr + "\n")
        for r in records:
            fh.write(r.line() + "\n")
