"""FASTA/FASTQ parsing and read records (SURVEY.md §2 #14).

Reference parity: `ReadSequence`/`FastqRead` + the FASTA pull parser the Java
tool inherited from utgenome-core.  Host-side, streaming, no external deps.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from . import dna


@dataclass
class Read:
    name: str
    codes: np.ndarray  # uint8, 0..3 with 4 = N
    qual: np.ndarray | None = None  # phred+33 already decoded to int, or None

    def __len__(self) -> int:
        return self.codes.size


@dataclass
class Contig:
    name: str
    codes: np.ndarray  # uint8, 0..4


def _open(path):
    if str(path).endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path, "r")


def read_fasta(path) -> list[Contig]:
    contigs: list[Contig] = []
    name, chunks = None, []
    with _open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    contigs.append(Contig(name, dna.encode("".join(chunks))))
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            contigs.append(Contig(name, dna.encode("".join(chunks))))
    return contigs


def write_fasta(path, contigs: list[Contig], width: int = 70) -> None:
    with open(path, "w") as fh:
        for c in contigs:
            fh.write(f">{c.name}\n")
            s = dna.decode(c.codes)
            for i in range(0, len(s), width):
                fh.write(s[i : i + width] + "\n")


def iter_fastq(path) -> Iterator[Read]:
    with _open(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                return
            seq = fh.readline().strip()
            fh.readline()  # '+'
            qual = fh.readline().strip()
            q = np.frombuffer(qual.encode(), dtype=np.uint8).astype(np.int32) - 33
            yield Read(header.strip()[1:].split()[0], dna.encode(seq), q)


def iter_reads(path) -> Iterator[Read]:
    """Dispatch on extension: FASTQ (possibly .gz) or FASTA."""
    p = str(path)
    base = p[:-3] if p.endswith(".gz") else p
    if base.endswith((".fq", ".fastq")):
        yield from iter_fastq(path)
    else:
        for c in read_fasta(path):
            yield Read(c.name, c.codes, None)


_ENC_LUT = np.full(256, 4, np.uint8)
for _i, _c in enumerate("ACGT"):
    _ENC_LUT[ord(_c)] = _i
    _ENC_LUT[ord(_c.lower())] = _i


def read_fastq_arrays(path):
    """Whole-file vectorised FASTQ parse -> contiguous arrays.

    Returns (names list[str], codes (B, L) uint8 0..4, quals (B, L) int32
    or None, lengths (B,) int32).  Building a batch by stacking per-read
    objects costs more than the aligner's device step (see
    models.pipeline.align_arrays_submit), so streaming drivers parse
    straight into (B, L) arrays; non-uniform lengths pad with 0/qual 0.
    """
    with _open(path) as fh:
        lines = fh.read().splitlines()
    if not lines:
        return [], np.zeros((0, 0), np.uint8), None, np.zeros(0, np.int32)
    assert len(lines) % 4 == 0, "truncated FASTQ"
    names = [l[1:].split()[0] for l in lines[0::4]]
    seqs = lines[1::4]
    quals = lines[3::4]
    B = len(seqs)
    lengths = np.fromiter((len(s) for s in seqs), np.int32, B)
    L = int(lengths.max())
    if bool((lengths == L).all()):
        codes = _ENC_LUT[
            np.frombuffer("".join(seqs).encode(), np.uint8).reshape(B, L)
        ]
        qarr = (
            np.frombuffer("".join(quals).encode(), np.uint8)
            .reshape(B, L)
            .astype(np.int32)
            - 33
        )
    else:
        codes = np.zeros((B, L), np.uint8)
        qarr = np.zeros((B, L), np.int32)
        for i, (s, q) in enumerate(zip(seqs, quals)):
            codes[i, : len(s)] = _ENC_LUT[np.frombuffer(s.encode(), np.uint8)]
            qarr[i, : len(q)] = np.frombuffer(q.encode(), np.uint8).astype(np.int32) - 33
    return names, codes, qarr, lengths


def write_fastq(path, reads: list[Read]) -> None:
    with open(path, "w") as fh:
        for r in reads:
            q = r.qual if r.qual is not None else np.full(len(r), 30, np.int32)
            fh.write(
                f"@{r.name}\n{dna.decode(r.codes)}\n+\n"
                + (q + 33).astype(np.uint8).tobytes().decode("ascii")
                + "\n"
            )
