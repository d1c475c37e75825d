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


def write_fastq(path, reads: list[Read]) -> None:
    with open(path, "w") as fh:
        for r in reads:
            q = r.qual if r.qual is not None else np.full(len(r), 30, np.int32)
            fh.write(
                f"@{r.name}\n{dna.decode(r.codes)}\n+\n"
                + (q + 33).astype(np.uint8).tobytes().decode("ascii")
                + "\n"
            )
