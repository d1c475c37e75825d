"""Long-read chunked seeding + diagonal voting (models.long_read):
1 kb reads with planted substitutions AND indels must map to the correct
locus on both strands (VERDICT r3 missing-#4 'Done' criterion)."""

import numpy as np
import pytest

from genome_weaver_align_tpu.index import seedtable
from genome_weaver_align_tpu.index.files import Genome, build_genome_index
from genome_weaver_align_tpu.models.long_read import LongReadAligner
from genome_weaver_align_tpu.utils.fasta import Contig

SEED_J = 13
GENOME_BP = 2_000_000


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(41)
    codes = rng.integers(0, 4, size=GENOME_BP, dtype=np.uint8)
    gi = build_genome_index(
        Genome.from_contigs([Contig("gL", codes)]), sample_rate=16
    )
    so, sp = seedtable.build_seed_table(codes, SEED_J)
    al = LongReadAligner(gi, (so, sp), SEED_J)
    return codes, al


def _make_long_reads(codes, n, L, rng, n_subs=6, n_indels=2):
    """Reads with planted subs + small indels; returns (reads, pos, strand)."""
    pos = rng.integers(0, codes.size - L - 50, size=n)
    reads = np.zeros((n, L), dtype=np.uint8)
    for i in range(n):
        seq = list(codes[pos[i] : pos[i] + L + 20])
        for _ in range(n_indels):
            at = int(rng.integers(50, L - 50))
            if rng.random() < 0.5:
                seq.insert(at, int(rng.integers(0, 4)))  # insertion in read
            else:
                del seq[at]  # deletion from read
        seq = np.array(seq[:L], dtype=np.uint8)
        at = rng.integers(0, L, size=n_subs)
        seq[at] = (seq[at] + rng.integers(1, 4, size=n_subs)) % 4
        reads[i] = seq
    strand = rng.integers(0, 2, size=n)
    rc = (3 - reads)[:, ::-1]
    reads = np.where(strand[:, None] == 1, rc, reads)
    return reads, pos, strand


def test_long_reads_map_to_locus(setup):
    codes, al = setup
    rng = np.random.default_rng(5)
    n, L = 24, 1024
    reads, pos, strand = _make_long_reads(codes, n, L, rng)
    lh = al.align_arrays(reads.astype(np.int8), np.full(n, L, np.int32))
    assert lh.mapped.all(), f"unmapped: {np.nonzero(~lh.mapped)[0]}"
    assert (lh.strand == strand).all()
    # post-traceback POS is exact (edits planted away from the read ends)
    assert (np.abs(lh.pos - pos) <= 2).all(), np.abs(lh.pos - pos).max()
    # support: most of the 8 segments voted for the locus
    assert (lh.support >= 4).all()
    # indel reads carry real I/D CIGARs from the affine traceback
    assert any(
        ("I" in c or "D" in c) for c in lh.cigars.values()
    ), lh.cigars
    assert all(i in lh.aux for i in lh.cigars)


def test_long_reads_clean_exact(setup):
    codes, al = setup
    rng = np.random.default_rng(9)
    n, L = 16, 1024
    reads, pos, strand = _make_long_reads(codes, n, L, rng, n_subs=0, n_indels=0)
    lh = al.align_arrays(reads.astype(np.int8), np.full(n, L, np.int32))
    assert lh.mapped.all()
    assert (lh.pos == pos).all()
    assert (lh.dist == 0).all()
    assert all(c == f"{L}M" for c in lh.cigars.values())


def test_long_reads_no_traceback_diagonal(setup):
    codes, al = setup
    rng = np.random.default_rng(11)
    n, L = 8, 1024
    reads, pos, strand = _make_long_reads(codes, n, L, rng)
    lh = al.align_arrays(
        reads.astype(np.int8), np.full(n, L, np.int32), traceback=False
    )
    assert lh.mapped.all()
    assert not lh.cigars
    assert (np.abs(lh.pos - pos) <= 24).all()


def test_long_reads_ragged_and_junk(setup):
    codes, al = setup
    rng = np.random.default_rng(13)
    n, L = 8, 1000  # not a multiple of seg_len: end-padded, tail masked
    reads, pos, strand = _make_long_reads(codes, n, L, rng, n_subs=4, n_indels=1)
    junk = rng.integers(0, 4, size=(2, L)).astype(np.uint8)
    allr = np.concatenate([reads, junk], axis=0).astype(np.int8)
    lens = np.full(n + 2, L, np.int32)
    lh = al.align_arrays(allr, lens)
    assert lh.mapped[:n].all()
    assert (np.abs(lh.pos[:n] - pos) <= 24).all()
    assert not lh.mapped[n:].any(), "random reads must not map"
