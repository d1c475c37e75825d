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


def _divergent_reads(codes, n, L, rng, frac):
    """Reads with uniformly scattered substitutions at rate ``frac``."""
    pos = rng.integers(0, codes.size - L - 50, size=n)
    reads = codes[pos[:, None] + np.arange(L)[None, :]].copy()
    n_subs = int(frac * L)
    for i in range(n):
        at = rng.choice(L, size=n_subs, replace=False)
        reads[i, at] = (reads[i, at] + rng.integers(1, 4, size=n_subs)) % 4
    return reads, pos


def test_long_read_divergence_envelope(setup):
    """Operating envelope at the accept boundary (VERDICT r4 weak-#8):
    with max_edit_frac=0.12, 8%-divergent reads MUST map to their locus;
    16%-divergent reads MUST NOT map (the summed banded distance exceeds
    the cap); 12% (the boundary) may go either way, but any read that
    does map must land on the true locus — the threshold may cost
    sensitivity, never specificity."""
    codes, al = setup
    rng = np.random.default_rng(17)
    n, L = 16, 1024
    lens = np.full(n, L, np.int32)

    reads8, pos8 = _divergent_reads(codes, n, L, rng, 0.08)
    lh = al.align_arrays(reads8.astype(np.int8), lens, traceback=False)
    assert lh.mapped.all(), f"8% divergence must map: {np.nonzero(~lh.mapped)[0]}"
    assert (np.abs(lh.pos - pos8) <= al.band).all()

    reads16, _ = _divergent_reads(codes, n, L, rng, 0.16)
    lh = al.align_arrays(reads16.astype(np.int8), lens, traceback=False)
    assert not lh.mapped.any(), "16% divergence must be rejected"

    reads12, pos12 = _divergent_reads(codes, n, L, rng, 0.12)
    lh = al.align_arrays(reads12.astype(np.int8), lens, traceback=False)
    ok = lh.mapped
    assert (np.abs(lh.pos[ok] - pos12[ok]) <= al.band).all(), (
        "a boundary read that maps must map to its true locus"
    )


def test_long_read_cigar_native_matches_numpy_oracle(setup, monkeypatch):
    """The production CIGAR path (whole-read banded affine traceback,
    native C++ engine) must be bit-identical to the NumPy oracle engine on
    the long-read shapes (VERDICT r4 ask #4 'CIGARs still exact')."""
    from genome_weaver_align_tpu.ops import affine

    codes, al = setup
    rng = np.random.default_rng(23)
    n, L = 8, 1024
    reads, pos, strand = _make_long_reads(codes, n, L, rng)
    lens = np.full(n, L, np.int32)
    lh_native = al.align_arrays(reads.astype(np.int8), lens)
    assert affine._native_fn is not None, "native engine not built"
    monkeypatch.setattr(affine, "_native_fn", None)
    monkeypatch.setattr(affine, "_native_failed", True)
    lh_oracle = al.align_arrays(reads.astype(np.int8), lens)
    assert np.array_equal(lh_native.pos, lh_oracle.pos)
    assert np.array_equal(lh_native.dist, lh_oracle.dist)
    assert lh_native.cigars == lh_oracle.cigars
    assert lh_native.aux == lh_oracle.aux
    # CIGAR sanity: M+I runs consume exactly the read length
    import re

    for c in lh_native.cigars.values():
        consumed = sum(
            int(r) for r, op in re.findall(r"(\d+)([MID])", c) if op in "MI"
        )
        assert consumed == L, (c, consumed)


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
