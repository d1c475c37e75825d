"""Disk layout + streaming alignment for multi-part indexes beyond 2^31
(SURVEY.md §7 hard parts; BASELINE.json config 5 at real scale).

``index.multi`` proves the merge semantics at toy scale but keeps every
part's tables in RAM and on-device at once — impossible for a ~3 Gbp
genome whose parts each carry multi-GB seed tables.  This module is the
production-scale counterpart:

- each part is serialized standalone (FM arrays + CSR seed table + its
  slice of the contig table), so a build can stream parts through RAM;
- alignment iterates PARTS in the outer loop and read batches in the
  inner loop: one part's tables are HBM-resident at a time, every batch
  is scanned against it, per-read bests improve-merge across parts with
  the same deterministic (dist, global_pos, strand) order as
  ``index.multi.MultiIndexAligner`` — so the result is bit-identical to
  a hypothetical single-index run, while peak HBM stays one part's
  footprint (measured ~5 GB/part at 1.6 Gbp, v5e has 16 GB).

Build entry point: ``scripts/build_gbp_index.py`` (offline, native SA-IS
per part; records build times into ``gbp_meta.json`` for the bench).
"""

from __future__ import annotations

import gc
import json
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..utils.bitvector import BitVector
from .build import FMIndexData


@dataclass
class PartMeta:
    names: list[str]  # contig names in this part
    lengths: list[int]
    global_offset: int  # genome-global position of this part's base 0


def save_part(
    part_dir: Path,
    i: int,
    fm: FMIndexData,
    seed_offsets: np.ndarray,
    seed_positions: np.ndarray,
    seed_j: int,
    meta: PartMeta,
) -> int:
    """Serialize one part; returns the device-upload byte total (the HBM
    footprint this part costs while active)."""
    part_dir.mkdir(parents=True, exist_ok=True)
    marks = fm.ssa_marks.get(np.arange(fm.n + 1))
    np.savez(
        part_dir / f"part{i}.npz",
        n=fm.n,
        primary=fm.primary,
        counts=fm.counts,
        C=fm.C,
        bwt_words=fm.bwt_words,
        occ_cp_i32=fm.occ_cp.astype(np.int32),
        sample_rate=fm.sample_rate,
        mark_bits=np.packbits(marks),
        ssa_values_i32=fm.ssa_values.astype(np.int32),
        text_words=fm.text_words,
        seed_offsets=seed_offsets,
        seed_positions=seed_positions,
        seed_j=seed_j,
        names=np.array(meta.names),
        lengths=np.array(meta.lengths, dtype=np.int64),
        global_offset=np.int64(meta.global_offset),
    )
    hbm = (
        fm.bwt_words.nbytes
        + fm.occ_cp.size * 4  # int32 on device
        + marks.size // 8
        + fm.ssa_values.size * 4
        + fm.text_words.nbytes
        + seed_offsets.nbytes
        + seed_positions.nbytes
    )
    return int(hbm)


def load_part(part_dir: Path, i: int):
    """-> (GenomeIndex, (seed_offsets, seed_positions), seed_j, global_offset).

    The Genome carries an EMPTY codes array: the aligner's window/traceback
    reads go through the packed ``text_words`` (fm.extract), and SAM
    emission only needs names/offsets — holding 1.6 GB of raw codes per
    part in host RAM would defeat the streaming layout."""
    from .files import Genome, GenomeIndex

    z = np.load(part_dir / f"part{i}.npz")
    n = int(z["n"])
    bits = np.unpackbits(z["mark_bits"])[: n + 1].astype(bool)
    fm = FMIndexData(
        n=n,
        primary=int(z["primary"]),
        counts=z["counts"],
        C=z["C"],
        bwt_words=z["bwt_words"],
        occ_cp=z["occ_cp_i32"].astype(np.int64),
        sample_rate=int(z["sample_rate"]),
        ssa_marks=BitVector(bits),
        ssa_values=z["ssa_values_i32"].astype(np.int64),
        text_words=z["text_words"],
    )
    lengths = z["lengths"]
    offsets = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    genome = Genome(
        names=[str(s) for s in z["names"]],
        offsets=offsets,
        codes=np.zeros(0, dtype=np.uint8),
        n_mask_spans=np.zeros((0, 2), np.int64),
    )
    gi = GenomeIndex(genome, fm, None)
    return (
        gi,
        (z["seed_offsets"], z["seed_positions"]),
        int(z["seed_j"]),
        int(z["global_offset"]),
    )


def load_rev(part_dir: Path, i: int) -> FMIndexData | None:
    """Reverse-text FM of part i (scripts/build_gbp_rev.py), or None.

    Only needed by the staircase rescue pass; streaming alignment proper
    never touches it."""
    p = Path(part_dir) / f"part{i}_rev.npz"
    if not p.exists():
        return None
    z = np.load(p)
    n = int(z["n"])
    bits = np.unpackbits(z["mark_bits"])[: n + 1].astype(bool)
    return FMIndexData(
        n=n,
        primary=int(z["primary"]),
        counts=z["counts"],
        C=z["C"],
        bwt_words=z["bwt_words"],
        occ_cp=z["occ_cp_i32"].astype(np.int64),
        sample_rate=int(z["sample_rate"]),
        ssa_marks=BitVector(bits),
        ssa_values=z["ssa_values_i32"].astype(np.int64),
        text_words=z["text_words"],
    )


@dataclass
class MultiPartIndex:
    part_dir: Path
    n_parts: int
    names: list[str]  # all contig names, global order
    lengths: list[int]
    part_offsets: list[int]


def load_multi_index(part_dir: Path) -> MultiPartIndex:
    meta = json.loads((Path(part_dir) / "parts.json").read_text())
    return MultiPartIndex(
        part_dir=Path(part_dir),
        n_parts=meta["n_parts"],
        names=meta["names"],
        lengths=meta["lengths"],
        part_offsets=meta["part_offsets"],
    )


def align_stream_multipart(
    mi: MultiPartIndex,
    reads: np.ndarray,  # (N, L) int8 forward verify codes
    lengths_row: np.ndarray,  # (B,) — uniform batch shape
    batch: int,
    k: int = 2,
    log=lambda m: None,
):
    """Align every read against every part, improve-merging per-read bests.

    Returns (best_dist, best_gpos, best_strand, mapped, align_s, load_s)
    with genome-GLOBAL positions.  Parts stream through HBM one at a time.

    ``align_s`` counts device+merge time only; ``load_s`` is the per-part
    disk-load + HBM upload total, reported separately because it is a
    once-per-part cost that amortizes over the WHOLE read stream (a
    production run streams millions of reads per part; a bench that folds
    ~7 min of one-time load into a 4-batch stream would measure the disk,
    not the aligner).

    Streaming passes run seed+tier-1 only.  The staircase completeness
    backstop (tier-2) is DEFERRED to a final rescue pass over the reads
    still unmapped after the cross-part merge — during streaming, a read
    whose locus lives in another part is indistinguishable from a
    repeat-flooded one, so per-part tier-2 would staircase ~half of every
    batch for nothing.  The rescue needs per-part reverse indexes
    (scripts/build_gbp_rev.py); without them it is skipped."""
    import jax

    from ..models.pipeline import SuffixFilterAligner

    N = reads.shape[0]
    n_batches = -(-N // batch)  # a partial tail batch is padded, not dropped
    padN = n_batches * batch
    if padN != N:
        reads = np.concatenate(
            [reads, np.broadcast_to(reads[:1], (padN - N, reads.shape[1]))]
        )
    INF = 1 << 20
    best_dist = np.full(padN, INF, np.int64)
    best_gpos = np.full(padN, np.int64(1) << 62, np.int64)
    best_strand = np.zeros(padN, np.int64)

    align_s = 0.0
    load_s = 0.0
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(1)
    nxt_part = pool.submit(load_part, mi.part_dir, 0)
    for p in range(mi.n_parts):
        tp = time.time()
        # host-side load of part p+1 overlaps part p's align stream below
        # (load_part is pure host npz IO; device upload stays serialized in
        # the aligner constructor on this thread)
        gi, seed_tab, seed_j, goff = nxt_part.result()
        if p + 1 < mi.n_parts:
            nxt_part = pool.submit(load_part, mi.part_dir, p + 1)
        # Budgets scale with part size: the mean j-mer bucket holds
        # n/4^j positions (~24 at 1.6 Gbp, j=13), so the 230 Mbp defaults
        # (8/12) would flood EVERY read into the 16x tier-1 rerun — the
        # fallback would become the primary path at 2x the cost.  Rare-probe
        # selection keeps most reads well under the mean, hence 1.5x mean
        # rather than several-x.
        mean_bucket = gi.fwd.n / 4**seed_j
        max_hits = max(8, min(64, int(1.5 * mean_bucket)))
        # verify-set cap stays tight: the verify stage materializes
        # O(B * max_cands * L * 16) bytes of window/DP temps — 70 cands at
        # B=16k compiled to a 2x10 GB HLO temp next to 8.7 GB of tables
        # (XLA OOM, measured).  Rare-probe selection keeps the real cand
        # count far below 2*max_hits: 3 pieces' rarest probes are ~<=10
        # hits each at 1.6 Gbp, so 32 slots hold the deduped union for all
        # but flooded reads (which carry the overflow flag either way).
        max_cands = max(12, min(32, 2 * max_hits))
        al = SuffixFilterAligner(
            gi, k=k, max_hits_per_piece=max_hits, seed_table=seed_tab,
            seed_j=seed_j, max_cands=max_cands, verify_slack=4,
        )
        # jnp.asarray uploads are async: force the 8.7 GB of tables onto the
        # device INSIDE the load window, or the transfer bills to batch 0
        # (measured: 235 s of "align" time that was really the upload)
        jax.block_until_ready(
            (al.fm.blocks, al.fm.mark_blocks, al.fm.ssa_values,
             al.text_words, al.seed_tab)
        )
        load_s += time.time() - tp
        log(
            f"part {p}: loaded+uploaded in {time.time()-tp:.1f}s "
            f"(n={gi.fwd.n}, max_hits={max_hits}, max_cands={max_cands})"
        )
        t0 = time.time()

        def submit(b):
            return al.align_arrays_submit(reads[b * batch : (b + 1) * batch], lengths_row)

        pending = submit(0)
        for b in range(n_batches):
            tb = time.time()
            nxt = submit(b + 1) if b + 1 < n_batches else None
            ah = al.align_arrays_finish(pending)
            pending = nxt
            log(f"part {p} batch {b}: {(time.time()-tb)*1e3:.0f} ms, stats={al.last_stats}")
            sl = slice(b * batch, (b + 1) * batch)
            d = np.where(ah.mapped, ah.dist, INF)
            g = np.where(ah.mapped, ah.pos + goff, np.int64(1) << 62)
            st = ah.strand
            # deterministic improve-merge: (dist, global_pos, strand)
            cur = (best_dist[sl], best_gpos[sl], best_strand[sl])
            better = (d < cur[0]) | (
                (d == cur[0])
                & ((g < cur[1]) | ((g == cur[1]) & (st < cur[2])))
            )
            best_dist[sl] = np.where(better, d, cur[0])
            best_gpos[sl] = np.where(better, g, cur[1])
            best_strand[sl] = np.where(better, st, cur[2])
        align_s += time.time() - t0
        # ``submit`` closes over ``al`` — deleting only the names would keep
        # the part's ~GB device tables alive through the NEXT part's upload
        # (two parts > one v5e HBM: the run wedges inside the runtime's
        # allocation retry, found the hard way at 2x8.67 GB)
        del al, gi, seed_tab, submit, pending
        gc.collect()  # drop this part's device buffers before the next upload
    pool.shutdown(wait=False)

    # ---- deferred tier-2: staircase rescue of the still-unmapped tail ----
    from ..index.files import GenomeIndex as _GI

    un = np.nonzero(best_dist[:N] > k)[0]
    have_rev = all(
        (Path(mi.part_dir) / f"part{p}_rev.npz").exists()
        for p in range(mi.n_parts)
    )
    if un.size and have_rev:
        L = reads.shape[1]
        for p in range(mi.n_parts):
            tp = time.time()
            gi, _seed, _j, goff = load_part(mi.part_dir, p)
            rev = load_rev(mi.part_dir, p)
            gi = _GI(gi.genome, gi.fwd, rev)
            al2 = SuffixFilterAligner(
                gi, k=k, max_hits_per_piece=8, use_staircase=True,
                verify_slack=16, overflow_fallback=False,
                # full-width pool: a 400k-copy family branches far past the
                # 16-slot default (measured: 1.4% of the stream stayed
                # unmapped to pool truncation); the rescue cohort is a few
                # thousand reads, so the 4x pool costs seconds, not minutes
                staircase_slots=64,
            )
            jax.block_until_ready(
                (al2.fm.blocks, al2.bi.rev.blocks, al2.text_words)
            )
            load_s += time.time() - tp
            t0 = time.time()
            CH = 2048
            for o in range(0, un.size, CH):
                ch = un[o : o + CH]
                P = CH if un.size > CH else max(
                    128, 1 << (int(ch.size) - 1).bit_length()
                )
                sel = np.concatenate([ch, np.full(P - ch.size, ch[0], ch.dtype)])
                ah = al2.align_arrays_finish(
                    al2.align_arrays_submit(reads[sel], np.full(P, L, np.int32))
                )
                m = ch.size
                d = np.where(ah.mapped[:m], ah.dist[:m], 1 << 20)
                g = np.where(ah.mapped[:m], ah.pos[:m] + goff, np.int64(1) << 62)
                st = ah.strand[:m]
                cur = (best_dist[ch], best_gpos[ch], best_strand[ch])
                better = (d < cur[0]) | (
                    (d == cur[0])
                    & ((g < cur[1]) | ((g == cur[1]) & (st < cur[2])))
                )
                best_dist[ch] = np.where(better, d, cur[0])
                best_gpos[ch] = np.where(better, g, cur[1])
                best_strand[ch] = np.where(better, st, cur[2])
            align_s += time.time() - t0
            log(
                f"rescue part {p}: staircase over {un.size} unmapped reads "
                f"in {time.time()-t0:.1f}s"
            )
            del al2, gi, rev
            gc.collect()

    best_dist, best_gpos, best_strand = (
        best_dist[:N], best_gpos[:N], best_strand[:N]
    )
    mapped = best_dist <= k
    return best_dist, best_gpos, best_strand, mapped, align_s, load_s


def bench_align_stream(
    mi: MultiPartIndex, n_batches: int, batch: int, read_len: int, seed: int,
    log=lambda m: None,
):
    """Bench driver: loads the prebuilt paired-style read stream (written by
    scripts/build_gbp_index.py next to the parts) and aligns it through the
    multi-part merge path."""
    z = np.load(mi.part_dir / "reads.npz")
    reads, true_gpos, true_strand = z["reads"], z["true_gpos"], z["true_strand"]
    N = min(n_batches * batch, reads.shape[0] - reads.shape[0] % batch)
    reads = reads[:N].astype(np.int8)
    lengths_row = np.full(batch, reads.shape[1], np.int32)

    # warmup/compile on one batch (first part only costs the jit once; the
    # per-part loop reuses the same executable shapes)
    dist, gpos, strand, mapped, align_s, load_s = align_stream_multipart(
        mi, reads, lengths_row, batch, log=log
    )
    rate = N / align_s
    log(f"multi-part: align {align_s:.1f}s, part load+upload {load_s:.1f}s")
    correct = mapped & (gpos == true_gpos[:N]) & (strand == true_strand[:N])
    return rate, float(mapped.mean()), float(correct.mean()), load_s
