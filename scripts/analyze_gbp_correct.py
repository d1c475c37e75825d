"""Classify the gbp bench's mapped-but-wrong reads (VERDICT r4 missing-#1:
"is the 2.3% loss rescue pool truncation, cross-part tie-breaks, or budget
caps? — measure, don't guess").

Reads bench_cache/gbp_debug.npz (written by `bench.py --only gbp`) and the
read stream, regenerates the synthetic contigs deterministically
(scripts/build_gbp_index.py::make_contig), and for every mapped read
compares the reported alignment's distance against the distance at the
TRUE locus (the stream is substitution-only, so Hamming = edit there):

- d_found <  d_true : the reported hit is strictly better than the planted
  locus — a best-mapper MUST prefer it (simulator ambiguity, not error);
- d_found == d_true : equal-quality copy elsewhere; the deterministic
  (dist, pos, strand) tie-break picked it (ambiguity, not error);
- d_found >  d_true : the search MISSED the true locus — a genuine
  completeness bug worth fixing.

Also sanity-checks the reported hits (Hamming at the reported locus must
not be wildly below the reported distance) and prints the breakdown by
n_good/overflow flags, plus the "as-good-or-better" correctness.

Usage: python scripts/analyze_gbp_correct.py [--cache bench_cache]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.build_gbp_index import make_contig  # noqa: E402

CONTIG_BP = 400_000_000
L = 150


def _gather_hamming(codes, gpos, goff, rows_reads):
    starts = (gpos - goff).clip(0, CONTIG_BP - L)
    wins = codes[starts[:, None] + np.arange(L)[None, :]]
    return (wins != rows_reads).sum(axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="bench_cache")
    args = ap.parse_args()
    cache = Path(args.cache)
    dbg = np.load(cache / "gbp_debug.npz")
    z = np.load(cache / "gbp_parts" / "reads.npz")
    N = dbg["dist"].size
    reads = z["reads"][:N].astype(np.int64)
    tg, ts = dbg["true_gpos"], dbg["true_strand"]
    fg, fs, fd = dbg["gpos"], dbg["strand"], dbg["dist"]
    pre_d = dbg["pre_dist"]
    mapped = fd <= 2
    strict = mapped & (fg == tg) & (fs == ts)
    wrong = mapped & ~strict
    print(
        f"N={N} mapped={mapped.mean():.4f} strict-correct={strict.mean():.4f} "
        f"wrong={wrong.sum()} unmapped={(~mapped).sum()} "
        f"rescue-mapped={(mapped & (pre_d > 2)).sum()}"
    )

    rc = lambda a: (3 - a[:, ::-1]).astype(a.dtype)
    reads_by_true = np.where(ts[:, None] == 0, reads, rc(reads))
    reads_by_found = np.where(fs[:, None] == 0, reads, rc(reads))
    d_true = np.full(N, 10**6, np.int64)
    d_found_ham = np.full(N, 10**6, np.int64)
    t0 = time.time()
    for ci in range(8):
        goff = ci * CONTIG_BP
        codes = make_contig(ci, CONTIG_BP).astype(np.int64)
        sel = np.nonzero((tg >= goff) & (tg < goff + CONTIG_BP))[0]
        if sel.size:
            d_true[sel] = _gather_hamming(codes, tg[sel], goff, reads_by_true[sel])
        self_f = np.nonzero(mapped & (fg >= goff) & (fg < goff + CONTIG_BP))[0]
        if self_f.size:
            d_found_ham[self_f] = _gather_hamming(
                codes, fg[self_f], goff, reads_by_found[self_f]
            )
        print(f"contig {ci}: d_true for {sel.size}, d_found for {self_f.size} "
              f"({time.time()-t0:.0f}s)")
        del codes

    # sanity: reported distance should equal the Hamming at the reported
    # locus for substitution alignments (edit < hamming only via indels)
    bad_pos = mapped & (d_found_ham > fd) & (d_found_ham > 2)
    print(f"\nsanity: mapped reads whose reported locus does not support the "
          f"reported distance (possible coordinate bug): {bad_pos.sum()}")

    w = np.nonzero(wrong)[0]
    better = int((fd[w] < d_true[w]).sum())
    tie = int((fd[w] == d_true[w]).sum())
    miss = int((fd[w] > d_true[w]).sum())
    print(f"wrong={w.size}: better-elsewhere={better} tie={tie} MISS={miss}")
    asgood = mapped & (strict | (fd <= d_true))
    print(f"as-good-or-better correct: {asgood.mean():.4f} "
          f"(strict {strict.mean():.4f})")
    ng = dbg["n_good"]
    ovf = dbg["overflow"]
    for name, m in (
        ("wrong & n_good>1 (flagged ambiguous)", wrong & (ng > 1)),
        ("wrong & n_good==1 & overflow (flagged truncated)", wrong & (ng == 1) & ovf),
        ("wrong & n_good==1 & !overflow (claimed unique)", wrong & (ng == 1) & ~ovf),
    ):
        mm = m if m.dtype == bool else m.astype(bool)
        print(f"{name}: {int(mm.sum())}")
    # unmapped tail: how many unmapped reads have a <=2 true locus (real
    # sensitivity loss) vs planted-subs>2 (not mappable at k=2 anyway)?
    um = ~mapped
    print(f"unmapped with d_true<=2 (sensitivity loss): "
          f"{int((um & (d_true <= 2)).sum())} of {int(um.sum())}")
    miss_idx = w[fd[w] > d_true[w]]
    if miss_idx.size:
        print("\nfirst 20 genuine misses (idx, d_found, d_true, ovf, n_good):")
        for i in miss_idx[:20]:
            print(
                f"  {i}: found d={fd[i]} @ {fg[i]} s{fs[i]}, "
                f"true d={d_true[i]} @ {tg[i]} s{ts[i]}, "
                f"ovf={bool(ovf[i])} n_good={ng[i]} pre_d={pre_d[i]}"
            )
    np.savez(
        cache / "gbp_correct_analysis.npz",
        d_true=d_true, d_found_ham=d_found_ham, wrong=wrong, miss_idx=miss_idx,
    )


if __name__ == "__main__":
    main()
