"""Precompute each gbp bench read's distance at its TRUE locus.

The gbp stream is substitution-only, so d_true = Hamming(read, genome
window at the planted position).  Written once to
bench_cache/gbp_parts/reads_dtrue.npy; `bench.py --only gbp` loads it to
report the as-good-or-better correctness (reported hit at least as good
as the planted locus) next to the strict position-match — the measured
r5 decomposition (scripts/analyze_gbp_correct.py) showed 828/32768 reads
are exact-distance TIES to another repeat copy, so strict correctness is
bounded ~0.971 on this genome no matter the search.

Usage: python scripts/compute_gbp_dtrue.py [--cache bench_cache]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="bench_cache")
    args = ap.parse_args()
    parts = Path(args.cache) / "gbp_parts"
    z = np.load(parts / "reads.npz")
    reads = z["reads"].astype(np.int64)
    tg, ts = z["true_gpos"], z["true_strand"]
    N, L = reads.shape
    rc = (3 - reads[:, ::-1]).astype(np.int64)
    fwd = np.where(ts[:, None] == 0, reads, rc)
    d_true = np.full(N, 1 << 20, np.int64)
    t0 = time.time()
    n_contigs = int(round((tg.max() + 1) / CONTIG_BP + 0.5))
    for ci in range(n_contigs):
        goff = ci * CONTIG_BP
        sel = np.nonzero((tg >= goff) & (tg < goff + CONTIG_BP))[0]
        if not sel.size:
            continue
        codes = make_contig(ci, CONTIG_BP).astype(np.int64)
        starts = (tg[sel] - goff).clip(0, CONTIG_BP - L)
        wins = codes[starts[:, None] + np.arange(L)[None, :]]
        d_true[sel] = (wins != fwd[sel]).sum(axis=1)
        print(f"contig {ci}: {sel.size} reads ({time.time()-t0:.0f}s)", flush=True)
        del codes
    assert (d_true <= 2).all(), "stream plants <=2 subs per read"
    np.save(parts / "reads_dtrue.npy", d_true)
    print(f"wrote {parts/'reads_dtrue.npy'} ({N} reads)")


if __name__ == "__main__":
    main()
