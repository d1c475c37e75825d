"""Benchmark driver — prints ONE JSON line with the headline metric.

Current headline: exact-match FM backward search + locate throughput
(reads/s/chip) on an E. coli-scale synthetic genome, 36bp reads
(BASELINE.json acceptance config 1).  Will widen to the full 100bp-vs-chr20
suffix-filter pipeline as milestones land (configs 3-4).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported relative to the first recorded run of this bench (self-baseline);
1.0 until a prior record exists in bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent
CACHE = ROOT / "bench_cache"
BASELINE_FILE = ROOT / "bench_baseline.json"

GENOME_LEN = 4_641_652  # E. coli K-12 scale
READ_LEN = 36
N_READS = 65_536
BATCH = 16_384


def build_or_load_index():
    from genome_weaver_align_tpu.index.build import FMIndexData, build_fm_index
    from genome_weaver_align_tpu.utils.bitvector import BitVector

    CACHE.mkdir(exist_ok=True)
    path = CACHE / f"ecoli_{GENOME_LEN}.npz"
    if path.exists():
        z = np.load(path)
        bits = np.unpackbits(z["mark_bits"])[: int(z["n"]) + 1].astype(bool)
        fm = FMIndexData(
            n=int(z["n"]),
            primary=int(z["primary"]),
            counts=z["counts"],
            C=z["C"],
            bwt_words=z["bwt_words"],
            occ_cp=z["occ_cp"],
            sample_rate=int(z["sample_rate"]),
            ssa_marks=BitVector(bits),
            ssa_values=z["ssa_values"],
            text_words=z["text_words"],
        )
        codes = np.load(CACHE / f"ecoli_{GENOME_LEN}_codes.npy")
        return codes, fm
    sys.stderr.write("bench: building index (one-time)...\n")
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
    t0 = time.time()
    fm = build_fm_index(codes, sample_rate=32)
    sys.stderr.write(f"bench: index built in {time.time()-t0:.1f}s\n")
    marks = np.zeros(fm.n + 1, dtype=bool)
    marks[:] = fm.ssa_marks.get(np.arange(fm.n + 1))
    np.savez(
        path,
        n=fm.n,
        primary=fm.primary,
        counts=fm.counts,
        C=fm.C,
        bwt_words=fm.bwt_words,
        occ_cp=fm.occ_cp,
        sample_rate=fm.sample_rate,
        mark_bits=np.packbits(marks),
        ssa_values=fm.ssa_values,
        text_words=fm.text_words,
    )
    np.save(CACHE / f"ecoli_{GENOME_LEN}_codes.npy", codes)
    return codes, fm


def simulate_read_batch(codes, n_reads, read_len, seed=1):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, codes.size - read_len, size=n_reads)
    idx = pos[:, None] + np.arange(read_len)[None, :]
    reads = codes[idx].astype(np.int32)
    rev = rng.integers(0, 2, size=n_reads).astype(bool)
    reads[rev] = (3 - reads[rev])[:, ::-1]
    return reads, np.full(n_reads, read_len, dtype=np.int32)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from genome_weaver_align_tpu.models import exact
    from genome_weaver_align_tpu.ops import rank

    codes, fm = build_or_load_index()
    dfm = rank.from_host(fm)

    reads, lengths = simulate_read_batch(codes, N_READS, READ_LEN)

    @jax.jit
    def step(fm, r, l):
        lo, hi = exact.exact_interval_search(fm, r, l)
        pos, valid = exact.locate_hits(fm, lo, hi, max_hits=1)
        return pos, valid, hi - lo

    # warmup / compile on one batch
    r0 = jnp.asarray(reads[:BATCH])
    l0 = jnp.asarray(lengths[:BATCH])
    pos, valid, w = step(dfm, r0, l0)
    pos.block_until_ready()

    n_batches = N_READS // BATCH
    t0 = time.time()
    outs = []
    for b in range(n_batches):
        r = jnp.asarray(reads[b * BATCH : (b + 1) * BATCH])
        l = jnp.asarray(lengths[b * BATCH : (b + 1) * BATCH])
        outs.append(step(dfm, r, l))
    jax.block_until_ready(outs)
    dt = time.time() - t0
    reads_per_s = N_READS / dt

    # sanity: virtually all reads must map (fwd strand reads map exactly;
    # rc reads map iff their revcomp occurs — search only fwd orientation here,
    # so count mapped among fwd-oriented half as correctness proxy)
    n_mapped = int(sum(int((np.asarray(v)).sum()) for (_, v, _) in outs))
    assert n_mapped >= N_READS * 0.45, f"only {n_mapped}/{N_READS} mapped"

    value = round(reads_per_s, 1)
    vs = 1.0
    if BASELINE_FILE.exists():
        rec = json.loads(BASELINE_FILE.read_text())
        if rec.get("value"):
            vs = round(value / rec["value"], 3)
    else:
        BASELINE_FILE.write_text(json.dumps({"metric": "exact_reads_per_s", "value": value}))

    print(
        json.dumps(
            {
                "metric": "exact-match FM search+locate reads/s/chip (36bp, E.coli-scale)",
                "value": value,
                "unit": "reads/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
