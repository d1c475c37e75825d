// Native CSR j-mer seed-table builder (index/seedtable.py's fast path).
//
// The Python builder sorts all n rolling j-mer values with np.argsort —
// O(n log n) comparison sort, ~80 s at 64 Mbp / ~267 s at 230 Mbp.  The
// table is a counting sort in disguise: bucket count histogram + one
// stable scatter by ascending position gives the identical CSR layout in
// two O(n) passes (measured ~100x faster).  Rolling j-mer values are
// recomputed per pass instead of materialised (8n bytes saved; the roll
// is 2 ops/char).
//
// Matches index/seedtable.py::build_seed_table exactly:
// - kv = big-endian base-4 value of codes[i:i+j]
// - offsets[b] = start of bucket b (exclusive cumsum of counts), 4^j+1 slots
// - positions grouped by kv, ascending position inside each bucket
//
// Parity: reference `genome-weaver-align` builds its k-mer/index tables
// host-side offline (SURVEY.md §3.1); this is the rebuild's offline-build
// hot path in native code per the framework's native-runtime stance.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" int gwa_seed_table(const uint8_t* codes, int64_t n, int32_t j,
                              int32_t* offsets, int32_t* positions) {
  if (j < 1 || 2 * j > 62 || n < j || n >= (int64_t(1) << 31)) return -1;
  const int64_t nk = n - j + 1;           // number of windows
  const int64_t B = int64_t(1) << (2 * j);  // 4^j buckets
  const uint64_t mask = (B - 1);

  // int32 counts: every count and cursor is bounded by nk < 2^31 (guarded
  // above); halves the transient footprint (~268 MB at j=13) and improves
  // cache behavior of the two O(n) passes (ADVICE r3)
  int32_t* counts = static_cast<int32_t*>(calloc(size_t(B), sizeof(int32_t)));
  if (!counts) return -2;

  // pass 1: histogram (rolling value: shift in 2 bits/char, mask to 2j bits)
  uint64_t kv = 0;
  for (int64_t i = 0; i < j - 1; ++i) kv = (kv << 2) | codes[i];
  for (int64_t i = 0; i < nk; ++i) {
    kv = ((kv << 2) | codes[i + j - 1]) & mask;
    ++counts[kv];
  }

  // exclusive cumsum -> offsets (int32 output; totals checked < 2^31 above)
  int64_t run = 0;
  for (int64_t b = 0; b < B; ++b) {
    offsets[b] = int32_t(run);
    int32_t c = counts[b];
    counts[b] = int32_t(run);  // becomes the scatter cursor
    run += c;
  }
  offsets[B] = int32_t(run);
  if (run != nk) { free(counts); return -3; }

  // pass 2: stable scatter — ascending i preserves position order per bucket
  kv = 0;
  for (int64_t i = 0; i < j - 1; ++i) kv = (kv << 2) | codes[i];
  for (int64_t i = 0; i < nk; ++i) {
    kv = ((kv << 2) | codes[i + j - 1]) & mask;
    positions[counts[kv]++] = int32_t(i);
  }
  free(counts);
  return 0;
}
