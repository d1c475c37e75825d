// Banded semi-global Gotoh (affine gaps) with traceback — native engine for
// ops/affine.py.  Bit-identical to the NumPy reference implementation
// (`affine_banded_batch`): same band convention (slot b at read row i is
// window column j = i + b - k), same score arithmetic on int32 with the
// un-clamped NEG sentinel, same tie preference (M > I > D) and first-argmax
// end slot, so the emitted (score, start, CIGAR, NM) are byte-identical.
//
// The reference project's scored SmithWatermanAligner seat (SURVEY.md §2
// #12); this file is the host-runtime fast path for the indel slow cohort —
// the Python/NumPy engine stays as the oracle and fallback.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {
constexpr int32_t NEG = -(1 << 20);

inline int32_t max2(int32_t a, int32_t b) { return a > b ? a : b; }
inline int32_t max3(int32_t a, int32_t b, int32_t c) { return max2(max2(a, b), c); }
}  // namespace

extern "C" {

// Returns 0 on success; 1 if any read's traceback failed (should be
// impossible for tables produced by the fill — indicates a bug, and the
// Python binding raises).
//
// reads:   (Q, L) int8 verify codes (>=4 never matches)
// lengths: (Q,)   int32
// windows: (Q, W) int8 verify codes
// score/start/nm: (Q,) int32 outputs
// cigars:  (Q, cigar_cap) char, NUL-terminated per row
int gwa_affine_banded_batch(
    const int8_t* reads, const int32_t* lengths, const int8_t* windows,
    int32_t Q, int32_t L, int32_t W, int32_t k,
    int32_t match, int32_t mismatch, int32_t gap_open, int32_t gap_ext,
    int32_t* score_out, int32_t* start_out, int32_t* nm_out,
    char* cigars, int32_t cigar_cap) {
  const int band = 4 * k + 1;
  int failed = 0;

#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    // per-thread scratch: all rows of H/E/F (traceback needs them), plus the
    // reverse-order op buffer
    std::vector<int32_t> Hs((size_t)(L + 1) * band);
    std::vector<int32_t> Es((size_t)(L + 1) * band);
    std::vector<int32_t> Fs((size_t)(L + 1) * band);
    std::vector<int8_t> ops(3 * (size_t)L + 2 * band + 2);

#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
    for (int32_t q = 0; q < Q; q++) {
      const int8_t* rd = reads + (size_t)q * L;
      const int8_t* wn = windows + (size_t)q * W;
      const int32_t len = lengths[q];
      int32_t* H = Hs.data();
      int32_t* E = Es.data();
      int32_t* F = Fs.data();

      // row 0: leading window free wherever column j = b - k is valid
      for (int b = 0; b < band; b++) {
        H[b] = (b - k >= 0) ? 0 : NEG;
        E[b] = NEG;
        F[b] = NEG;
      }
      // Two-pass row fill (bit-identical to the one-pass reference): the
      // E (in-row D-run) recurrence serializes the naive loop, so pass 1
      // computes the dependency-free diag/F half — auto-vectorizable over
      // the band (AVX2 int32 lanes; ~4x measured on 4 kb reads) — and
      // pass 2 is a cheap scalar lazy-E scan folding E into H.  Branches
      // (j >= 1 at the left band edge, b + 1 == band at the right) are
      // peeled out of the hot middle so the compiler sees a straight-line
      // kernel of shifted contiguous loads.
      for (int32_t i = 1; i <= len; i++) {
        const int32_t* pH = H + (size_t)(i - 1) * band;
        const int32_t* pF = F + (size_t)(i - 1) * band;
        int32_t* cH = H + (size_t)i * band;
        int32_t* cE = E + (size_t)i * band;
        int32_t* cF = F + (size_t)i * band;
        const int8_t rc = rd[i - 1];
        const int32_t blo = k - i > 0 ? k - i : 0;  // first slot with j >= 0
        const int32_t bhiw = W - i + k;             // last slot with j <= W
        const int32_t bhi = bhiw < band - 1 ? bhiw : band - 1;
        for (int b = 0; b < blo && b < band; b++) {
          cH[b] = NEG; cE[b] = NEG; cF[b] = NEG;
        }
        for (int b = bhi + 1; b < band; b++) {
          cH[b] = NEG; cE[b] = NEG; cF[b] = NEG;
        }
        if (blo > bhi) continue;  // empty valid range: row is all NEG
        // ---- pass 1: diag + F (no in-row dependency) ----
        const int32_t b0 = (k - i + 1 > blo) ? (k - i + 1) : blo;  // j >= 1
        for (int b = blo; b < b0 && b <= bhi; b++) {  // j == 0 slot: no diag
          const int32_t upH = (b + 1 < band) ? pH[b + 1] : NEG;
          const int32_t upF = (b + 1 < band) ? pF[b + 1] : NEG;
          const int32_t f = max2(upH - gap_open, upF - gap_ext);
          cF[b] = f;
          cH[b] = f;
        }
        const int32_t bmid = bhi < band - 2 ? bhi : band - 2;  // b+1 in range
        const int32_t base = i - k - 1;  // wn index of slot b is base + b
        for (int b = b0; b <= bmid; b++) {
          const int32_t f = max2(pH[b + 1] - gap_open, pF[b + 1] - gap_ext);
          const int32_t s = (wn[base + b] == rc && rc < 4) ? match : -mismatch;
          const int32_t diag = pH[b] + s;
          cF[b] = f;
          cH[b] = max2(diag, f);
        }
        if (bhi == band - 1 && b0 <= bhi) {  // right edge: no up-slot
          const int b = bhi;
          const int32_t s = (wn[base + b] == rc && rc < 4) ? match : -mismatch;
          const int32_t diag = pH[b] + s;
          const int32_t f = max2(NEG - gap_open, NEG - gap_ext);
          cF[b] = f;
          cH[b] = max2(diag, f);
        }
        // ---- pass 2: lazy-E scan (cheap serial fold) ----
        int32_t run_h = NEG, run_e = NEG;
        for (int b = blo; b <= bhi; b++) {
          const int32_t e = max2(run_h - gap_open, run_e - gap_ext);
          const int32_t h = max2(cH[b], e);
          cE[b] = e;
          cH[b] = h;
          run_h = h;
          run_e = e;
        }
      }
      // rows past len are never read back (traceback starts at row len)

      // end slot: first argmax over valid end columns
      const int32_t* lH = H + (size_t)len * band;
      int32_t best = NEG - 1, bb = 0;
      for (int b = 0; b < band; b++) {
        const int32_t j = len + b - k;
        const int32_t v = (j >= 0 && j <= W) ? lH[b] : NEG;
        if (v > best) {
          best = v;
          bb = b;
        }
      }
      score_out[q] = best;

      // traceback (state 0=H, 1=E/D-run, 2=F/I-run); ops reverse order
      int32_t i = len, b = bb;
      int state = 0;
      int nops = 0;
      int32_t nm = 0;
      bool ok = true;
      while (i > 0 || state != 0) {
        if (state == 0) {
          const int32_t j = i + b - k;
          const int32_t curH = H[(size_t)i * band + b];
          bool diag_ok = false;
          if (i >= 1 && j >= 1) {
            const int8_t wc = wn[j - 1 >= W ? W - 1 : j - 1];
            const int8_t rc = rd[i - 1];
            const bool is_m = (wc == rc && rc < 4);
            const int32_t s = is_m ? match : -mismatch;
            if (curH == H[(size_t)(i - 1) * band + b] + s) {
              diag_ok = true;
              ops[nops++] = 1;  // M
              if (!is_m) nm++;
              i--;
              continue;
            }
          }
          (void)diag_ok;
          if (curH == F[(size_t)i * band + b]) {
            state = 2;  // open an I-run (no op emitted on the transition)
          } else if (curH == E[(size_t)i * band + b]) {
            state = 1;  // open a D-run
          } else {
            ok = false;
            break;
          }
        } else if (state == 1) {  // E: window gap (D)
          ops[nops++] = 3;
          nm++;
          const bool e_open =
              b >= 1 &&
              E[(size_t)i * band + b] == H[(size_t)i * band + (b - 1)] - gap_open;
          b -= 1;
          if (e_open) state = 0;
          if (b < 0) {
            ok = false;
            break;
          }
        } else {  // F: read gap (I)
          ops[nops++] = 2;
          nm++;
          const bool f_open =
              i >= 1 && b + 1 < band &&
              F[(size_t)i * band + b] ==
                  H[(size_t)(i - 1) * band + (b + 1)] - gap_open;
          i -= 1;
          b += 1;
          if (f_open) state = 0;
          if (i < 0 || b >= band) {
            ok = false;
            break;
          }
        }
        if (nops >= (int)ops.size()) {
          ok = false;
          break;
        }
      }
      if (!ok) {
#ifdef _OPENMP
#pragma omp atomic write
#endif
        failed = 1;
        cigars[(size_t)q * cigar_cap] = '\0';
        start_out[q] = 0;
        nm_out[q] = 0;
        continue;
      }
      start_out[q] = i + b - k;
      nm_out[q] = nm;

      // forward-order run-length CIGAR straight into the output row
      char* out = cigars + (size_t)q * cigar_cap;
      int pos = 0;
      static const char sym[4] = {'?', 'M', 'I', 'D'};
      int t = nops - 1;
      while (t >= 0) {
        const int8_t op = ops[t];
        int run = 0;
        while (t >= 0 && ops[t] == op) {
          run++;
          t--;
        }
        pos += snprintf(out + pos, (size_t)(cigar_cap - pos), "%d%c", run,
                        sym[(int)op]);
        if (pos >= cigar_cap - 1) break;  // cap sized by caller; never hit
      }
      out[pos < cigar_cap ? pos : cigar_cap - 1] = '\0';
    }
  }
  return failed;
}

}  // extern "C"
