// Native sketching core: rolling ntHash + one-permutation b-bit MinHash.
//
// The host-side counterpart of pp-sketchlib's C++ sketcher (the reference's
// external compute core; algorithm lineage per PopPUNK/citation.py:31-43).
// Semantics are bit-identical to the numpy implementation in
// poppunk_tpu/sketch/{nthash,minhash}.py — the python test-suite asserts
// equality — but runs the scalar rolling recurrence at C speed with OpenMP
// across k-mer lengths.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC -o libsketch_core.so sketch_core.cpp
// Called from poppunk_tpu/sketch/native.py via ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint64_t SEED[5] = {
    0x3C8BFBB395C60474ULL,  // A
    0x3193C18562A02B4CULL,  // C
    0x20323ED082572324ULL,  // G
    0x295549F54BE24456ULL,  // T
    0ULL,                   // invalid
};
// complement permutation A<->T, C<->G
constexpr int COMP[5] = {3, 2, 1, 0, 4};
constexpr uint64_t SIGN_MOD = (1ULL << 61) - 1;
constexpr uint64_t EMPTY_BIN = 0xFFFFFFFFFFFFFFFFULL;
constexpr int INVALID_BASE = 4;

inline uint64_t rol64(uint64_t x, int s) {
  s &= 63;
  return s ? (x << s) | (x >> (64 - s)) : x;
}
inline uint64_t ror64(uint64_t x, int s) {
  s &= 63;
  return s ? (x >> s) | (x << (64 - s)) : x;
}

inline uint64_t mix64(uint64_t z) {
  z += 0x9E3779B97F4A7C15ULL;
  z ^= z >> 30;
  z *= 0xBF58476D1CE4E5B9ULL;
  z ^= z >> 27;
  z *= 0x94D049BB133111EBULL;
  z ^= z >> 31;
  return z;
}

// h % (2^61 - 1) without the divider: fold the top 3 bits down (exact —
// h = a*2^61 + b with a <= 7, so a + b < 2*(2^61-1): one subtract).
inline uint64_t mod_mersenne61(uint64_t h) {
  uint64_t s = (h & SIGN_MOD) + (h >> 61);
  return s >= SIGN_MOD ? s - SIGN_MOD : s;
}

// Exact unsigned division by a runtime constant via multiply-high + <= 2
// fixup steps (m = floor((2^64-1)/d) underestimates 2^64/d by < 1, plus
// < 1 from the floor: quotient error <= 2). The hardware 64-bit divide
// this replaces is ~25-40 cycles PER K-MER in the binning hot loop.
struct FastDiv {
  uint64_t d, m;
  explicit FastDiv(uint64_t d_) : d(d_), m(~0ULL / d_) {}
  // branchless fixups (cmov): the first fires on ~half the inputs, a
  // mispredicting branch there costs more than the divide it replaced
  inline uint64_t div(uint64_t x) const {
    const uint64_t dd = d;
    uint64_t q = (uint64_t)(((__uint128_t)x * m) >> 64);
    uint64_t r = x - q * dd;
    uint64_t f = r >= dd;
    q += f;
    r -= f ? dd : 0;
    q += r >= dd;
    return q;
  }
};

// Canonical (or forward-only) ntHash over all valid windows; min sign per
// bin (one-permutation MinHash binning fused into the scan). Does NOT
// reset signs — callers may accumulate several scans (codon phases) into
// one bin array.
void scan_and_bin(const uint8_t *codes, int64_t n, int k, bool use_rc,
                  const FastDiv &bindiv, uint64_t *signs) {
  if (n < k) return;
  // per-scan rolled seed tables: the rolling update needs
  // rol64(SEED[out], k) and rol64(SEED[COMP[in]], k - 1) — k is fixed
  // here, so both are 5-entry lookups instead of per-step rotates
  uint64_t seed_k[5], seed_rc[5];
  for (int b = 0; b < 5; ++b) {
    seed_k[b] = rol64(SEED[b], k);
    seed_rc[b] = rol64(SEED[COMP[b]], k - 1);
  }
  // local copy: bindiv is reached through a reference that may alias the
  // signs[] stores, forcing per-iteration reloads otherwise
  const FastDiv bd = bindiv;
  int64_t j = 0;
  while (j + k <= n) {
    // ensure window [j, j+k) is fully valid; jump past invalid bases
    bool restart = false;
    for (int64_t i = j + k - 1; i >= j; --i) {
      if (codes[i] == INVALID_BASE) {
        j = i + 1;
        restart = true;
        break;
      }
    }
    if (restart) continue;

    // initial hashes for window at j
    uint64_t fh = 0, rh = 0;
    for (int i = 0; i < k; ++i) {
      fh ^= rol64(SEED[codes[j + i]], k - 1 - i);
      if (use_rc) rh ^= rol64(SEED[COMP[codes[j + i]]], i);
    }

    while (true) {
      uint64_t h = (use_rc && rh < fh) ? rh : fh;
      uint64_t sign = mod_mersenne61(h);
      uint64_t bin = bd.div(sign);
      if (sign < signs[bin]) signs[bin] = sign;

      if (j + k >= n) { j = n; break; }
      uint8_t in = codes[j + k];
      if (in == INVALID_BASE) { j = j + k + 1; break; }
      uint8_t out = codes[j];
      fh = rol64(fh, 1) ^ seed_k[out] ^ SEED[in];
      if (use_rc)
        rh = ror64(rh ^ SEED[COMP[out]], 1) ^ seed_rc[in];
      ++j;
    }
  }
}

// All canonical (or forward) hashes of valid windows, same scan as
// bin_signs_for_k — used by the read path, where k-mers must be counted
// before binning.
void collect_hashes_for_k(const uint8_t *codes, int64_t n, int k, bool use_rc,
                          std::vector<uint64_t> &out) {
  out.clear();
  if (n < k) return;
  int64_t j = 0;
  while (j + k <= n) {
    bool restart = false;
    for (int64_t i = j + k - 1; i >= j; --i) {
      if (codes[i] == INVALID_BASE) {
        j = i + 1;
        restart = true;
        break;
      }
    }
    if (restart) continue;

    uint64_t fh = 0, rh = 0;
    for (int i = 0; i < k; ++i) {
      fh ^= rol64(SEED[codes[j + i]], k - 1 - i);
      if (use_rc) rh ^= rol64(SEED[COMP[codes[j + i]]], i);
    }

    while (true) {
      out.push_back((use_rc && rh < fh) ? rh : fh);
      if (j + k >= n) { j = n; break; }
      uint8_t in = codes[j + k];
      if (in == INVALID_BASE) { j = j + k + 1; break; }
      uint8_t out_base = codes[j];
      fh = rol64(fh, 1) ^ rol64(SEED[out_base], k) ^ SEED[in];
      if (use_rc)
        rh = ror64(rh ^ SEED[COMP[out_base]], 1) ^
             rol64(SEED[COMP[in]], k - 1);
      ++j;
    }
  }
}

inline void bin_one(uint64_t h, const FastDiv &bindiv, uint64_t *signs) {
  uint64_t sign = mod_mersenne61(h);
  uint64_t bin = bindiv.div(sign);
  if (sign < signs[bin]) signs[bin] = sign;
}

#if defined(__AVX512F__) && defined(__AVX512CD__)
#define SKETCH_SIMD 1
#include <immintrin.h>

// --- AVX-512 scan: 8 segment lanes over one sequence -----------------
//
// The rolling ntHash recurrence TELESCOPES (each base's contribution is
// rolled out exactly k steps later), so unlike the scalar scan no
// restart is needed at invalid bases: lanes roll straight through and a
// per-window validity mask (precomputed run lengths) drops windows that
// contain an invalid base. All-integer ops — BIT-exact vs the scalar
// scan (asserted in the fixture/oracle tests and a fuzz main during
// development). Measured 1.5x the scalar scan at production geometry.
//
// The interleaved context (codes + valid-run transposed to [t, lane]) is
// built once per sequence and shared across all k (its accesses are then
// contiguous 8-byte loads instead of gathers).

struct InterleavedSeq {
  std::vector<uint8_t> il;    // [tl, 8] codes, lane-major per step
  std::vector<int32_t> irun;  // [tl, 8] valid-run length at each start
  int64_t seg = 0;
};

void build_interleaved(const uint8_t *codes, int64_t n, int kmax,
                       InterleavedSeq &cx) {
  cx.seg = (n - 1 + 7) / 8;
  int64_t tl = cx.seg + kmax + 1;
  cx.il.assign((size_t)tl * 8, INVALID_BASE);
  std::vector<int32_t> run(n + 1, 0);
  for (int64_t i = n - 1; i >= 0; --i)
    run[i] = codes[i] == INVALID_BASE ? 0 : run[i + 1] + 1;
  cx.irun.assign((size_t)tl * 8, 0);
  for (int l = 0; l < 8; ++l) {
    int64_t base = (int64_t)l * cx.seg;
    int64_t len = std::min<int64_t>(tl, n - base);
    for (int64_t t = 0; t < len; ++t) {
      cx.il[(size_t)t * 8 + l] = codes[base + t];
      cx.irun[(size_t)t * 8 + l] = run[base + t];
    }
  }
}

// 64x64 -> high 64 from 32-bit partial products (no vpmulhuq exists)
static inline __m512i mulhi_epu64(__m512i a, __m512i b) {
  const __m512i lo32 = _mm512_set1_epi64(0xFFFFFFFFULL);
  __m512i ll = _mm512_mul_epu32(a, b);
  __m512i lh = _mm512_mul_epu32(a, _mm512_srli_epi64(b, 32));
  __m512i hl = _mm512_mul_epu32(_mm512_srli_epi64(a, 32), b);
  __m512i hh = _mm512_mul_epu32(_mm512_srli_epi64(a, 32),
                                _mm512_srli_epi64(b, 32));
  __m512i cross = _mm512_add_epi64(_mm512_srli_epi64(ll, 32),
                                   _mm512_and_si512(lh, lo32));
  cross = _mm512_add_epi64(cross, _mm512_and_si512(hl, lo32));
  __m512i hi = _mm512_add_epi64(
      hh, _mm512_add_epi64(_mm512_srli_epi64(lh, 32),
                           _mm512_srli_epi64(hl, 32)));
  return _mm512_add_epi64(hi, _mm512_srli_epi64(cross, 32));
}

void scan_and_bin_simd(const InterleavedSeq &cx, int64_t n, int k,
                       bool use_rc, const FastDiv &bindiv,
                       uint64_t *signs) {
  if (n < k) return;
  int64_t n_win = n - k + 1;  // call sites route n_win < 64 to scalar
  int64_t seg = cx.seg;
  const uint8_t *il = cx.il.data();
  const int32_t *irun = cx.irun.data();
  const __m512i lo61 = _mm512_set1_epi64(SIGN_MOD);
  alignas(64) uint64_t tf[8] = {0}, tfk[8] = {0}, tr[8] = {0},
                       trk[8] = {0};
  for (int b = 0; b < 5; ++b) {
    tf[b] = SEED[b];
    tfk[b] = rol64(SEED[b], k);
    tr[b] = SEED[COMP[b]];
    trk[b] = rol64(SEED[COMP[b]], k - 1);
  }
  __m512i vf = _mm512_load_si512(tf), vfk = _mm512_load_si512(tfk);
  __m512i vr = _mm512_load_si512(tr), vrk = _mm512_load_si512(trk);
  __m512i md = _mm512_set1_epi64(bindiv.d);
  __m512i mm = _mm512_set1_epi64(bindiv.m);
  __m256i vk = _mm256_set1_epi32(k);
  __m512i one = _mm512_set1_epi64(1);
  alignas(64) uint64_t fh0[8], rh0[8];
  for (int l = 0; l < 8; ++l) {
    uint64_t fh = 0, rh = 0;
    for (int i = 0; i < k; ++i) {
      uint8_t c = il[(size_t)i * 8 + l];
      fh ^= rol64(SEED[c], k - 1 - i);
      rh ^= rol64(SEED[COMP[c]], i);
    }
    fh0[l] = fh;
    rh0[l] = rh;
  }
  __m512i fh = _mm512_load_si512(fh0), rh = _mm512_load_si512(rh0);
  for (int64_t t = 0;; ++t) {
    __m512i h = use_rc ? _mm512_min_epu64(fh, rh) : fh;
    // mersenne-61 fold, then multiply-high bin split (same fixup
    // discipline as FastDiv::div)
    __m512i s = _mm512_add_epi64(_mm512_and_si512(h, lo61),
                                 _mm512_srli_epi64(h, 61));
    s = _mm512_mask_sub_epi64(s, _mm512_cmpge_epu64_mask(s, lo61), s,
                              lo61);
    __m512i q = mulhi_epu64(s, mm);
    __m512i r = _mm512_sub_epi64(s, _mm512_mullox_epi64(q, md));
    __mmask8 f1 = _mm512_cmpge_epu64_mask(r, md);
    q = _mm512_mask_add_epi64(q, f1, q, one);
    r = _mm512_mask_sub_epi64(r, f1, r, md);
    q = _mm512_mask_add_epi64(q, _mm512_cmpge_epu64_mask(r, md), q, one);
    __m256i rv = _mm256_loadu_si256((const __m256i *)&irun[(size_t)t * 8]);
    __mmask8 valid = _mm256_cmpge_epi32_mask(rv, vk);
    if (valid) {
      __m512i cur = _mm512_mask_i64gather_epi64(_mm512_setzero_si512(),
                                                valid, q, signs, 8);
      __mmask8 win = _mm512_mask_cmplt_epu64_mask(valid, s, cur);
      if (win) {
        // duplicate bins within the vector need the min of their signs;
        // rare (8 draws over ~10k bins) -> scalar fallback then
        __m512i conf = _mm512_maskz_conflict_epi64(win, q);
        if (!_mm512_mask_test_epi64_mask(win, conf,
                                         _mm512_set1_epi64(-1))) {
          _mm512_mask_i64scatter_epi64(signs, win, q, s, 8);
        } else {
          alignas(64) uint64_t sv[8], bv[8];
          _mm512_store_si512(sv, s);
          _mm512_store_si512(bv, q);
          for (int l = 0; l < 8; ++l)
            if ((win >> l) & 1)
              if (sv[l] < signs[bv[l]]) signs[bv[l]] = sv[l];
        }
      }
    }
    if (t + 1 >= seg || t + 1 >= n_win) break;
    __m512i outb = _mm512_cvtepu8_epi64(
        _mm_loadl_epi64((const __m128i *)&il[(size_t)t * 8]));
    __m512i inb = _mm512_cvtepu8_epi64(
        _mm_loadl_epi64((const __m128i *)&il[(size_t)(t + k) * 8]));
    fh = _mm512_xor_si512(
        _mm512_rol_epi64(fh, 1),
        _mm512_xor_si512(_mm512_permutexvar_epi64(outb, vfk),
                         _mm512_permutexvar_epi64(inb, vf)));
    if (use_rc)
      rh = _mm512_xor_si512(
          _mm512_ror_epi64(
              _mm512_xor_si512(rh, _mm512_permutexvar_epi64(outb, vr)),
              1),
          _mm512_permutexvar_epi64(inb, vrk));
  }
}

// SIMD twin of collect_hashes_for_k over the shared interleaved context
// (the read path: hashes must be counted before binning). Appends the
// canonical hash of every valid window to `out` — lane-major order, a
// permutation of the scalar position order; all consumers are
// multiset-blind (count-min and exact filtering are order-independent).
// [t0, t1) restricts to a per-lane step range (t1 < 0 = to the end):
// the exact read path streams cache-sized chunks through the candidate
// filter instead of materialising the whole per-(genome, k) hash
// vector (~2 GB of DRAM write+read per 10x-coverage genome).
void scan_and_collect_simd(const InterleavedSeq &cx, int64_t n, int k,
                           bool use_rc, std::vector<uint64_t> &out,
                           int64_t t0 = 0, int64_t t1 = -1) {
  if (n < k) return;
  int64_t n_win = n - k + 1;  // call sites route n_win < 64 to scalar
  int64_t seg = cx.seg;
  int64_t t_end = std::min(seg, n_win);  // loop covers [0, t_end)
  if (t1 < 0 || t1 > t_end) t1 = t_end;
  if (t0 >= t1) return;
  const uint8_t *il = cx.il.data();
  const int32_t *irun = cx.irun.data();
  size_t base = out.size();
  out.resize(base + (size_t)(t1 - t0) * 8 + 8);
  uint64_t *dst = out.data() + base;
  alignas(64) uint64_t tf[8] = {0}, tfk[8] = {0}, tr[8] = {0},
                       trk[8] = {0};
  for (int b = 0; b < 5; ++b) {
    tf[b] = SEED[b];
    tfk[b] = rol64(SEED[b], k);
    tr[b] = SEED[COMP[b]];
    trk[b] = rol64(SEED[COMP[b]], k - 1);
  }
  __m512i vf = _mm512_load_si512(tf), vfk = _mm512_load_si512(tfk);
  __m512i vr = _mm512_load_si512(tr), vrk = _mm512_load_si512(trk);
  __m256i vk = _mm256_set1_epi32(k);
  alignas(64) uint64_t fh0[8], rh0[8];
  for (int l = 0; l < 8; ++l) {
    uint64_t fh = 0, rh = 0;
    for (int i = 0; i < k; ++i) {
      uint8_t c = il[(size_t)(t0 + i) * 8 + l];
      fh ^= rol64(SEED[c], k - 1 - i);
      rh ^= rol64(SEED[COMP[c]], i);
    }
    fh0[l] = fh;
    rh0[l] = rh;
  }
  __m512i fh = _mm512_load_si512(fh0), rh = _mm512_load_si512(rh0);
  for (int64_t t = t0;; ++t) {
    __m512i h = use_rc ? _mm512_min_epu64(fh, rh) : fh;
    __m256i rv = _mm256_loadu_si256((const __m256i *)&irun[(size_t)t * 8]);
    __mmask8 valid = _mm256_cmpge_epi32_mask(rv, vk);
    if (valid) {
      _mm512_mask_compressstoreu_epi64(dst, valid, h);
      dst += __builtin_popcount((unsigned)valid);
    }
    if (t + 1 >= t1) break;
    __m512i outb = _mm512_cvtepu8_epi64(
        _mm_loadl_epi64((const __m128i *)&il[(size_t)t * 8]));
    __m512i inb = _mm512_cvtepu8_epi64(
        _mm_loadl_epi64((const __m128i *)&il[(size_t)(t + k) * 8]));
    fh = _mm512_xor_si512(
        _mm512_rol_epi64(fh, 1),
        _mm512_xor_si512(_mm512_permutexvar_epi64(outb, vfk),
                         _mm512_permutexvar_epi64(inb, vf)));
    if (use_rc)
      rh = _mm512_xor_si512(
          _mm512_ror_epi64(
              _mm512_xor_si512(rh, _mm512_permutexvar_epi64(outb, vr)),
              1),
          _mm512_permutexvar_epi64(inb, vrk));
  }
  out.resize((size_t)(dst - out.data()));
}
#endif  // SKETCH_SIMD

// Count-min geometry matching sketch/reader.py CountMin (width_bits=22,
// 4 rows, salts (row+1)*golden; idx = (h * salt) >> 33 & mask; uint16
// counters with numpy's wrap-on-overflow semantics; estimates read after
// all insertions).
constexpr int CM_WIDTH_BITS = 22;
constexpr int CM_HASHES = 4;
constexpr uint64_t CM_MASK = (1ULL << CM_WIDTH_BITS) - 1;

// Candidate-verified exact filter — bit-identical results to a
// sort-the-whole-vector exact counter (and to reader.py
// filter_read_kmers exact=True, the pinned oracle): a hash can only
// change its bin's final minimum if its sign beats the bin's current
// committed minimum, and since signs[] is non-increasing over the
// stream, any eventual winner qualifies at its FIRST occurrence — so
// counting only candidates still sees every occurrence of every
// winner, and committing at count >= min_count reproduces the exact
// filter's kept set restricted to hashes that can matter. Cost: one
// signs[] lookup per hash (80 KB, cache-resident) plus an
// open-addressing count map touched only on candidate occurrences —
// instead of the sort (or count-min's 4 DRAM-latency row touches) over
// all ~20M hashes per (genome, k) that capped reads at ~0.8 genomes/s
// pooled. Stateful (add() streams chunks): decisions are order-robust,
// so chunked and whole-vector runs are bit-identical.
struct CandidateExactFilter {
  int min_count;
  const FastDiv &bindiv;
  uint64_t *signs;
  std::vector<uint64_t> keys;
  std::vector<uint32_t> cnt;
  size_t used = 0, cap, mask;

  CandidateExactFilter(int mc, const FastDiv &bd, uint64_t *sg)
      : min_count(mc), bindiv(bd), signs(sg), cap(1 << 12) {
    keys.assign(cap, 0);
    cnt.assign(cap, 0);
    mask = cap - 1;
  }

  void grow() {
    size_t ncap = cap * 2, nmask = ncap - 1;
    std::vector<uint64_t> nk(ncap, 0);
    std::vector<uint32_t> nc(ncap, 0);
    for (size_t s = 0; s < cap; ++s) {
      if (!cnt[s]) continue;
      size_t p = (size_t)mix64(keys[s]) & nmask;
      while (nc[p]) p = (p + 1) & nmask;
      nk[p] = keys[s];
      nc[p] = cnt[s];
    }
    keys.swap(nk);
    cnt.swap(nc);
    cap = ncap;
    mask = nmask;
  }

  void add(const uint64_t *hashes, size_t m) {
    if (min_count <= 1) {
      for (size_t i = 0; i < m; ++i) bin_one(hashes[i], bindiv, signs);
      return;
    }
    for (size_t i = 0; i < m; ++i) {
      uint64_t h = hashes[i];
      uint64_t sign = mod_mersenne61(h);
      uint64_t bin = bindiv.div(sign);
      if (sign >= signs[bin]) continue;  // can never win: skip forever
      if ((used + 1) * 4 > cap * 3) grow();
      size_t p = (size_t)mix64(h) & mask;
      while (cnt[p] && keys[p] != h) p = (p + 1) & mask;
      if (!cnt[p]) {
        keys[p] = h;
        ++used;
      }
      if (++cnt[p] >= (uint32_t)min_count && sign < signs[bin])
        signs[bin] = sign;
    }
  }
};

// Filter read k-mer hashes by multiplicity then bin the survivors —
// multiset-identical to reader.py filter_read_kmers (both filter modes
// keep or drop whole unique hashes, and min-per-bin is order-blind).
void bin_filtered_hashes(std::vector<uint64_t> &hashes, int min_count,
                         bool exact, const FastDiv &bindiv,
                         uint64_t *signs) {
  if (hashes.empty()) return;
  if (exact) {
    CandidateExactFilter f(min_count, bindiv, signs);
    f.add(hashes.data(), hashes.size());
    return;
  }
  // Saturating packed counters (reader.py countmin_cap twin): the
  // filter only distinguishes counts below min_count from at/above it,
  // so fields saturate at the next pow2-1 >= min_count. At the default
  // min_count <= 3 the whole 4-row table is 2-bit fields in 4 MB —
  // cache-resident instead of the 32 MB u16 table whose random touches
  // were DRAM-latency bound (0.57 s/20M hashes; now ~4x faster).
  // est >= min_count decisions are identical to unbounded counters.
  int cap_bits = 2;
  while (cap_bits < 32 && (1LL << cap_bits) - 1 < (long long)min_count)
    cap_bits *= 2;
  const uint64_t cap = (cap_bits >= 32) ? 0xFFFFFFFFULL
                                        : ((1ULL << cap_bits) - 1);
  const int fpw_shift = 6 - __builtin_ctz(cap_bits);  // log2(64/cap_bits)
  const uint64_t fpw_mask = (1ULL << fpw_shift) - 1;
  const size_t words_per_row = ((size_t)1 << CM_WIDTH_BITS) >> fpw_shift;
  std::vector<uint64_t> table(words_per_row * CM_HASHES, 0);
  constexpr size_t PF = 16;
  for (int row = 0; row < CM_HASHES; ++row) {
    const uint64_t salt = (uint64_t)(row + 1) * 0x9E3779B97F4A7C15ULL;
    uint64_t *t = table.data() + (size_t)row * words_per_row;
    const size_t nh = hashes.size();
    for (size_t i = 0; i < nh; ++i) {
      if (i + PF < nh)
        __builtin_prefetch(
            &t[((hashes[i + PF] * salt) >> 33 & CM_MASK) >> fpw_shift], 1);
      uint64_t idx = (hashes[i] * salt) >> 33 & CM_MASK;
      uint64_t w = idx >> fpw_shift;
      int sh = (int)(idx & fpw_mask) * cap_bits;
      if (((t[w] >> sh) & cap) < cap) t[w] += 1ULL << sh;
    }
  }
  for (uint64_t h : hashes) {
    // a hash whose sign cannot lower its bin's current minimum can be
    // skipped before the 4 random table reads: signs[] only ever
    // decreases, so the final state is identical (bit-exact) — this
    // prunes the estimate lookups to the few candidate minima
    uint64_t sign = mod_mersenne61(h);
    uint64_t bin = bindiv.div(sign);
    if (sign >= signs[bin]) continue;
    uint64_t est = ~0ULL;
    for (int row = 0; row < CM_HASHES; ++row) {
      const uint64_t salt = (uint64_t)(row + 1) * 0x9E3779B97F4A7C15ULL;
      const uint64_t *t = table.data() + (size_t)row * words_per_row;
      uint64_t idx = (h * salt) >> 33 & CM_MASK;
      uint64_t c = (t[idx >> fpw_shift]
                    >> ((int)(idx & fpw_mask) * cap_bits)) & cap;
      if (c < est) est = c;
    }
    if (est >= (uint64_t)min_count) {
      signs[bin] = sign;
    }
  }
}

// Optimal densification, bit-identical to minhash.py densify(): all empty
// bins are probed in lockstep rounds; donors reference the ORIGINAL
// non-empty mask and original values.
int densify(uint64_t *signs, int64_t nbins) {
  std::vector<int64_t> empty_idx;
  for (int64_t b = 0; b < nbins; ++b)
    if (signs[b] == EMPTY_BIN) empty_idx.push_back(b);
  if (empty_idx.empty()) return 0;
  if ((int64_t)empty_idx.size() == nbins) return -1;  // nothing to sketch

  std::vector<uint8_t> nonempty(nbins);
  for (int64_t b = 0; b < nbins; ++b)
    nonempty[b] = signs[b] != EMPTY_BIN;

  std::vector<int64_t> donor(empty_idx.size(), -1);
  std::vector<size_t> unfilled(empty_idx.size());
  for (size_t i = 0; i < empty_idx.size(); ++i) unfilled[i] = i;

  uint64_t attempt = 0;
  while (!unfilled.empty()) {
    std::vector<size_t> still;
    uint64_t mixed_attempt = mix64(attempt);
    for (size_t u : unfilled) {
      uint64_t probe =
          mix64((uint64_t)empty_idx[u] ^ mixed_attempt) % (uint64_t)nbins;
      if (nonempty[probe]) {
        donor[u] = (int64_t)probe;
      } else {
        still.push_back(u);
      }
    }
    unfilled.swap(still);
    ++attempt;
    if (attempt > 100000) return -2;
  }
  for (size_t i = 0; i < empty_idx.size(); ++i)
    signs[empty_idx[i]] = signs[donor[i]];
  return 1;
}

// Pack low bbits of each bin sign into interleaved bit planes
// (usigs[w*bbits + p] bit m = bit p of signs[w*64 + m]).
void pack_bbits(const uint64_t *signs, int sketchsize64, int bbits,
                uint64_t *usigs) {
  for (int w = 0; w < sketchsize64; ++w) {
    for (int p = 0; p < bbits; ++p) {
      uint64_t word = 0;
      for (int m = 0; m < 64; ++m) {
        word |= ((signs[(int64_t)w * 64 + m] >> p) & 1ULL) << m;
      }
      usigs[(int64_t)w * bbits + p] = word;
    }
  }
}

}  // namespace

extern "C" {

// Sketch one encoded sequence at every k in klist.
// codes: uint8[n] with A=0,C=1,G=2,T=3,invalid=4 (contig separators too).
// min_count > 1 enables read k-mer filtering (exact_filter selects the
// exact counter over count-min), matching sketch/reader.py.
// codon_phased hashes every third base over the 3 phase offsets
// (spaced-seed X--X--X.., matching minhash._phase_hashes).
// usigs_out: uint64[n_k * sketchsize64 * bbits], per-k blocks in klist
// order. Returns: 1 if any k was densified, 0 if none, <0 on error
// (-1: a k had no valid k-mers).
int sketch_sequence_c(const uint8_t *codes, int64_t n, const int32_t *klist,
                      int n_k, int sketchsize64, int bbits, int use_rc,
                      int min_count, int exact_filter, int codon_phased,
                      int n_threads, uint64_t *usigs_out) {
  const int64_t nbins = (int64_t)sketchsize64 * 64;
  const FastDiv bindiv((SIGN_MOD + (uint64_t)nbins - 1) / (uint64_t)nbins);
  int densified_any = 0;
  int error = 0;

  // phase subsequences (every third base), shared across k
  std::vector<std::vector<uint8_t>> phases;
  if (codon_phased) {
    phases.resize(3);
    for (int ph = 0; ph < 3; ++ph) {
      for (int64_t i = ph; i < n; i += 3) phases[ph].push_back(codes[i]);
    }
  }

  int kmax = 0;
  for (int ki = 0; ki < n_k; ++ki) kmax = std::max(kmax, (int)klist[ki]);
#ifdef SKETCH_SIMD
  // interleaved contexts shared read-only across the k loop (both the
  // assembly scan-and-bin path and the read collect-count-bin path)
  std::vector<InterleavedSeq> simd_cx;
  if (codon_phased) {
    simd_cx.resize(3);
    for (int ph = 0; ph < 3; ++ph)
      if ((int64_t)phases[ph].size() - kmax + 1 >= 64)
        build_interleaved(phases[ph].data(),
                          (int64_t)phases[ph].size(), kmax,
                          simd_cx[ph]);
  } else if (n - kmax + 1 >= 64) {
    simd_cx.resize(1);
    build_interleaved(codes, n, kmax, simd_cx[0]);
  }
#endif

#pragma omp parallel for schedule(dynamic) num_threads(n_threads)
  for (int ki = 0; ki < n_k; ++ki) {
    std::vector<uint64_t> signs(nbins, EMPTY_BIN);
    if (min_count > 1 && exact_filter != 0) {
      // exact mode STREAMS cache-sized scan chunks through the
      // candidate filter (order-robust, so chunked == whole-vector,
      // pinned by the bit-identity tests) — the whole-vector collect
      // wrote + re-read ~2 GB of DRAM per 10x-coverage genome
      CandidateExactFilter filt(min_count, bindiv, signs.data());
      std::vector<uint64_t> buf;
      const int64_t CHUNK = 1 << 15;  // x8 lanes x8 B ~ 2 MB per chunk
      auto filter_whole = [&](const uint8_t *seq, int64_t pn) {
        buf.clear();
        collect_hashes_for_k(seq, pn, klist[ki], use_rc != 0, buf);
        filt.add(buf.data(), buf.size());
      };
#ifdef SKETCH_SIMD
      auto stream_ctx = [&](const InterleavedSeq &cx, int64_t pn) {
        int64_t t_end = std::min(cx.seg, pn - klist[ki] + 1);
        for (int64_t t0 = 0; t0 < t_end; t0 += CHUNK) {
          buf.clear();
          scan_and_collect_simd(cx, pn, klist[ki], use_rc != 0, buf,
                                t0, std::min(t0 + CHUNK, t_end));
          filt.add(buf.data(), buf.size());
        }
      };
#endif
      if (codon_phased) {
        for (int ph = 0; ph < 3; ++ph) {
          int64_t pn = (int64_t)phases[ph].size();
#ifdef SKETCH_SIMD
          if (!simd_cx.empty() && simd_cx[ph].seg > 0
              && pn - klist[ki] + 1 >= 64) {
            stream_ctx(simd_cx[ph], pn);
            continue;
          }
#endif
          filter_whole(phases[ph].data(), pn);
        }
      } else {
#ifdef SKETCH_SIMD
        if (!simd_cx.empty() && n - klist[ki] + 1 >= 64) {
          stream_ctx(simd_cx[0], n);
        } else {
          filter_whole(codes, n);
        }
#else
        filter_whole(codes, n);
#endif
      }
    } else if (min_count > 1) {
      std::vector<uint64_t> hashes;
      if (codon_phased) {
        std::vector<uint64_t> ph_hashes;
        for (int ph = 0; ph < 3; ++ph) {
          int64_t pn = (int64_t)phases[ph].size();
#ifdef SKETCH_SIMD
          if (!simd_cx.empty() && simd_cx[ph].seg > 0
              && pn - klist[ki] + 1 >= 64) {
            scan_and_collect_simd(simd_cx[ph], pn, klist[ki],
                                  use_rc != 0, hashes);
            continue;
          }
#endif
          collect_hashes_for_k(phases[ph].data(), pn, klist[ki],
                               use_rc != 0, ph_hashes);
          hashes.insert(hashes.end(), ph_hashes.begin(), ph_hashes.end());
        }
      } else {
#ifdef SKETCH_SIMD
        if (!simd_cx.empty() && n - klist[ki] + 1 >= 64) {
          scan_and_collect_simd(simd_cx[0], n, klist[ki], use_rc != 0,
                                hashes);
        } else {
          collect_hashes_for_k(codes, n, klist[ki], use_rc != 0, hashes);
        }
#else
        collect_hashes_for_k(codes, n, klist[ki], use_rc != 0, hashes);
#endif
      }
      bin_filtered_hashes(hashes, min_count, exact_filter != 0, bindiv,
                          signs.data());
    } else if (codon_phased) {
      for (int ph = 0; ph < 3; ++ph) {
        int64_t pn = (int64_t)phases[ph].size();
#ifdef SKETCH_SIMD
        if (!simd_cx.empty() && simd_cx[ph].seg > 0
            && pn - klist[ki] + 1 >= 64) {
          scan_and_bin_simd(simd_cx[ph], pn, klist[ki], use_rc != 0,
                            bindiv, signs.data());
          continue;
        }
#endif
        scan_and_bin(phases[ph].data(), pn, klist[ki], use_rc != 0,
                     bindiv, signs.data());
      }
    } else {
#ifdef SKETCH_SIMD
      if (!simd_cx.empty() && n - klist[ki] + 1 >= 64) {
        scan_and_bin_simd(simd_cx[0], n, klist[ki], use_rc != 0, bindiv,
                          signs.data());
      } else {
        scan_and_bin(codes, n, klist[ki], use_rc != 0, bindiv,
                     signs.data());
      }
#else
      scan_and_bin(codes, n, klist[ki], use_rc != 0, bindiv,
                   signs.data());
#endif
    }
    int rc = densify(signs.data(), nbins);
    if (rc < 0) {
#pragma omp critical
      error = rc;
      continue;
    }
    if (rc == 1) {
#pragma omp critical
      densified_any = 1;
    }
    pack_bbits(signs.data(), sketchsize64, bbits,
               usigs_out + (int64_t)ki * sketchsize64 * bbits);
  }
  if (error) return error;
  return densified_any;
}

}  // extern "C"
