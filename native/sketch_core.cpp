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

// Count-min geometry matching sketch/reader.py CountMin (width_bits=22,
// 4 rows, salts (row+1)*golden; idx = (h * salt) >> 33 & mask; uint16
// counters with numpy's wrap-on-overflow semantics; estimates read after
// all insertions).
constexpr int CM_WIDTH_BITS = 22;
constexpr int CM_HASHES = 4;
constexpr uint64_t CM_MASK = (1ULL << CM_WIDTH_BITS) - 1;

// Filter read k-mer hashes by multiplicity then bin the survivors —
// multiset-identical to reader.py filter_read_kmers (both filter modes
// keep or drop whole unique hashes, and min-per-bin is order-blind).
void bin_filtered_hashes(std::vector<uint64_t> &hashes, int min_count,
                         bool exact, const FastDiv &bindiv,
                         uint64_t *signs) {
  if (hashes.empty()) return;
  if (exact) {
    std::sort(hashes.begin(), hashes.end());
    size_t i = 0;
    while (i < hashes.size()) {
      size_t run = i + 1;
      while (run < hashes.size() && hashes[run] == hashes[i]) ++run;
      if (run - i >= (size_t)min_count) bin_one(hashes[i], bindiv, signs);
      i = run;
    }
    return;
  }
  std::vector<uint16_t> table((size_t)CM_HASHES << CM_WIDTH_BITS, 0);
  // Insert pass: DRAM-latency bound (random touches over a 32 MB table);
  // software prefetch ~PF iterations ahead hides most of the misses.
  // Measured (20M hashes): 0.57 s for the 4 row passes; a fused 1-pass
  // variant (4 increments per hash, 4 prefetches ahead) was NOT faster
  // (0.60 s) — the prefetched row passes already saturate memory-level
  // parallelism, so the row-major loop stays.
  constexpr size_t PF = 16;
  for (int row = 0; row < CM_HASHES; ++row) {
    const uint64_t salt = (uint64_t)(row + 1) * 0x9E3779B97F4A7C15ULL;
    uint16_t *t = table.data() + ((size_t)row << CM_WIDTH_BITS);
    const size_t nh = hashes.size();
    for (size_t i = 0; i < nh; ++i) {
      if (i + PF < nh)
        __builtin_prefetch(&t[(hashes[i + PF] * salt) >> 33 & CM_MASK], 1);
      ++t[(hashes[i] * salt) >> 33 & CM_MASK];
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
    uint32_t est = 0xFFFFFFFFu;
    for (int row = 0; row < CM_HASHES; ++row) {
      const uint64_t salt = (uint64_t)(row + 1) * 0x9E3779B97F4A7C15ULL;
      const uint16_t *t = table.data() + ((size_t)row << CM_WIDTH_BITS);
      uint32_t c = t[(h * salt) >> 33 & CM_MASK];
      if (c < est) est = c;
    }
    if (est >= (uint32_t)min_count) {
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

#pragma omp parallel for schedule(dynamic) num_threads(n_threads)
  for (int ki = 0; ki < n_k; ++ki) {
    std::vector<uint64_t> signs(nbins, EMPTY_BIN);
    if (min_count > 1) {
      std::vector<uint64_t> hashes;
      if (codon_phased) {
        std::vector<uint64_t> ph_hashes;
        for (int ph = 0; ph < 3; ++ph) {
          collect_hashes_for_k(phases[ph].data(),
                               (int64_t)phases[ph].size(), klist[ki],
                               use_rc != 0, ph_hashes);
          hashes.insert(hashes.end(), ph_hashes.begin(), ph_hashes.end());
        }
      } else {
        collect_hashes_for_k(codes, n, klist[ki], use_rc != 0, hashes);
      }
      bin_filtered_hashes(hashes, min_count, exact_filter != 0, bindiv,
                          signs.data());
    } else if (codon_phased) {
      for (int ph = 0; ph < 3; ++ph)
        scan_and_bin(phases[ph].data(), (int64_t)phases[ph].size(),
                     klist[ki], use_rc != 0, bindiv, signs.data());
    } else {
      scan_and_bin(codes, n, klist[ki], use_rc != 0, bindiv, signs.data());
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
