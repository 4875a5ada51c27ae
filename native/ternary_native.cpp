// Native host-side core: ternary generation, packing, and TCSC construction.
//
// TPU-native framework's analogue of the reference's C++ data-structure layer
// (cpp_impl/data_structures/*.h and cpp_impl/sparseUtils.h:26-90 in
// alessiomelone/Ternary-spGEMM). On TPU the *compute* lives in XLA/Pallas;
// what stays on the host is one-time container construction and the
// benchmark-harness matrix generation — both of which are bottlenecked by
// Python/numpy on slow benchmark hosts (a 16384x4096 generate + argsort is
// tens of seconds). This core is exposed through ctypes
// (ternary_spgemm_tpu/native.py) with transparent numpy fallbacks.
//
// Determinism contract: pack_2bit / pack_base3 / build_tcsc are bit-exact
// equivalents of the numpy reference implementations (formats/packed.py,
// formats/tcsc.py) and are property-tested against them. gen_ternary matches
// the *distribution* of formats/generate.py (per-row limitPos/limitNeg with
// posVari imbalance, sparseUtils.h:54-87 semantics) but draws from its own
// seeded PRNG stream (xoshiro256**), so seeds are reproducible within the
// native path.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// PRNG: xoshiro256** (public-domain algorithm), seeded via splitmix64.
// ---------------------------------------------------------------------------

struct Rng {
  uint64_t s[4];
};

static inline uint64_t splitmix64(uint64_t* x) {
  uint64_t z = (*x += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

static inline void rng_seed(Rng* r, uint64_t seed) {
  for (int i = 0; i < 4; i++) r->s[i] = splitmix64(&seed);
}

static inline uint64_t rotl(uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

static inline uint64_t rng_next(Rng* r) {
  uint64_t* s = r->s;
  uint64_t result = rotl(s[1] * 5, 7) * 9;
  uint64_t t = s[1] << 17;
  s[2] ^= s[0];
  s[3] ^= s[1];
  s[1] ^= s[2];
  s[0] ^= s[3];
  s[2] ^= t;
  s[3] = rotl(s[3], 45);
  return result;
}

// Unbiased bounded integer (Lemire's method with rejection).
static inline uint64_t rng_below(Rng* r, uint64_t n) {
  if (n == 0) return 0;
  __uint128_t m = (__uint128_t)rng_next(r) * n;
  uint64_t lo = (uint64_t)m;
  if (lo < n) {
    uint64_t t = (0 - n) % n;
    while (lo < t) {
      m = (__uint128_t)rng_next(r) * n;
      lo = (uint64_t)m;
    }
  }
  return (uint64_t)(m >> 64);
}

// ---------------------------------------------------------------------------
// Ternary matrix generation (distribution of formats/generate.py /
// sparseUtils.h:54-87): per row, posVari ~ U[0, N/s/20 + 1], limitPos =
// (N/s)/2 + posVari positives and limitNeg = (N/s)/2 - posVari negatives at
// distinct uniform positions. Selection via Floyd's algorithm: O(nsel) per
// row instead of a full O(N log N) key sort.
// ---------------------------------------------------------------------------

void gen_ternary(uint64_t seed, int64_t K, int64_t N, int64_t s, int8_t* out) {
  Rng rng;
  rng_seed(&rng, seed);
  const int64_t half = (N / s) / 2;
  const int64_t vari_hi = N / s / 20 + 1;  // inclusive
  std::vector<int32_t> sel;
  sel.reserve(2 * half + vari_hi + 1);
  std::vector<uint8_t> taken(N, 0);
  std::memset(out, 0, (size_t)K * N);
  for (int64_t k = 0; k < K; k++) {
    const int64_t pos_vari = (int64_t)rng_below(&rng, (uint64_t)vari_hi + 1);
    const int64_t limit_pos = half + pos_vari;
    const int64_t limit_neg = half - pos_vari;
    const int64_t nsel = limit_pos + limit_neg;  // == 2*half
    // Floyd: for j in [N-nsel, N): pick t in [0, j]; if taken, use j.
    sel.clear();
    for (int64_t j = N - nsel; j < N; j++) {
      int64_t t = (int64_t)rng_below(&rng, (uint64_t)j + 1);
      if (taken[t]) t = j;
      taken[t] = 1;
      sel.push_back((int32_t)t);
    }
    // Random subset split: Fisher-Yates shuffle of the selected list, first
    // limit_pos entries are +1 (uniform subset of a uniform set).
    for (int64_t i = nsel - 1; i > 0; i--) {
      int64_t j = (int64_t)rng_below(&rng, (uint64_t)i + 1);
      int32_t tmp = sel[i];
      sel[i] = sel[j];
      sel[j] = tmp;
    }
    int8_t* row = out + k * N;
    for (int64_t i = 0; i < nsel; i++) {
      row[sel[i]] = (i < limit_pos) ? 1 : -1;
      taken[sel[i]] = 0;  // reset for the next row
    }
  }
}

// Dense activation generation: integers in [-range, range] as f32
// (initX, sparseUtils.h:6-23).
void gen_x(uint64_t seed, int64_t M, int64_t K, int64_t range, float* out) {
  Rng rng;
  rng_seed(&rng, seed);
  const uint64_t span = 2 * (uint64_t)range + 1;
  for (int64_t i = 0; i < M * K; i++) {
    out[i] = (float)((int64_t)rng_below(&rng, span) - range);
  }
}

// ---------------------------------------------------------------------------
// Packers — bit-exact equivalents of formats/packed.py (stride layout: byte
// row k' of the packed plane holds dense rows {k' + j*Kq}).
// ---------------------------------------------------------------------------

void pack_2bit(const int8_t* W, int64_t K, int64_t N, uint8_t* out) {
  const int64_t Kq = (K + 3) / 4;
  std::memset(out, 0, (size_t)Kq * N);
  for (int j = 0; j < 4; j++) {
    for (int64_t kq = 0; kq < Kq; kq++) {
      const int64_t k = (int64_t)j * Kq + kq;
      if (k >= K) continue;
      const int8_t* row = W + k * N;
      uint8_t* orow = out + kq * N;
      for (int64_t n = 0; n < N; n++) {
        orow[n] |= (uint8_t)(((uint8_t)row[n] & 3u) << (2 * j));
      }
    }
  }
}

void pack_base3(const int8_t* W, int64_t K, int64_t N, uint8_t* out) {
  static const uint8_t POW3[5] = {1, 3, 9, 27, 81};
  const int64_t Kq = (K + 4) / 5;
  std::memset(out, 0, (size_t)Kq * N);
  for (int j = 0; j < 5; j++) {
    for (int64_t kq = 0; kq < Kq; kq++) {
      const int64_t k = (int64_t)j * Kq + kq;
      if (k >= K) continue;
      const int8_t* row = W + k * N;
      uint8_t* orow = out + kq * N;
      const uint8_t p = POW3[j];
      for (int64_t n = 0; n < N; n++) {
        const uint8_t digit = (row[n] < 0) ? 2 : (uint8_t)row[n];
        orow[n] = (uint8_t)(orow[n] + digit * p);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// TCSC construction — bit-exact equivalent of formats/tcsc.py::_csc_arrays
// (split-sign CSC with column-major streams). Two-phase API so the caller
// (numpy) owns the allocations:
//   tcsc_count: nnz_pos/nnz_neg -> sizes for the index arrays;
//   tcsc_fill:  col_start_pos/neg (N+1), row_index_pos/neg, col_ids_pos/neg.
// ---------------------------------------------------------------------------

void tcsc_count(const int8_t* W, int64_t K, int64_t N, int64_t* nnz_pos,
                int64_t* nnz_neg) {
  int64_t p = 0, m = 0;
  for (int64_t i = 0; i < K * N; i++) {
    p += (W[i] == 1);
    m += (W[i] == -1);
  }
  *nnz_pos = p;
  *nnz_neg = m;
}

void tcsc_fill(const int8_t* W, int64_t K, int64_t N, int32_t* csp,
               int32_t* csn, int32_t* rip, int32_t* rin, int32_t* cip,
               int32_t* cin) {
  // Two row-major passes (a column-major scan strides K*N ~cache-hostile;
  // this is ~6x faster at 8192x2048 on the benchmark host). Output order
  // is identical: per column, row indices ascend.
  std::vector<int32_t> curp(N), curn(N);
  std::fill(curp.begin(), curp.end(), 0);
  std::fill(curn.begin(), curn.end(), 0);
  for (int64_t k = 0; k < K; k++) {
    const int8_t* row = W + k * N;
    for (int64_t n = 0; n < N; n++) {
      curp[n] += (row[n] == 1);
      curn[n] += (row[n] == -1);
    }
  }
  csp[0] = 0;
  csn[0] = 0;
  for (int64_t n = 0; n < N; n++) {
    csp[n + 1] = csp[n] + curp[n];
    csn[n + 1] = csn[n] + curn[n];
    curp[n] = csp[n];
    curn[n] = csn[n];
  }
  for (int64_t k = 0; k < K; k++) {
    const int8_t* row = W + k * N;
    for (int64_t n = 0; n < N; n++) {
      const int8_t v = row[n];
      if (v == 1) {
        rip[curp[n]] = (int32_t)k;
        cip[curp[n]++] = (int32_t)n;
      } else if (v == -1) {
        rin[curn[n]] = (int32_t)k;
        cin[curn[n]++] = (int32_t)n;
      }
    }
  }
}


// ---------------------------------------------------------------------------
// TiledBitplane packer — bit-exact vs formats/bitplane.py::from_dense.
//
// Layout: plane (nb, gn, 2*tkb, tile_n) uint8 (pos byte-rows then neg),
// wsum (nb, gn, 1, tile_n) int32. Dense row r of a B=8*tkb block maps to
// (byte-row t, bit j) per bitplane_rowmap: r<4tkb -> (r/4, r%4), else
// ((r-4tkb)/4, (r-4tkb)%4+4). Buffers must arrive zeroed (K/N padding
// contributes nothing).
// ---------------------------------------------------------------------------

void pack_bitplane(const int8_t* W, int64_t K, int64_t N, int64_t tkb,
                   int64_t tile_n, int64_t gn, uint8_t* plane,
                   int32_t* wsum) {
  const int64_t B = 8 * tkb;
  for (int64_t k = 0; k < K; k++) {
    const int64_t sb = k / B, r = k % B;
    const int64_t t = (r < 4 * tkb) ? r / 4 : (r - 4 * tkb) / 4;
    const int64_t j = (r < 4 * tkb) ? r % 4 : (r - 4 * tkb) % 4 + 4;
    const uint8_t bit = (uint8_t)(1u << j);
    const int8_t* row = W + k * N;
    for (int64_t n = 0; n < N; n++) {
      const int8_t v = row[n];
      if (v == 0) continue;
      const int64_t g = n / tile_n, c = n % tile_n;
      uint8_t* tile = plane + (((sb * gn + g) * 2 * tkb) + t) * tile_n;
      if (v == 1) {
        tile[c] |= bit;
      } else {
        tile[tkb * tile_n + c] |= bit;
      }
      wsum[(sb * gn + g) * tile_n + c] += v;
    }
  }
}


// ---------------------------------------------------------------------------
// TiledEllDeposit packer — bit-exact vs formats/ell_deposit.py::from_dense.
//
// Superblock = 248 dense rows (8 words x 31 rows). Phase 1 (caps): per
// (superblock, N-tile) max slot count per sign. Phase 2 (fill): offsets in
// slot order (row-ascending within a word column, matching the cumsum slot
// assignment of the numpy packer); plane rows are (slot, word) flattened,
// neg slots after the cap_p_max pos slots. Caller pre-fills the plane with
// the sentinel WORD_ROWS (31) and zeroes wsum.
// ---------------------------------------------------------------------------

void ell_deposit_caps(const int8_t* W, int64_t K, int64_t N, int64_t tile_n,
                      int64_t gn, int32_t* caps_p, int32_t* caps_n) {
  const int64_t SB = 248, WR = 31;
  const int64_t nsb = (K + SB - 1) / SB;
  const int64_t Np = gn * tile_n;
  std::vector<int32_t> cp(8 * Np), cn(8 * Np);
  for (int64_t sb = 0; sb < nsb; sb++) {
    std::fill(cp.begin(), cp.end(), 0);
    std::fill(cn.begin(), cn.end(), 0);
    const int64_t k0 = sb * SB, k1 = (k0 + SB < K) ? k0 + SB : K;
    for (int64_t k = k0; k < k1; k++) {
      const int64_t w = (k - k0) / WR;
      const int8_t* row = W + k * N;
      int32_t* cpw = cp.data() + w * Np;
      int32_t* cnw = cn.data() + w * Np;
      for (int64_t n = 0; n < N; n++) {
        cpw[n] += (row[n] == 1);
        cnw[n] += (row[n] == -1);
      }
    }
    for (int64_t g = 0; g < gn; g++) {
      int32_t mp = 0, mn = 0;
      for (int64_t w = 0; w < 8; w++) {
        const int32_t* cpw = cp.data() + w * Np + g * tile_n;
        const int32_t* cnw = cn.data() + w * Np + g * tile_n;
        for (int64_t c = 0; c < tile_n; c++) {
          if (cpw[c] > mp) mp = cpw[c];
          if (cnw[c] > mn) mn = cnw[c];
        }
      }
      caps_p[sb * gn + g] = mp;
      caps_n[sb * gn + g] = mn;
    }
  }
}

void ell_deposit_fill(const int8_t* W, int64_t K, int64_t N, int64_t tile_n,
                      int64_t gn, int64_t cap_p, int64_t cap_n, int8_t* plane,
                      int32_t* wsum) {
  const int64_t SB = 248, WR = 31;
  const int64_t nsb = (K + SB - 1) / SB;
  const int64_t Np = gn * tile_n;
  const int64_t R = 8 * (cap_p + cap_n);
  std::vector<int32_t> sp(8 * Np), sn(8 * Np);
  for (int64_t sb = 0; sb < nsb; sb++) {
    std::fill(sp.begin(), sp.end(), 0);
    std::fill(sn.begin(), sn.end(), 0);
    const int64_t k0 = sb * SB, k1 = (k0 + SB < K) ? k0 + SB : K;
    for (int64_t k = k0; k < k1; k++) {
      const int64_t lr = k - k0, w = lr / WR;
      const int8_t r = (int8_t)(lr % WR);
      const int8_t* row = W + k * N;
      for (int64_t n = 0; n < N; n++) {
        const int8_t v = row[n];
        if (v == 0) continue;
        const int64_t g = n / tile_n, c = n % tile_n;
        int64_t prow;
        if (v == 1) {
          prow = (int64_t)(sp[w * Np + n]++) * 8 + w;
        } else {
          prow = 8 * cap_p + (int64_t)(sn[w * Np + n]++) * 8 + w;
        }
        plane[(((sb * gn + g) * R) + prow) * tile_n + c] = r;
        wsum[(sb * gn + g) * tile_n + c] += v;
      }
    }
  }
}

}  // extern "C"


