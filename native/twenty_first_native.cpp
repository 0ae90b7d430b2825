// Native host-side core: scalar/sequential hot paths of the framework.
//
// The TPU owns all batch compute (JAX/XLA/Pallas); this library covers the
// host-side scalar work the reference implements in compiled Rust — single
// Tip5 permutations (proof verification, partial Merkle trees, MMR walks),
// small NTTs, polynomial long division, batch inversion — where Python-int
// arithmetic would dominate.
//
// Field: Goldilocks p = 2^64 - 2^32 + 1, canonical residues (no Montgomery
// form; see twenty_first_tpu/math/gf.py for the rationale). The Tip5 S-box
// is specified on Montgomery bytes, so the permutation converts to the
// Montgomery representative for the lookup only (reference semantics:
// twenty-first/src/tip5/mod.rs:197-207).
//
// C ABI only; consumed via ctypes from twenty_first_tpu/native.py.

#include <cstdint>
#include <cstddef>
#include <cstring>

using u64 = uint64_t;
using u128 = __uint128_t;

static constexpr u64 P = 0xffffffff00000001ULL;
static constexpr u64 EPSILON = 0xffffffffULL;  // 2^64 mod p

static inline u64 reduce128(u128 x) {
  u64 lo = (u64)x;
  u64 hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32;
  u64 hi_lo = hi & EPSILON;
  u64 t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= EPSILON;  // wrap correction
  u64 t1 = hi_lo * EPSILON;
  u64 res = t0 + t1;
  if (res < t0) res += EPSILON;  // wrap correction
  if (res >= P) res -= P;
  return res;
}

static inline u64 gl_mul(u64 a, u64 b) { return reduce128((u128)a * b); }

static inline u64 gl_add(u64 a, u64 b) {
  u64 s = a + b;
  if (s < a) s += EPSILON;  // wrapped past 2^64
  if (s >= P) s -= P;
  return s;
}

static inline u64 gl_sub(u64 a, u64 b) {
  u64 d = a - b;
  if (a < b) d -= EPSILON;  // wrap correction: d - 2^64 + p
  return d;
}

static inline u64 gl_pow(u64 base, u64 e) {
  u64 acc = 1;
  while (e) {
    if (e & 1) acc = gl_mul(acc, base);
    base = gl_mul(base, base);
    e >>= 1;
  }
  return acc;
}

static inline u64 gl_inv(u64 x) { return gl_pow(x, P - 2); }

extern "C" {

// ---------------------------------------------------------------------------
// Elementwise field ops on arrays
// ---------------------------------------------------------------------------

void gl_add_arrays(const u64* a, const u64* b, u64* out, size_t n) {
  for (size_t i = 0; i < n; i++) out[i] = gl_add(a[i], b[i]);
}

void gl_sub_arrays(const u64* a, const u64* b, u64* out, size_t n) {
  for (size_t i = 0; i < n; i++) out[i] = gl_sub(a[i], b[i]);
}

void gl_mul_arrays(const u64* a, const u64* b, u64* out, size_t n) {
  for (size_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

u64 gl_mul_scalar(u64 a, u64 b) { return gl_mul(a, b); }
u64 gl_inv_scalar(u64 a) { return gl_inv(a); }
u64 gl_pow_scalar(u64 a, u64 e) { return gl_pow(a, e); }

// Montgomery batch inversion (one inverse + 3n muls).
void gl_batch_inverse(const u64* in, u64* out, size_t n) {
  if (n == 0) return;
  u64 acc = 1;
  for (size_t i = 0; i < n; i++) {
    out[i] = acc;  // prefix product before element i
    acc = gl_mul(acc, in[i]);
  }
  acc = gl_inv(acc);
  for (size_t i = n; i-- > 0;) {
    u64 tmp = gl_mul(acc, in[i]);
    out[i] = gl_mul(acc, out[i]);
    acc = tmp;
  }
}

// ---------------------------------------------------------------------------
// Tip5 permutation (scalar, canonical domain)
// ---------------------------------------------------------------------------

static const uint16_t TIP5_LUT_SENTINEL = 0;  // table built at init

static unsigned char LUT[256];
static u64 RC[80];
static u64 MDS_COL[16];
static int tip5_ready = 0;

void tip5_init(const unsigned char* lut, const u64* rc, const u64* mds_col) {
  memcpy(LUT, lut, 256);
  memcpy(RC, rc, 80 * sizeof(u64));
  memcpy(MDS_COL, mds_col, 16 * sizeof(u64));
  tip5_ready = 1;
  (void)TIP5_LUT_SENTINEL;
}

static constexpr u64 R_INV = 0xfffffffe00000001ULL;  // 2^-64 mod p

static inline void tip5_round(u64* s, int r) {
  // S-box: first 4 words via byte LUT on the Montgomery representative
  for (int i = 0; i < 4; i++) {
    u64 m = gl_mul(s[i], EPSILON);  // v * 2^64 mod p
    u64 out = 0;
    for (int byte = 0; byte < 8; byte++) {
      out |= (u64)LUT[(m >> (8 * byte)) & 0xff] << (8 * byte);
    }
    s[i] = gl_mul(out, R_INV);  // back to canonical: out * 2^-64 mod p
  }
  for (int i = 4; i < 16; i++) {
    u64 sq = gl_mul(s[i], s[i]);
    u64 qu = gl_mul(sq, sq);
    s[i] = gl_mul(gl_mul(qu, sq), s[i]);
  }
  // MDS: circulant matvec over the integers, one reduction per output
  u64 out[16];
  for (int i = 0; i < 16; i++) {
    u128 acc = 0;
    for (int j = 0; j < 16; j++) {
      acc += (u128)MDS_COL[(i - j) & 15] * s[j];
    }
    out[i] = reduce128(acc);
  }
  for (int i = 0; i < 16; i++) s[i] = gl_add(out[i], RC[16 * r + i]);
}

void tip5_permute_batch(u64* states, size_t batch) {
  for (size_t b = 0; b < batch; b++) {
    u64* s = states + 16 * b;
    for (int r = 0; r < 5; r++) tip5_round(s, r);
  }
}

// ---------------------------------------------------------------------------
// NTT (iterative radix-2, natural order in/out via bit-reversal)
// ---------------------------------------------------------------------------

static inline uint32_t bitrev32(uint32_t k) {
  k = ((k & 0x55555555u) << 1) | ((k & 0xaaaaaaaau) >> 1);
  k = ((k & 0x33333333u) << 2) | ((k & 0xccccccccu) >> 2);
  k = ((k & 0x0f0f0f0fu) << 4) | ((k & 0xf0f0f0f0u) >> 4);
  k = ((k & 0x00ff00ffu) << 8) | ((k & 0xff00ff00u) >> 8);
  return (k << 16) | (k >> 16);
}

// In-place NTT; root must be a primitive n-th root of unity.
void gl_ntt(u64* x, size_t n, u64 root) {
  if (n <= 1) return;
  uint32_t log_n = 0;
  while ((1u << log_n) < n) log_n++;
  for (uint32_t k = 0; k < n; k++) {
    uint32_t rev = bitrev32(k) >> (32 - log_n);
    if (k < rev) { u64 t = x[k]; x[k] = x[rev]; x[rev] = t; }
  }
  for (size_t m = 1; m < n; m *= 2) {
    u64 w_m = gl_pow(root, n / (2 * m));
    for (size_t k = 0; k < n; k += 2 * m) {
      u64 w = 1;
      for (size_t j = 0; j < m; j++) {
        u64 u = x[k + j];
        u64 v = gl_mul(x[k + j + m], w);
        x[k + j] = gl_add(u, v);
        x[k + j + m] = gl_sub(u, v);
        w = gl_mul(w, w_m);
      }
    }
  }
}

void gl_intt(u64* x, size_t n, u64 root_inv) {
  gl_ntt(x, n, root_inv);
  u64 n_inv = gl_inv((u64)n);
  for (size_t i = 0; i < n; i++) x[i] = gl_mul(x[i], n_inv);
}

// Row-batched in-place NTT: `rows` contiguous transforms of length n,
// with the per-stage twiddle table precomputed by the caller (stage s of
// log2(n) holds 2^s entries, concatenated; total n-1). n_inv != 0 applies
// the inverse 1/n scaling (caller passes inverse-root twiddles then).
// Replaces the python host-NTT's per-stage numpy passes with one call.
void gl_ntt_rows(u64* x, size_t rows, size_t n, const u64* stage_tw,
                 u64 n_inv) {
  if (n <= 1) return;
  uint32_t log_n = 0;
  while ((size_t{1} << log_n) < n) log_n++;
  for (size_t r = 0; r < rows; r++) {
    u64* row = x + r * n;
    for (uint32_t k = 0; k < n; k++) {
      uint32_t rev = bitrev32(k) >> (32 - log_n);
      if (k < rev) { u64 t = row[k]; row[k] = row[rev]; row[rev] = t; }
    }
    const u64* tw = stage_tw;
    for (size_t m = 1; m < n; m *= 2) {
      for (size_t k = 0; k < n; k += 2 * m) {
        for (size_t j = 0; j < m; j++) {
          u64 u = row[k + j];
          u64 v = gl_mul(row[k + j + m], tw[j]);
          row[k + j] = gl_add(u, v);
          row[k + j + m] = gl_sub(u, v);
        }
      }
      tw += m;
    }
    if (n_inv) {
      for (size_t i = 0; i < n; i++) row[i] = gl_mul(row[i], n_inv);
    }
  }
}

// ---------------------------------------------------------------------------
// Polynomial long division (remainder + quotient)
// ---------------------------------------------------------------------------

// num (len dn+1), den (len dd+1), quot (len dn-dd+1), rem (len dd).
// Caller guarantees dn >= dd >= 0 and den[dd] != 0.
void gl_poly_divmod(const u64* num, size_t dn, const u64* den, size_t dd,
                    u64* quot, u64* rem) {
  u64* work = new u64[dn + 1];
  memcpy(work, num, (dn + 1) * sizeof(u64));
  u64 lc_inv = gl_inv(den[dd]);
  for (size_t i = dn - dd + 1; i-- > 0;) {
    u64 q = gl_mul(work[i + dd], lc_inv);
    quot[i] = q;
    if (q != 0) {
      for (size_t j = 0; j <= dd; j++) {
        work[i + j] = gl_sub(work[i + j], gl_mul(q, den[j]));
      }
    }
  }
  memcpy(rem, work, dd * sizeof(u64));
  delete[] work;
}

}  // extern "C"
