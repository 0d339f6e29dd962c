// BN254 curve + scalar-field kernels for the in-repo Groth16 prover.
//
// The native-performance layer of the L5 wrap stage (SURVEY.md §2.5): the
// reference's gnark prover does its MSMs/FFTs in optimized Go+asm
// (consts from EIP-196/197); this library provides the same primitives for
// wrap/groth16.py at proving scale (millions of constraints):
//   - Montgomery arithmetic for Fp (base) and Fr (scalar) fields,
//   - G1/G2 Jacobian arithmetic, Pippenger multi-scalar multiplication,
//   - batched fixed-base scalar multiplication (trusted-setup CRS),
//   - radix-2 NTT over Fr (QAP quotient via coset evaluation),
//   - sparse R1CS mat-vec over Fr (witness -> A.z/B.z/C.z evaluations).
//
// Layout conventions at the C boundary: all field elements are 4 x u64
// little-endian limbs in STANDARD (non-Montgomery) form; G1 affine points
// are (x, y) = 8 limbs, G2 affine (x0, x1, y0, y1) = 16 limbs; the point
// at infinity is all-zero.  Build: g++ -O3 -march=native -fopenmp -shared.

#include <cstdint>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

typedef uint64_t u64;
typedef __uint128_t u128;
typedef int64_t i64;

#include "bn254_constants.inc"

// ---------------------------------------------------------------------------
// 4-limb Montgomery field template
// ---------------------------------------------------------------------------

struct FpTag {
  static const u64* mod() { return FP_MOD; }
  static const u64* r2() { return FP_R2; }
  static u64 inv() { return FP_INV; }
};
struct FrTag {
  static const u64* mod() { return FR_MOD; }
  static const u64* r2() { return FR_R2; }
  static u64 inv() { return FR_INV; }
};

template <class T>
struct Fe {
  u64 l[4];

  static inline Fe zero() { return Fe{{0, 0, 0, 0}}; }

  inline bool is_zero() const { return !(l[0] | l[1] | l[2] | l[3]); }

  static inline bool geq_mod(const u64* a) {
    const u64* m = T::mod();
    for (int i = 3; i >= 0; i--) {
      if (a[i] > m[i]) return true;
      if (a[i] < m[i]) return false;
    }
    return true;
  }

  static inline Fe add(const Fe& a, const Fe& b) {
    Fe r;
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
      c += (u128)a.l[i] + b.l[i];
      r.l[i] = (u64)c;
      c >>= 64;
    }
    if (c || geq_mod(r.l)) {
      u128 br = 0;
      const u64* m = T::mod();
      for (int i = 0; i < 4; i++) {
        u128 d = (u128)r.l[i] - m[i] - br;
        r.l[i] = (u64)d;
        br = (d >> 64) & 1;
      }
    }
    return r;
  }

  static inline Fe sub(const Fe& a, const Fe& b) {
    Fe r;
    u128 br = 0;
    for (int i = 0; i < 4; i++) {
      u128 d = (u128)a.l[i] - b.l[i] - br;
      r.l[i] = (u64)d;
      br = (d >> 64) & 1;
    }
    if (br) {
      u128 c = 0;
      const u64* m = T::mod();
      for (int i = 0; i < 4; i++) {
        c += (u128)r.l[i] + m[i];
        r.l[i] = (u64)c;
        c >>= 64;
      }
    }
    return r;
  }

  static inline Fe dbl(const Fe& a) { return add(a, a); }

  static inline Fe neg(const Fe& a) {
    if (a.is_zero()) return a;
    Fe m;
    memcpy(m.l, T::mod(), 32);
    return sub(m, a);
  }

  // CIOS Montgomery multiplication
  static inline Fe mul(const Fe& a, const Fe& b) {
    const u64* m = T::mod();
    u64 t[5] = {0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
      u128 c = 0;
      for (int j = 0; j < 4; j++) {
        c += (u128)t[j] + (u128)a.l[i] * b.l[j];
        t[j] = (u64)c;
        c >>= 64;
      }
      u64 t4 = t[4] + (u64)c;
      u64 carry_hi = (u64)((((u128)t[4] + c) >> 64));
      u64 k = t[0] * T::inv();
      c = (u128)t[0] + (u128)k * m[0];
      c >>= 64;
      for (int j = 1; j < 4; j++) {
        c += (u128)t[j] + (u128)k * m[j];
        t[j - 1] = (u64)c;
        c >>= 64;
      }
      c += t4;
      t[3] = (u64)c;
      t[4] = carry_hi + (u64)(c >> 64);
    }
    Fe r;
    memcpy(r.l, t, 32);
    if (t[4] || geq_mod(r.l)) {
      u128 br = 0;
      for (int i = 0; i < 4; i++) {
        u128 d = (u128)r.l[i] - m[i] - br;
        r.l[i] = (u64)d;
        br = (d >> 64) & 1;
      }
    }
    return r;
  }

  static inline Fe sqr(const Fe& a) { return mul(a, a); }

  static inline Fe to_mont(const Fe& a) {
    Fe r2;
    memcpy(r2.l, T::r2(), 32);
    return mul(a, r2);
  }

  static inline Fe from_mont(const Fe& a) {
    Fe one = {{1, 0, 0, 0}};
    return mul(a, one);
  }

  static inline Fe one_mont() {
    Fe one = {{1, 0, 0, 0}};
    return to_mont(one);
  }

  static Fe pow(const Fe& a, const u64* e) {  // e standard 4-limb
    Fe r = one_mont();
    for (int i = 255; i >= 0; i--) {
      r = sqr(r);
      if ((e[i / 64] >> (i % 64)) & 1) r = mul(r, a);
    }
    return r;
  }

  static Fe inv_mont(const Fe& a) {  // Fermat
    u64 e[4];
    memcpy(e, T::mod(), 32);
    u128 br = 0;
    u64 two[4] = {2, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
      u128 d = (u128)e[i] - two[i] - br;
      e[i] = (u64)d;
      br = (d >> 64) & 1;
    }
    return pow(a, e);
  }
};

typedef Fe<FpTag> Fp;
typedef Fe<FrTag> Fr;

// ---------------------------------------------------------------------------
// Fp2 = Fp[u]/(u^2+1)
// ---------------------------------------------------------------------------

struct Fp2 {
  Fp c0, c1;

  static inline Fp2 zero() { return {Fp::zero(), Fp::zero()}; }
  inline bool is_zero() const { return c0.is_zero() && c1.is_zero(); }

  static inline Fp2 add(const Fp2& a, const Fp2& b) {
    return {Fp::add(a.c0, b.c0), Fp::add(a.c1, b.c1)};
  }
  static inline Fp2 sub(const Fp2& a, const Fp2& b) {
    return {Fp::sub(a.c0, b.c0), Fp::sub(a.c1, b.c1)};
  }
  static inline Fp2 dbl(const Fp2& a) { return add(a, a); }
  static inline Fp2 neg(const Fp2& a) { return {Fp::neg(a.c0), Fp::neg(a.c1)}; }

  static inline Fp2 mul(const Fp2& a, const Fp2& b) {
    // Karatsuba: (a0b0 - a1b1, (a0+a1)(b0+b1) - a0b0 - a1b1)
    Fp t0 = Fp::mul(a.c0, b.c0);
    Fp t1 = Fp::mul(a.c1, b.c1);
    Fp t2 = Fp::mul(Fp::add(a.c0, a.c1), Fp::add(b.c0, b.c1));
    return {Fp::sub(t0, t1), Fp::sub(Fp::sub(t2, t0), t1)};
  }
  static inline Fp2 sqr(const Fp2& a) {
    // (a0+a1)(a0-a1), 2 a0 a1
    Fp t0 = Fp::mul(Fp::add(a.c0, a.c1), Fp::sub(a.c0, a.c1));
    Fp t1 = Fp::mul(a.c0, a.c1);
    return {t0, Fp::dbl(t1)};
  }
  static inline Fp2 inv_mont(const Fp2& a) {
    Fp norm = Fp::add(Fp::sqr(a.c0), Fp::sqr(a.c1));
    Fp ninv = Fp::inv_mont(norm);
    return {Fp::mul(a.c0, ninv), Fp::neg(Fp::mul(a.c1, ninv))};
  }
};

// Montgomery-one per coordinate field (pt_madd / fixed-base lifting)
static Fp FP_ONE_M;
static Fp2 FP2_ONE_M;
static bool INITED = false;

template <class F> static inline F one_m();
template <> inline Fp one_m<Fp>() { return FP_ONE_M; }
template <> inline Fp2 one_m<Fp2>() { return FP2_ONE_M; }

static void ensure_init() {
  if (INITED) return;
  FP_ONE_M = Fp::one_mont();
  FP2_ONE_M = {FP_ONE_M, Fp::zero()};
  INITED = true;
}

// ---------------------------------------------------------------------------
// Jacobian curve arithmetic, templated over the coordinate field
// ---------------------------------------------------------------------------

template <class F>
struct Pt {
  F X, Y, Z;  // Z = 0 -> infinity

  static inline Pt inf() { return {F::zero(), F::zero(), F::zero()}; }
  inline bool is_inf() const { return Z.is_zero(); }
};

template <class F>
struct Aff {
  F x, y;
  bool inf;
};

template <class F>
static inline Pt<F> pt_dbl(const Pt<F>& p) {
  if (p.is_inf()) return p;
  // dbl-2009-l (a = 0)
  F A = F::sqr(p.X);
  F B = F::sqr(p.Y);
  F C = F::sqr(B);
  F t = F::sub(F::sqr(F::add(p.X, B)), F::add(A, C));
  F D = F::dbl(t);
  F E = F::add(F::add(A, A), A);
  F Fv = F::sqr(E);
  Pt<F> r;
  r.X = F::sub(Fv, F::dbl(D));
  F c8 = F::dbl(F::dbl(F::dbl(C)));
  r.Y = F::sub(F::mul(E, F::sub(D, r.X)), c8);
  r.Z = F::mul(F::dbl(p.Y), p.Z);
  return r;
}

template <class F>
static inline Pt<F> pt_add(const Pt<F>& p, const Pt<F>& q) {
  if (p.is_inf()) return q;
  if (q.is_inf()) return p;
  // add-2007-bl
  F Z1Z1 = F::sqr(p.Z);
  F Z2Z2 = F::sqr(q.Z);
  F U1 = F::mul(p.X, Z2Z2);
  F U2 = F::mul(q.X, Z1Z1);
  F S1 = F::mul(F::mul(p.Y, q.Z), Z2Z2);
  F S2 = F::mul(F::mul(q.Y, p.Z), Z1Z1);
  F H = F::sub(U2, U1);
  F rr = F::dbl(F::sub(S2, S1));
  if (H.is_zero()) {
    if (rr.is_zero()) return pt_dbl(p);
    return Pt<F>::inf();
  }
  F I = F::sqr(F::dbl(H));
  F J = F::mul(H, I);
  F V = F::mul(U1, I);
  Pt<F> r;
  r.X = F::sub(F::sub(F::sqr(rr), J), F::dbl(V));
  r.Y = F::sub(F::mul(rr, F::sub(V, r.X)), F::dbl(F::mul(S1, J)));
  r.Z = F::mul(F::sub(F::sqr(F::add(p.Z, q.Z)), F::add(Z1Z1, Z2Z2)), H);
  return r;
}

// mixed add (q affine, q not infinity)
template <class F>
static inline Pt<F> pt_madd(const Pt<F>& p, const Aff<F>& q) {
  if (q.inf) return p;
  if (p.is_inf()) {
    Pt<F> r;
    r.X = q.x;
    r.Y = q.y;
    r.Z = one_m<F>();
    return r;
  }
  // madd-2007-bl
  F Z1Z1 = F::sqr(p.Z);
  F U2 = F::mul(q.x, Z1Z1);
  F S2 = F::mul(F::mul(q.y, p.Z), Z1Z1);
  F H = F::sub(U2, p.X);
  F rr = F::dbl(F::sub(S2, p.Y));
  if (H.is_zero()) {
    if (rr.is_zero()) return pt_dbl(p);
    return Pt<F>::inf();
  }
  F HH = F::sqr(H);
  F I = F::dbl(F::dbl(HH));
  F J = F::mul(H, I);
  F V = F::mul(p.X, I);
  Pt<F> r;
  r.X = F::sub(F::sub(F::sqr(rr), J), F::dbl(V));
  r.Y = F::sub(F::mul(rr, F::sub(V, r.X)), F::dbl(F::mul(p.Y, J)));
  r.Z = F::sub(F::sqr(F::add(p.Z, H)), F::add(Z1Z1, HH));
  return r;
}

typedef Pt<Fp> G1;
typedef Aff<Fp> G1A;
typedef Pt<Fp2> G2;
typedef Aff<Fp2> G2A;

// load/store helpers (standard form at the boundary)
static inline Fp load_fp(const u64* p) {
  Fp a;
  memcpy(a.l, p, 32);
  return Fp::to_mont(a);
}
static inline void store_fp(u64* p, const Fp& a) {
  Fp s = Fp::from_mont(a);
  memcpy(p, s.l, 32);
}
static inline Fr load_fr(const u64* p) {
  Fr a;
  memcpy(a.l, p, 32);
  return Fr::to_mont(a);
}
static inline void store_fr(u64* p, const Fr& a) {
  Fr s = Fr::from_mont(a);
  memcpy(p, s.l, 32);
}

static inline G1A load_g1(const u64* p) {
  G1A a;
  bool inf = true;
  for (int i = 0; i < 8; i++)
    if (p[i]) inf = false;
  a.inf = inf;
  if (!inf) {
    Fp x, y;
    memcpy(x.l, p, 32);
    memcpy(y.l, p + 4, 32);
    a.x = Fp::to_mont(x);
    a.y = Fp::to_mont(y);
  } else {
    a.x = Fp::zero();
    a.y = Fp::zero();
  }
  return a;
}

static inline G2A load_g2(const u64* p) {
  G2A a;
  bool inf = true;
  for (int i = 0; i < 16; i++)
    if (p[i]) inf = false;
  a.inf = inf;
  if (!inf) {
    Fp x0, x1, y0, y1;
    memcpy(x0.l, p, 32);
    memcpy(x1.l, p + 4, 32);
    memcpy(y0.l, p + 8, 32);
    memcpy(y1.l, p + 12, 32);
    a.x = {Fp::to_mont(x0), Fp::to_mont(x1)};
    a.y = {Fp::to_mont(y0), Fp::to_mont(y1)};
  } else {
    a.x = Fp2::zero();
    a.y = Fp2::zero();
  }
  return a;
}

template <class F, class PT>
static void store_affine(u64* out, const PT& p, int ncomp) {
  // normalize Jacobian -> affine; infinity -> zeros
  if (p.is_inf()) {
    memset(out, 0, 32 * 2 * ncomp);
    return;
  }
  F zinv = F::inv_mont(p.Z);
  F zinv2 = F::sqr(zinv);
  F zinv3 = F::mul(zinv2, zinv);
  F x = F::mul(p.X, zinv2);
  F y = F::mul(p.Y, zinv3);
  if constexpr (sizeof(F) == sizeof(Fp)) {
    store_fp(out, *(const Fp*)&x);
    store_fp(out + 4, *(const Fp*)&y);
  } else {
    const Fp2* xx = (const Fp2*)&x;
    const Fp2* yy = (const Fp2*)&y;
    store_fp(out, xx->c0);
    store_fp(out + 4, xx->c1);
    store_fp(out + 8, yy->c0);
    store_fp(out + 12, yy->c1);
  }
}

// ---------------------------------------------------------------------------
// Pippenger MSM
// ---------------------------------------------------------------------------

template <class PT, class AF>
static PT msm_impl(const std::vector<AF>& bases, const u64* scalars, i64 n) {
  int c = 4;
  if (n > 32) c = 8;
  if (n > (1 << 13)) c = 12;
  if (n > (1 << 18)) c = 14;
  if (n > (1 << 21)) c = 16;
  int windows = (256 + c - 1) / c;
  std::vector<PT> win_sums(windows);

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1)
#endif
  for (int w = 0; w < windows; w++) {
    std::vector<PT> buckets((size_t)1 << c, PT::inf());
    for (i64 i = 0; i < n; i++) {
      const u64* s = scalars + 4 * i;
      int bit = w * c;
      u64 digit = 0;
      // extract c bits starting at `bit`
      int limb = bit / 64, off = bit % 64;
      digit = s[limb] >> off;
      if (off + c > 64 && limb + 1 < 4) digit |= s[limb + 1] << (64 - off);
      digit &= ((u64)1 << c) - 1;
      if (digit) buckets[digit] = pt_madd(buckets[digit], bases[i]);
    }
    PT run = PT::inf(), sum = PT::inf();
    for (i64 b = ((i64)1 << c) - 1; b >= 1; b--) {
      run = pt_add(run, buckets[b]);
      sum = pt_add(sum, run);
    }
    win_sums[w] = sum;
  }
  PT acc = PT::inf();
  for (int w = windows - 1; w >= 0; w--) {
    for (int k = 0; k < c && w != windows - 1; k++) acc = pt_dbl(acc);
    acc = pt_add(acc, win_sums[w]);
  }
  return acc;
}

extern "C" void bn254_g1_msm(const u64* bases, const u64* scalars, i64 n,
                             u64* out) {
  ensure_init();
  std::vector<G1A> b(n);
  for (i64 i = 0; i < n; i++) b[i] = load_g1(bases + 8 * i);
  G1 r = msm_impl<G1, G1A>(b, scalars, n);
  store_affine<Fp, G1>(out, r, 1);
}

extern "C" void bn254_g2_msm(const u64* bases, const u64* scalars, i64 n,
                             u64* out) {
  ensure_init();
  std::vector<G2A> b(n);
  for (i64 i = 0; i < n; i++) b[i] = load_g2(bases + 16 * i);
  G2 r = msm_impl<G2, G2A>(b, scalars, n);
  store_affine<Fp2, G2>(out, r, 2);
}

// ---------------------------------------------------------------------------
// batched fixed-base scalar multiplication (CRS generation)
// ---------------------------------------------------------------------------

template <class PT, class AF, class F>
static void fixed_msm_impl(const AF& base, const u64* scalars, i64 n,
                           u64* out, int stride) {
  const int W = 8;                    // 8-bit windows
  const int NW = 32;
  // table[w][k] = k * 2^(8w) * base, affine-ish kept Jacobian
  std::vector<std::vector<PT>> table(NW);
  PT cur;
  cur.X = base.x;
  cur.Y = base.y;
  cur.Z = one_m<F>();
  if (base.inf) cur = PT::inf();
  for (int w = 0; w < NW; w++) {
    table[w].resize(256, PT::inf());
    for (int k = 1; k < 256; k++) table[w][k] = pt_add(table[w][k - 1], cur);
    PT nxt = table[w][255];
    nxt = pt_add(nxt, cur);          // 256 * 2^(8w) * base
    cur = nxt;
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 i = 0; i < n; i++) {
    const u64* s = scalars + 4 * i;
    PT acc = PT::inf();
    for (int w = 0; w < NW; w++) {
      u64 digit = (s[w / 8] >> ((w % 8) * 8)) & 0xFF;
      if (digit) acc = pt_add(acc, table[w][digit]);
    }
    store_affine<F, PT>(out + (i64)stride * i, acc, stride / 8);
  }
}

extern "C" void bn254_g1_fixed_msm(const u64* base, const u64* scalars,
                                   i64 n, u64* out) {
  ensure_init();
  G1A b = load_g1(base);
  fixed_msm_impl<G1, G1A, Fp>(b, scalars, n, out, 8);
}

extern "C" void bn254_g2_fixed_msm(const u64* base, const u64* scalars,
                                   i64 n, u64* out) {
  ensure_init();
  G2A b = load_g2(base);
  fixed_msm_impl<G2, G2A, Fp2>(b, scalars, n, out, 16);
}

// ---------------------------------------------------------------------------
// Fr NTT (radix-2, in place, natural order via bit-reversal)
// ---------------------------------------------------------------------------

extern "C" void bn254_fr_ntt(u64* vec, i64 log_n, i64 inverse) {
  ensure_init();
  i64 n = (i64)1 << log_n;
  std::vector<Fr> a(n);
  for (i64 i = 0; i < n; i++) a[i] = load_fr(vec + 4 * i);
  // bit-reverse
  for (i64 i = 1, j = 0; i < n; i++) {
    i64 bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  Fr root;
  memcpy(root.l, inverse ? FR_ROOT28_INV : FR_ROOT28, 32);
  root = Fr::to_mont(root);
  // scale down to order n
  for (int k = 28; k > log_n; k--) root = Fr::sqr(root);
  std::vector<Fr> ws(n / 2);
  if (n >= 2) {
    ws[0] = Fr::one_mont();
    for (i64 i = 1; i < n / 2; i++) ws[i] = Fr::mul(ws[i - 1], root);
  }
  for (i64 len = 2, half = 1; len <= n; len <<= 1, half <<= 1) {
    i64 step = n / len;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n >= (1 << 14))
#endif
    for (i64 blk = 0; blk < n / len; blk++) {
      i64 base = blk * len;
      for (i64 k = 0; k < half; k++) {
        Fr u = a[base + k];
        Fr v = Fr::mul(a[base + k + half], ws[k * step]);
        a[base + k] = Fr::add(u, v);
        a[base + k + half] = Fr::sub(u, v);
      }
    }
  }
  if (inverse) {
    // multiply by n^-1
    Fr ninv;
    u64 e[4] = {(u64)n, 0, 0, 0};
    Fr nf;
    memcpy(nf.l, e, 32);
    ninv = Fr::inv_mont(Fr::to_mont(nf));
    for (i64 i = 0; i < n; i++) a[i] = Fr::mul(a[i], ninv);
  }
  for (i64 i = 0; i < n; i++) store_fr(vec + 4 * i, a[i]);
}

// ---------------------------------------------------------------------------
// Fr vector ops + sparse R1CS mat-vec
// ---------------------------------------------------------------------------

extern "C" void bn254_fr_vec_mul(const u64* x, const u64* y, u64* out,
                                 i64 n) {
  ensure_init();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 i = 0; i < n; i++) {
    Fr r = Fr::mul(load_fr(x + 4 * i), load_fr(y + 4 * i));
    store_fr(out + 4 * i, r);
  }
}

extern "C" void bn254_fr_vec_sub(const u64* x, const u64* y, u64* out,
                                 i64 n) {
  ensure_init();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 i = 0; i < n; i++) {
    // standard-form add/sub works without Montgomery conversion
    Fr a, b;
    memcpy(a.l, x + 4 * i, 32);
    memcpy(b.l, y + 4 * i, 32);
    Fr r = Fr::sub(a, b);
    memcpy(out + 4 * i, r.l, 32);
  }
}

extern "C" void bn254_fr_vec_scale_powers(u64* x, const u64* s0,
                                          const u64* step, i64 n) {
  // x[i] *= s0 * step^i   (coset shift)
  ensure_init();
  Fr s = load_fr(s0), st = load_fr(step);
  std::vector<Fr> pows(n);
  Fr cur = s;
  for (i64 i = 0; i < n; i++) {
    pows[i] = cur;
    cur = Fr::mul(cur, st);
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 i = 0; i < n; i++) {
    Fr r = Fr::mul(load_fr(x + 4 * i), pows[i]);
    store_fr(x + 4 * i, r);
  }
}

extern "C" void bn254_r1cs_matvec(const i64* indptr, const i64* indices,
                                  const u64* coeffs, const u64* z,
                                  i64 rows, u64* out) {
  ensure_init();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 r = 0; r < rows; r++) {
    Fr acc = Fr::zero();
    for (i64 k = indptr[r]; k < indptr[r + 1]; k++) {
      Fr c, v;
      memcpy(c.l, coeffs + 4 * k, 32);          // Montgomery-form coeffs
      memcpy(v.l, z + 4 * indices[k], 32);      // Montgomery-form witness
      acc = Fr::add(acc, Fr::mul(c, v));
    }
    memcpy(out + 4 * r, acc.l, 32);
  }
}

extern "C" void bn254_fr_to_mont_vec(u64* x, i64 n) {
  ensure_init();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 i = 0; i < n; i++) {
    Fr a;
    memcpy(a.l, x + 4 * i, 32);
    a = Fr::to_mont(a);
    memcpy(x + 4 * i, a.l, 32);
  }
}

extern "C" void bn254_fr_from_mont_vec(u64* x, i64 n) {
  ensure_init();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 i = 0; i < n; i++) {
    Fr a;
    memcpy(a.l, x + 4 * i, 32);
    a = Fr::from_mont(a);
    memcpy(x + 4 * i, a.l, 32);
  }
}
