// zklc_tpu native host kernels (C++), loaded via ctypes.
//
// TPU-native framework split: the device (JAX/XLA/Pallas) owns the regular
// bulk math (NTT/LDE, Merkle, quotient); this library owns the *host* side
// that the reference implements in Rust+rayon (SURVEY.md §2.1 — plonky2's
// field ops, Poseidon transcript hashing, Merkle fallbacks, batch inversion),
// replacing Python/numpy inner loops on the proving critical path.
//
// Everything is plain C ABI over uint64 arrays; Python wrappers live in
// zklc_tpu/native/__init__.py.
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "poseidon_constants.inc"

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef int64_t i64;

static const u64 P = 0xFFFFFFFF00000001ull;  // Goldilocks 2^64 - 2^32 + 1
static const u64 EPS = 0xFFFFFFFFull;        // 2^64 mod p

static inline u64 gl_add1(u64 a, u64 b) {
  u64 s = a + b;
  if (s < a) s += EPS;           // wrapped: add 2^64 mod p
  if (s >= P) s -= P;
  return s;
}

static inline u64 gl_sub1(u64 a, u64 b) {
  u64 d = a - b;
  if (a < b) d -= EPS;
  return d;
}

static inline u64 gl_reduce128(u128 x) {
  u64 lo = (u64)x;
  u64 hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32;
  u64 hi_lo = hi & 0xFFFFFFFFull;
  u64 t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= EPS;
  u64 t1 = hi_lo * EPS;
  u64 t2 = t0 + t1;
  if (t2 < t1) t2 += EPS;
  if (t2 >= P) t2 -= P;
  return t2;
}

static inline u64 gl_mul1(u64 a, u64 b) {
  return gl_reduce128((u128)a * (u128)b);
}

static inline u64 gl_pow(u64 a, u64 e) {
  u64 r = 1, base = a;
  while (e) {
    if (e & 1) r = gl_mul1(r, base);
    base = gl_mul1(base, base);
    e >>= 1;
  }
  return r;
}

static inline u64 gl_inv1(u64 a) { return gl_pow(a, P - 2); }

extern "C" {

// ---------------------------------------------------------------- vectors --
void gl_add(const u64* a, const u64* b, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gl_add1(a[i], b[i]);
}
void gl_sub(const u64* a, const u64* b, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gl_sub1(a[i], b[i]);
}
void gl_mul(const u64* a, const u64* b, u64* out, i64 n) {
#pragma omp parallel for if (n > 1 << 16)
  for (i64 i = 0; i < n; i++) out[i] = gl_mul1(a[i], b[i]);
}
void gl_mul_scalar(const u64* a, u64 s, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gl_mul1(a[i], s);
}
// out = a*b + c (fused, one reduction after the add in 128-bit)
void gl_mul_add(const u64* a, const u64* b, const u64* c, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++)
    out[i] = gl_reduce128((u128)a[i] * (u128)b[i] + (u128)c[i]);
}

void gl_cumprod(const u64* a, u64* out, i64 n) {
  u64 acc = 1;
  for (i64 i = 0; i < n; i++) {
    acc = gl_mul1(acc, a[i]);
    out[i] = acc;
  }
}

// Montgomery batch inversion; inv(0) -> 0 handled by caller convention
// (zeros propagate garbage — callers must not pass zeros, same as the
// numpy path).
void gl_batch_inverse(const u64* a, u64* out, i64 n) {
  if (n == 0) return;
  std::vector<u64> prefix((size_t)n);
  u64 acc = 1;
  for (i64 i = 0; i < n; i++) {
    prefix[(size_t)i] = acc;
    acc = gl_mul1(acc, a[i]);
  }
  u64 acc_inv = gl_inv1(acc);
  for (i64 i = n - 1; i >= 0; i--) {
    out[i] = gl_mul1(acc_inv, prefix[(size_t)i]);
    acc_inv = gl_mul1(acc_inv, a[i]);
  }
}

void gl_powers(u64 base, u64* out, i64 n) {
  u64 acc = 1;
  for (i64 i = 0; i < n; i++) {
    out[i] = acc;
    acc = gl_mul1(acc, base);
  }
}

// ------------------------------------------------------------------- NTT --
// In-place iterative radix-2 DIT NTT over rows. data: (rows, n) row-major.
// twiddles: the caller passes root w of order n (forward) or its inverse;
// scaling by 1/n for the inverse transform is done by the caller.
static void bit_reverse_row(u64* row, int log_n) {
  i64 n = (i64)1 << log_n;
  for (i64 i = 0; i < n; i++) {
    i64 j = 0;
    i64 x = i;
    for (int b = 0; b < log_n; b++) { j = (j << 1) | (x & 1); x >>= 1; }
    if (j > i) { u64 t = row[i]; row[i] = row[j]; row[j] = t; }
  }
}

void gl_ntt(u64* data, i64 rows, int log_n, u64 root) {
  // rows transform independently (parallel below).
  i64 n = (i64)1 << log_n;
  // twiddle table: w^0..w^(n/2-1)
  std::vector<u64> tw((size_t)(n >> 1));
  {
    u64 acc = 1;
    for (i64 i = 0; i < (n >> 1); i++) { tw[(size_t)i] = acc; acc = gl_mul1(acc, root); }
  }
#pragma omp parallel for if (rows > 1)
  for (i64 r = 0; r < rows; r++) {
    u64* row = data + r * n;
    bit_reverse_row(row, log_n);
    for (int s = 1; s <= log_n; s++) {
      i64 m = (i64)1 << s;
      i64 half = m >> 1;
      i64 tstep = n >> s;
      for (i64 k = 0; k < n; k += m) {
        for (i64 j = 0; j < half; j++) {
          u64 w = tw[(size_t)(j * tstep)];
          u64 t = gl_mul1(w, row[k + j + half]);
          u64 u = row[k + j];
          row[k + j] = gl_add1(u, t);
          row[k + j + half] = gl_sub1(u, t);
        }
      }
    }
  }
}

// --------------------------------------------------------------- Poseidon --
static const int W = 12;
static u64 MDS_M[12][12];
static bool mds_init_done = false;

static void mds_init() {
  if (mds_init_done) return;
  for (int r = 0; r < W; r++) {
    for (int i = 0; i < W; i++)
      MDS_M[r][i] = POS_MDS_CIRC[((i - r) % W + W) % W];
    MDS_M[r][r] += POS_MDS_DIAG[r];
  }
  mds_init_done = true;
}

static inline u64 sbox7(u64 x) {
  u64 x2 = gl_mul1(x, x);
  u64 x3 = gl_mul1(x2, x);
  u64 x6 = gl_mul1(x3, x3);
  return gl_mul1(x6, x);
}

static inline void mds_layer(const u64* st, u64* out) {
  for (int r = 0; r < W; r++) {
    u128 acc = 0;
    // coefficients are small (< 2^5); products < 2^69; 12 of them < 2^73.
    for (int i = 0; i < W; i++) acc += (u128)MDS_M[r][i] * st[i];
    out[r] = gl_reduce128(acc);
  }
}

static void poseidon_permute1(u64* st) {
  mds_init();
  u64 tmp[12];
  int rc = 0;
  for (int fr = 0; fr < 4; fr++) {
    for (int i = 0; i < W; i++) st[i] = sbox7(gl_add1(st[i], POS_RC[12 * rc + i]));
    mds_layer(st, tmp);
    std::memcpy(st, tmp, sizeof(tmp));
    rc++;
  }
  for (int pr = 0; pr < 22; pr++) {
    for (int i = 0; i < W; i++) st[i] = gl_add1(st[i], POS_RC[12 * rc + i]);
    st[0] = sbox7(st[0]);
    mds_layer(st, tmp);
    std::memcpy(st, tmp, sizeof(tmp));
    rc++;
  }
  for (int fr = 0; fr < 4; fr++) {
    for (int i = 0; i < W; i++) st[i] = sbox7(gl_add1(st[i], POS_RC[12 * rc + i]));
    mds_layer(st, tmp);
    std::memcpy(st, tmp, sizeof(tmp));
    rc++;
  }
}

void poseidon_permute_batch(u64* states, i64 n) {
  mds_init();
#pragma omp parallel for if (n > 512)
  for (i64 i = 0; i < n; i++) poseidon_permute1(states + i * W);
}

// plonky2 hash_n_to_m_no_pad with 4 outputs.
void poseidon_hash_no_pad(const u64* in, i64 len, u64* out4) {
  u64 st[12] = {0};
  for (i64 start = 0; start < len; start += 8) {
    i64 c = len - start < 8 ? len - start : 8;
    for (i64 i = 0; i < c; i++) st[i] = in[start + i] % P;
    poseidon_permute1(st);
  }
  for (int i = 0; i < 4; i++) out4[i] = st[i];
}

// Batched leaf hashing: rows (n, row_len) -> digests (n, 4) via
// hash_or_noop semantics (row_len <= 4 copies through).
void poseidon_hash_leaves(const u64* rows, i64 n, i64 row_len, u64* out) {
  if (row_len <= 4) {
    for (i64 r = 0; r < n; r++) {
      for (int i = 0; i < 4; i++)
        out[r * 4 + i] = i < row_len ? rows[r * row_len + i] : 0;
    }
    return;
  }
  mds_init();
#pragma omp parallel for if (n > 512)
  for (i64 r = 0; r < n; r++)
    poseidon_hash_no_pad(rows + r * row_len, row_len, out + r * 4);
}

// One Merkle level: digests (2m, 4) -> parents (m, 4) via two_to_one.
void poseidon_merkle_level(const u64* digests, u64* out, i64 m) {
  mds_init();
#pragma omp parallel for if (m > 512)
  for (i64 i = 0; i < m; i++) {
    u64 st[12] = {0};
    std::memcpy(st, digests + (2 * i) * 4, 4 * sizeof(u64));
    std::memcpy(st + 4, digests + (2 * i + 1) * 4, 4 * sizeof(u64));
    poseidon_permute1(st);
    std::memcpy(out + i * 4, st, 4 * sizeof(u64));
  }
}

// FRI proof-of-work grind: find witness w such that duplexing the
// challenger state with [buf..., w] gives a challenge (squeezed from
// state[7]) with >= pow_bits leading zero bits.  Mirrors the duplex
// discipline of hash/poseidon.py Challenger (itself the reference
// verifier's transcript, gnark-plonky2-verifier/challenger/challenger.go).
u64 poseidon_grind(const u64* base_state, const u64* buf, i64 nbuf,
                   int pow_bits) {
  u64 threshold = pow_bits >= 64 ? 0 : (u64)1 << (64 - pow_bits);
  for (u64 cand = 0;; cand++) {
    u64 st[12];
    std::memcpy(st, base_state, sizeof(st));
    for (i64 i = 0; i < nbuf; i++) st[i] = buf[i];
    st[nbuf] = cand;
    poseidon_permute1(st);
    if (st[7] < threshold) return cand;
  }
}

// ---------------------------------------------------------- witness tape --
// Typed witness-generation VM.  The Python builder compiles each circuit's
// generator list into a flat instruction tape (see plonk/witness_tape.py);
// this executor runs the typed opcodes natively and returns control to
// Python only at PYTHON-opcode instructions (gadget hints doing big-int
// math).  Replaces the per-generator Python worklist of plonk/witness.py on
// the proving critical path — the equivalent of plonky2's SimpleGenerator
// scheduling (reference: crypto/plonky2_u32/src/gates/*.rs generators).

enum WitOp {
  OP_PYTHON = 0,
  OP_ARITH = 1,          // params [c0, c1]; deps [x,y,z]; outs [c0*x*y+c1*z]
  OP_BASE_SUM = 2,       // params [base, n]; deps [x]; outs [n digits LE]
  OP_RANDOM_ACCESS = 3,  // params [bits]; deps [idx, items...]; outs [bits LE..., claimed]
  OP_POSEIDON = 4,       // deps [12 in, swap]; outs [4+36+22+48+12 trace]
  OP_IS_EQUAL = 5,       // deps [diff]; outs [b, m]
  OP_U32_ARITH = 6,      // deps [m0,m1,ad]; outs [lo,hi,inv,32 limbs]
  OP_U32_ADDMANY = 7,    // deps [addends...,carry]; outs [res,carry,18 limbs]
  OP_U32_SUB = 8,        // deps [x,y,borrow]; outs [res,ob,16 limbs]
  OP_U32_RANGECHECK = 9, // deps [x]; outs [16 aux limbs]
  OP_U32_INTERLEAVE = 10,// deps [x]; outs [inter, 32 bits BE]
  OP_UNINTERLEAVE = 11,  // params [spread]; deps [x]; outs [evens,odds,64 bits BE]
  OP_CONSTANTS = 12,     // params [values...]; outs [those values]
  OP_FFMUL = 13,         // foreign-field mul gate hint (gates_lookup.py)
  OP_FFADD = 14,         // foreign-field add/sub gate hint
  OP_LK_RANGE = 15,      // u32 -> two 16-bit lane pieces
};

// ------------------------------------------------- multiword (u32 limbs) --
typedef uint32_t u32l;

static void mw_mul(const u32l* a, int na, const u32l* b, int nb, u32l* out) {
  // out[na+nb] = a * b, schoolbook
  std::memset(out, 0, sizeof(u32l) * (na + nb));
  for (int i = 0; i < na; i++) {
    u64 carry = 0;
    for (int j = 0; j < nb; j++) {
      u128 cur = (u128)a[i] * b[j] + out[i + j] + carry;
      out[i + j] = (u32l)cur;
      carry = (u64)(cur >> 32);
    }
    int k = i + nb;
    while (carry) {
      u128 cur = (u128)out[k] + carry;
      out[k] = (u32l)cur;
      carry = (u64)(cur >> 32);
      k++;
    }
  }
}

static int mw_cmp(const u32l* a, const u32l* b, int n) {
  for (int i = n - 1; i >= 0; i--) {
    if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
  }
  return 0;
}

static void mw_sub(u32l* a, const u32l* b, int n) {  // a -= b (a >= b)
  int64_t borrow = 0;
  for (int i = 0; i < n; i++) {
    int64_t d = (int64_t)a[i] - (int64_t)b[i] - borrow;
    borrow = d < 0;
    a[i] = (u32l)(d + (borrow << 32));
  }
}

static void mw_add1(u32l* a, int n) {  // a += 1
  for (int i = 0; i < n; i++) {
    if (++a[i]) break;
  }
}

// Foreign-field mul hint: given a, b (8 u32 limbs each, < 2^256) and
// modulus data in params, produce the full ForeignFieldMulGate witness.
// params layout: m16[16] | mm16[16] | m32[8] | mu32[17]
//   (mu = floor(2^512 / m) — Barrett constant; q_hat = floor(a*b*mu/2^512)
//    is within 2 of the true quotient, corrected by a subtract loop).
// outs: r32[8] a16[16] b16[16] q16[16] r16[16] clo[30] chi[30] d[16] bor[16]
static bool ffmul_hint(const u64* dv, const u64* par, u64* ov) {
  const u64* m16 = par;
  const u64* mm16 = par + 16;
  const u64* m32p = par + 32;
  const u64* mu_p = par + 40;
  u32l a[8], b[8], m[8], mu[17];
  for (int i = 0; i < 8; i++) a[i] = (u32l)dv[i];
  for (int i = 0; i < 8; i++) b[i] = (u32l)dv[8 + i];
  for (int i = 0; i < 8; i++) m[i] = (u32l)m32p[i];
  for (int i = 0; i < 17; i++) mu[i] = (u32l)mu_p[i];

  u32l t[16];
  mw_mul(a, 8, b, 8, t);                     // t = a*b, 512 bits
  u32l tmu[33];
  mw_mul(t, 16, mu, 17, tmu);                // t * mu
  u32l q[9];                                  // q_hat = tmu >> 512
  for (int i = 0; i < 9; i++) q[i] = (i + 16 < 33) ? tmu[i + 16] : 0;
  // r = t - q*m  (fits in 9 words during correction)
  u32l qm[17];
  mw_mul(q, 9, m, 8, qm);
  u32l r[17];
  int64_t borrow = 0;
  for (int i = 0; i < 16; i++) {
    int64_t d = (int64_t)t[i] - (int64_t)qm[i] - borrow;
    borrow = d < 0;
    r[i] = (u32l)(d + (borrow << 32));
  }
  r[16] = (u32l)(0 - (u32l)qm[16] - (u32l)borrow);
  if (borrow && qm[16] == 0) return false;   // q_hat too large: impossible
  u32l m9[9];
  for (int i = 0; i < 8; i++) m9[i] = m[i];
  m9[8] = 0;
  int guard = 0;
  while (r[8] != 0 || mw_cmp(r, m9, 9) >= 0) {
    mw_sub(r, m9, 9);
    mw_add1(q, 9);
    if (++guard > 4) return false;
  }
  if (q[8] != 0) return false;               // q must fit 256 bits

  int o = 0;
  for (int i = 0; i < 8; i++) ov[o++] = r[i];                 // r32
  u64 a16[16], b16[16], q16[16], r16[16];
  for (int i = 0; i < 8; i++) {
    a16[2 * i] = a[i] & 0xFFFF;  a16[2 * i + 1] = a[i] >> 16;
    b16[2 * i] = b[i] & 0xFFFF;  b16[2 * i + 1] = b[i] >> 16;
    q16[2 * i] = q[i] & 0xFFFF;  q16[2 * i + 1] = q[i] >> 16;
    r16[2 * i] = r[i] & 0xFFFF;  r16[2 * i + 1] = r[i] >> 16;
  }
  for (int i = 0; i < 16; i++) ov[o++] = a16[i];
  for (int i = 0; i < 16; i++) ov[o++] = b16[i];
  for (int i = 0; i < 16; i++) ov[o++] = q16[i];
  for (int i = 0; i < 16; i++) ov[o++] = r16[i];
  // conv carries
  const i64 SHIFT = 1ll << 21;
  i64 carry = 0;
  i64 clo[30], chi[30];
  for (int k = 0; k < 30; k++) {
    i64 d = (k < 16) ? -(i64)r16[k] : 0;
    int lo_i = k - 15 < 0 ? 0 : k - 15;
    int hi_i = k + 1 < 16 ? k + 1 : 16;
    for (int i = lo_i; i < hi_i; i++) {
      d += (i64)a16[i] * (i64)b16[k - i];
      d -= (i64)q16[i] * (i64)m16[k - i];
    }
    i64 v = d + carry;
    if (v & 0xFFFF) return false;            // non-exact 16-bit carry
    carry = v >> 16;
    i64 sh = carry + SHIFT;
    if (sh < 0 || sh >= (1ll << 22)) return false;
    clo[k] = sh & 0xFFFF;
    chi[k] = sh >> 16;
  }
  for (int k = 0; k < 30; k++) ov[o++] = (u64)clo[k];
  for (int k = 0; k < 30; k++) ov[o++] = (u64)chi[k];
  // r < m borrow chain
  i64 prev = 0;
  u64 dlo[16], bor[16];
  for (int k = 0; k < 16; k++) {
    i64 tt = (i64)mm16[k] - (i64)r16[k] - prev;
    prev = tt < 0;
    dlo[k] = (u64)(tt + (prev << 16));
    bor[k] = (u64)prev;
  }
  for (int k = 0; k < 16; k++) ov[o++] = dlo[k];
  for (int k = 0; k < 16; k++) ov[o++] = bor[k];
  return true;
}

// Foreign-field add/sub hint.  params: sub_flag | m32[8] | mm16[16].
// deps: a32[8] b32[8].  outs: r32[8] q c[7] r16[16] d[16] bor[16]
static bool ffadd_hint(const u64* dv, const u64* par, u64* ov) {
  bool sub = par[0] != 0;
  const u64* m32p = par + 1;
  const u64* mm16 = par + 9;
  u32l a[8], b[8], m[8], r[8];
  for (int i = 0; i < 8; i++) a[i] = (u32l)dv[i];
  for (int i = 0; i < 8; i++) b[i] = (u32l)dv[8 + i];
  for (int i = 0; i < 8; i++) m[i] = (u32l)m32p[i];
  u64 q;
  if (sub) {
    q = mw_cmp(a, b, 8) < 0 ? 1 : 0;
    // r = a - b + q*m
    int64_t carry = 0;
    for (int i = 0; i < 8; i++) {
      int64_t d = (int64_t)a[i] - (int64_t)b[i] +
                  (q ? (int64_t)m[i] : 0) + carry;
      carry = d >> 32;                        // arithmetic shift
      r[i] = (u32l)d;
    }
    if (carry != 0) return false;
  } else {
    u32l s[9];
    u64 carry = 0;
    for (int i = 0; i < 8; i++) {
      u64 d = (u64)a[i] + b[i] + carry;
      s[i] = (u32l)d;
      carry = d >> 32;
    }
    s[8] = (u32l)carry;
    u32l m9[9];
    for (int i = 0; i < 8; i++) m9[i] = m[i];
    m9[8] = 0;
    q = (s[8] != 0 || mw_cmp(s, m9, 9) >= 0) ? 1 : 0;
    if (q) mw_sub(s, m9, 9);
    if (s[8] != 0) return false;
    for (int i = 0; i < 8; i++) r[i] = s[i];
  }
  int o = 0;
  for (int i = 0; i < 8; i++) ov[o++] = r[i];
  ov[o++] = q;
  // limb-granularity carries for the gate's 8 limb equations (c0..c6)
  i64 carry = 0;
  for (int j = 0; j < 8; j++) {
    i64 mj = q ? (i64)m[j] : 0;
    i64 d = sub ? (i64)a[j] - (i64)b[j] + mj - (i64)r[j] + carry
                : (i64)a[j] + (i64)b[j] - mj - (i64)r[j] + carry;
    if (d & 0xFFFFFFFFll) return false;
    carry = d >> 32;
    if (j < 7) ov[o++] = carry >= 0 ? (u64)carry : (u64)(P + carry);
  }
  if (carry != 0) return false;
  u64 r16[16];
  for (int i = 0; i < 8; i++) {
    r16[2 * i] = r[i] & 0xFFFF;
    r16[2 * i + 1] = r[i] >> 16;
  }
  for (int i = 0; i < 16; i++) ov[o++] = r16[i];
  i64 prev = 0;
  for (int k = 0; k < 16; k++) {
    i64 tt = (i64)mm16[k] - (i64)r16[k] - prev;
    prev = tt < 0;
    ov[o + k] = (u64)(tt + (prev << 16));
    ov[o + 16 + k] = (u64)prev;
  }
  return true;
}

struct WitCtx {
  u64* values;
  uint8_t* known;
};

static inline bool wit_set(WitCtx& c, int32_t idx, u64 v) {
  if (c.known[idx]) return c.values[idx] == v;
  c.values[idx] = v;
  c.known[idx] = 1;
  return true;
}

// Poseidon fast-partial-round witness trace (must match
// hash/poseidon.py permute_fast intermediates and PoseidonGate wire order).
static void poseidon_trace(const u64* in13, u64* outs) {
  mds_init();
  u64 st[12];
  u64 swap = in13[12];
  int o = 0;
  for (int i = 0; i < 4; i++) {
    u64 d = gl_mul1(swap, gl_sub1(in13[i + 4], in13[i]));
    outs[o++] = d;  // deltas
    st[i] = gl_add1(in13[i], d);
    st[i + 4] = gl_sub1(in13[i + 4], d);
  }
  for (int i = 8; i < 12; i++) st[i] = in13[i];
  u64 tmp[12];
  int rc = 0;
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 12; i++) st[i] = gl_add1(st[i], POS_RC[12 * rc + i]);
    if (r != 0)
      for (int i = 0; i < 12; i++) outs[o++] = st[i];  // full0 sbox inputs
    for (int i = 0; i < 12; i++) st[i] = sbox7(st[i]);
    mds_layer(st, tmp);
    std::memcpy(st, tmp, sizeof(st));
    rc++;
  }
  // partial_first_constant_layer + mds_partial_layer_init
  for (int i = 0; i < 12; i++) st[i] = gl_add1(st[i], POS_FP_FIRST[i]);
  tmp[0] = st[0];
  for (int d = 1; d < 12; d++) tmp[d] = 0;
  for (int r = 1; r < 12; r++)
    for (int d = 1; d < 12; d++)
      tmp[d] = gl_add1(tmp[d], gl_mul1(st[r], POS_FP_INIT[(r - 1) * 11 + (d - 1)]));
  std::memcpy(st, tmp, sizeof(st));
  for (int r = 0; r < 22; r++) {
    outs[o++] = st[0];  // partial sbox input
    u64 s0 = gl_add1(sbox7(st[0]), POS_FP_RC[r]);
    // mds_partial_layer_fast
    u128 dsum = (u128)gl_mul1(s0, 25 /* MDS0TO0 */);
    for (int i = 1; i < 12; i++)
      dsum += (u128)gl_mul1(st[i], POS_FP_WHATS[r * 11 + (i - 1)]);
    tmp[0] = gl_reduce128(dsum);
    for (int i = 1; i < 12; i++)
      tmp[i] = gl_add1(st[i], gl_mul1(s0, POS_FP_VS[r * 11 + (i - 1)]));
    std::memcpy(st, tmp, sizeof(st));
  }
  rc += 22;
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 12; i++) st[i] = gl_add1(st[i], POS_RC[12 * rc + i]);
    for (int i = 0; i < 12; i++) outs[o++] = st[i];  // full1 sbox inputs
    for (int i = 0; i < 12; i++) st[i] = sbox7(st[i]);
    mds_layer(st, tmp);
    std::memcpy(st, tmp, sizeof(st));
    rc++;
  }
  for (int i = 0; i < 12; i++) outs[o++] = st[i];  // outputs
}

// Returns: index of next PYTHON instruction (caller executes it and calls
// back with start = idx+1), n_instr when done, or -(i+1) on a write
// conflict at instruction i.
i64 wit_execute_impl(
    const int32_t* op, const i64* dep_off, const int32_t* dep_cnt,
    const i64* out_off, const int32_t* out_cnt,
    const i64* par_off, const int32_t* par_cnt,
    const int32_t* deps_pool, const int32_t* outs_pool,
    const u64* params_pool, u64* values, uint8_t* known,
    i64 n_instr, i64 start) {
  WitCtx ctx{values, known};
  u64 dv[256];
  u64 ov[256];
  for (i64 i = start; i < n_instr; i++) {
    int32_t o = op[i];
    if (o == OP_PYTHON) return i;
    const int32_t* dix = deps_pool + dep_off[i];
    const int32_t* oix = outs_pool + out_off[i];
    const u64* par = params_pool + par_off[i];
    int nd = dep_cnt[i];
    int no = out_cnt[i];
    for (int k = 0; k < nd; k++) dv[k] = values[dix[k]];
    switch (o) {
      case OP_ARITH:
        ov[0] = gl_add1(gl_mul1(gl_mul1(dv[0], dv[1]), par[0]),
                        gl_mul1(dv[2], par[1]));
        break;
      case OP_BASE_SUM: {
        u64 x = dv[0];
        u64 base = par[0];
        for (int k = 0; k < no; k++) { ov[k] = x % base; x /= base; }
        break;
      }
      case OP_RANDOM_ACCESS: {
        int bits = (int)par[0];
        u64 idx = dv[0];
        for (int k = 0; k < bits; k++) ov[k] = (idx >> k) & 1;
        ov[bits] = dv[1 + (int)idx];
        break;
      }
      case OP_POSEIDON:
        poseidon_trace(dv, ov);
        break;
      case OP_IS_EQUAL: {
        u64 d = dv[0] % P;
        if (d == 0) { ov[0] = 1; ov[1] = 0; }
        else { ov[0] = 0; ov[1] = gl_inv1(d); }
        break;
      }
      case OP_U32_ARITH: {
        u128 total = (u128)dv[0] * (u128)dv[1] + (u128)dv[2];
        u64 lo = (u64)(total & 0xFFFFFFFFull);
        u64 hi = (u64)(total >> 32);
        ov[0] = lo;
        ov[1] = hi;
        ov[2] = hi == 0xFFFFFFFFull ? 0 : gl_inv1(0xFFFFFFFFull - hi);
        for (int j = 0; j < 32; j++) ov[3 + j] = (u64)((total >> (2 * j)) & 3);
        break;
      }
      case OP_U32_ADDMANY: {
        u64 total = 0;
        for (int k = 0; k < nd; k++) total += dv[k];
        ov[0] = total & 0xFFFFFFFFull;
        ov[1] = total >> 32;
        for (int j = 0; j < 18; j++) ov[2 + j] = (total >> (2 * j)) & 3;
        break;
      }
      case OP_U32_SUB: {
        int64_t diff = (int64_t)dv[0] - (int64_t)dv[1] - (int64_t)dv[2];
        u64 ob = diff < 0 ? 1 : 0;
        u64 res = (u64)(diff + ((int64_t)ob << 32));
        ov[0] = res;
        ov[1] = ob;
        for (int j = 0; j < 16; j++) ov[2 + j] = (res >> (2 * j)) & 3;
        break;
      }
      case OP_U32_RANGECHECK: {
        u64 x = dv[0];
        for (int j = 0; j < 16; j++) ov[j] = (x >> (2 * j)) & 3;
        break;
      }
      case OP_U32_INTERLEAVE: {
        u64 x = dv[0];
        u64 inter = 0;
        for (int b = 0; b < 32; b++) inter |= ((x >> b) & 1) << (2 * b);
        ov[0] = inter;
        for (int j = 0; j < 32; j++) ov[1 + j] = (x >> (31 - j)) & 1;
        break;
      }
      case OP_UNINTERLEAVE: {
        u64 x = dv[0] % P;
        bool spread = par[0] != 0;
        u64 evens = 0, odds = 0;
        for (int j = 0; j < 32; j++) {
          int sh = spread ? 2 * (31 - j) : (31 - j);
          evens += ((x >> (63 - 2 * j)) & 1) << sh;
          odds += ((x >> (62 - 2 * j)) & 1) << sh;
        }
        ov[0] = evens;
        ov[1] = odds;
        for (int j = 0; j < 64; j++) ov[2 + j] = (x >> (63 - j)) & 1;
        break;
      }
      case OP_CONSTANTS:
        for (int k = 0; k < no; k++) ov[k] = params_pool[par_off[i] + k];
        break;
      case OP_FFMUL:
        if (!ffmul_hint(dv, par, ov)) return -(i + 1);
        break;
      case OP_FFADD:
        if (!ffadd_hint(dv, par, ov)) return -(i + 1);
        break;
      case OP_LK_RANGE:
        if (dv[0] >> 32) return -(i + 1);
        ov[0] = dv[0] & 0xFFFF;
        ov[1] = dv[0] >> 16;
        break;
      default:
        return -(i + 1);
    }
    (void)par_cnt;
    for (int k = 0; k < no; k++)
      if (!wit_set(ctx, oix[k], ov[k])) return -(i + 1);
  }
  return n_instr;
}

extern "C" i64 wit_execute(
    const int32_t* op, const i64* dep_off, const int32_t* dep_cnt,
    const i64* out_off, const int32_t* out_cnt,
    const i64* par_off, const int32_t* par_cnt,
    const int32_t* deps_pool, const int32_t* outs_pool,
    const u64* params_pool, u64* values, uint8_t* known,
    i64 n_instr, i64 start) {
  return wit_execute_impl(op, dep_off, dep_cnt, out_off, out_cnt, par_off,
                          par_cnt, deps_pool, outs_pool, params_pool, values,
                          known, n_instr, start);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// BN254-Fr Poseidon (the wrap-proof transcript hasher): Montgomery 4x64
// arithmetic + the iden3 permutation, mirroring
// zklc_tpu/hash/poseidon_bn128.py (itself bit-exact vs
// crypto/plonky2_bn128/src/poseidon_bn128.rs:18).  Batched leaf hashing and
// Merkle levels make the BN128-transcript prover's commitment phase native.
// ---------------------------------------------------------------------------
#include "bn128_constants.inc"

struct Fr { u64 l[4]; };

static inline Fr fr_load(const u64* p) { Fr r; for (int i = 0; i < 4; i++) r.l[i] = p[i]; return r; }
static inline void fr_store(u64* p, const Fr& a) { for (int i = 0; i < 4; i++) p[i] = a.l[i]; }

static inline bool fr_geq_p(const Fr& a) {
  for (int i = 3; i >= 0; i--) {
    if (a.l[i] > FR_P[i]) return true;
    if (a.l[i] < FR_P[i]) return false;
  }
  return true;  // equal
}

static inline void fr_sub_p(Fr& a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a.l[i] - FR_P[i] - (u64)borrow;
    a.l[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline Fr fr_add(const Fr& a, const Fr& b) {
  Fr r; u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a.l[i] + b.l[i] + (u64)carry;
    r.l[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || fr_geq_p(r)) fr_sub_p(r);
  return r;
}

// CIOS Montgomery multiplication (R = 2^256).
static inline Fr fr_mont_mul(const Fr& a, const Fr& b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)t[j] + (u128)a.l[i] * b.l[j] + (u64)carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + (u64)carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);
    u64 m = t[0] * FR_N0INV;
    carry = ((u128)t[0] + (u128)m * FR_P[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 c2 = (u128)t[j] + (u128)m * FR_P[j] + (u64)carry;
      t[j - 1] = (u64)c2;
      carry = c2 >> 64;
    }
    cur = (u128)t[4] + (u64)carry;
    t[3] = (u64)cur;
    t[4] = t[5] + (u64)(cur >> 64);
  }
  Fr r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || fr_geq_p(r)) fr_sub_p(r);
  return r;
}

static inline Fr fr_to_mont(const Fr& a) { return fr_mont_mul(a, fr_load(FR_R2)); }
static inline Fr fr_from_mont(const Fr& a) { Fr one = {{1, 0, 0, 0}}; return fr_mont_mul(a, one); }

static inline Fr fr_exp5(const Fr& x) {
  Fr x2 = fr_mont_mul(x, x);
  Fr x4 = fr_mont_mul(x2, x2);
  return fr_mont_mul(x4, x);
}

static inline void bn_ark(Fr st[4], int it) {
  for (int i = 0; i < 4; i++) st[i] = fr_add(st[i], fr_load(BN_C[it + i]));
}

// out[i] = sum_j matrix[j][i] * st[j]; matrix given row-major (j*4 + i).
static inline void bn_mix(Fr st[4], const u64 (*m)[4]) {
  Fr out[4];
  for (int i = 0; i < 4; i++) {
    Fr acc = {{0, 0, 0, 0}};
    for (int j = 0; j < 4; j++)
      acc = fr_add(acc, fr_mont_mul(fr_load(m[j * 4 + i]), st[j]));
    out[i] = acc;
  }
  for (int i = 0; i < 4; i++) st[i] = out[i];
}

// Montgomery-domain permutation (poseidon_bn128.py permute_bn128).
static void bn128_permute(Fr st[4]) {
  const int W = 4, FULL = 8, PARTIAL = 56;
  bn_ark(st, 0);
  for (int i = 0; i < FULL / 2 - 1; i++) {
    for (int k = 0; k < W; k++) st[k] = fr_exp5(st[k]);
    bn_ark(st, (i + 1) * W);
    bn_mix(st, BN_M);
  }
  for (int k = 0; k < W; k++) st[k] = fr_exp5(st[k]);
  bn_ark(st, (FULL / 2) * W);
  bn_mix(st, BN_P);
  for (int i = 0; i < PARTIAL; i++) {
    Fr s0 = fr_exp5(st[0]);
    s0 = fr_add(s0, fr_load(BN_C[(FULL / 2 + 1) * W + i]));
    st[0] = s0;
    int base = (W * 2 - 1) * i;
    Fr new0 = {{0, 0, 0, 0}};
    for (int j = 0; j < W; j++)
      new0 = fr_add(new0, fr_mont_mul(fr_load(BN_S[base + j]), st[j]));
    for (int k = 1; k < W; k++)
      st[k] = fr_add(st[k], fr_mont_mul(st[0], fr_load(BN_S[base + W + k - 1])));
    st[0] = new0;
  }
  for (int i = 0; i < FULL / 2 - 1; i++) {
    for (int k = 0; k < W; k++) st[k] = fr_exp5(st[k]);
    bn_ark(st, (FULL / 2 + 1) * W + PARTIAL + i * W);
    bn_mix(st, BN_M);
  }
  for (int k = 0; k < W; k++) st[k] = fr_exp5(st[k]);
  bn_mix(st, BN_M);
}

// Pack up to 3 Goldilocks u64s into one standard-form Fr (< 2^192 < p).
static inline Fr fr_pack_gl(const u64* gl, int n) {
  Fr r = {{0, 0, 0, 0}};
  for (int k = 0; k < n && k < 3; k++) r.l[k] = gl[k];
  return r;
}

extern "C" {

// Standard-form Fr state (4x4 u64 LE limbs) -> permuted, standard form.
void bn128_permute_batch(u64* states, i64 n) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 r = 0; r < n; r++) {
    Fr st[4];
    for (int i = 0; i < 4; i++) st[i] = fr_to_mont(fr_load(states + r * 16 + i * 4));
    bn128_permute(st);
    for (int i = 0; i < 4; i++) fr_store(states + r * 16 + i * 4, fr_from_mont(st[i]));
  }
}

// leaves (n, L) u64 GL values -> out (n, 4) Fr limbs (HashOrNoop semantics:
// L <= 3 packs base-2^64 without permuting; else sponge, 9 GL per permute).
void bn128_hash_leaves(const u64* leaves, i64 n, i64 L, u64* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 r = 0; r < n; r++) {
    const u64* row = leaves + r * L;
    if (L <= 3) {
      fr_store(out + r * 4, fr_pack_gl(row, (int)L));
      continue;
    }
    Fr st[4] = {{{0, 0, 0, 0}}, {{0, 0, 0, 0}}, {{0, 0, 0, 0}}, {{0, 0, 0, 0}}};
    for (i64 start = 0; start < L; start += 9) {
      for (int lane = 0; lane < 3; lane++) {
        i64 off = start + lane * 3;
        if (off >= L) break;
        int cnt = (int)((L - off) < 3 ? (L - off) : 3);
        st[1 + lane] = fr_to_mont(fr_pack_gl(row + off, cnt));
      }
      bn128_permute(st);
    }
    fr_store(out + r * 4, fr_from_mont(st[0]));
  }
}

// digests (n, 4) standard-form Fr -> parents (n/2, 4): permute([0,0,L,R])[0].
void bn128_merkle_level(const u64* digests, u64* out, i64 n_parents) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (i64 r = 0; r < n_parents; r++) {
    Fr st[4];
    st[0] = Fr{{0, 0, 0, 0}};
    st[1] = Fr{{0, 0, 0, 0}};
    st[2] = fr_to_mont(fr_load(digests + (2 * r) * 4));
    st[3] = fr_to_mont(fr_load(digests + (2 * r + 1) * 4));
    bn128_permute(st);
    fr_store(out + r * 4, fr_from_mont(st[0]));
  }
}

}  // extern "C"
