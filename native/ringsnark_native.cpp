// ringsnark-tpu native support library (C++17, no external dependencies).
//
// Role (DESIGN.md §6): the golden oracle and single-core CPU baseline for the
// JAX/Pallas compute path — the stand-in for the reference's SEAL backend
// (whose submodules are empty and unbuildable).  Implements the same spec as
// ops/modops.py and ops/ntt.py with scalar 64-bit code: Barrett/plain modular
// arithmetic, negacyclic/cyclic NTT in the identical bit-reversal-free
// DIF/DIT ordering, pointwise ring ops, and ciphertext-plaintext
// inner-product accumulation.
//
// Exposed as a C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;

static inline u32 mulmod(u32 a, u32 b, u32 p) {
  return (u32)(((u64)a * b) % p);
}

static inline u32 addmod(u32 a, u32 b, u32 p) {
  u32 s = a + b;  // a,b < p < 2^31: no wrap
  return s >= p ? s - p : s;
}

static inline u32 submod(u32 a, u32 b, u32 p) { return addmod(a, p - b, p); }

static u32 powmod(u32 a, u64 e, u32 p) {
  u64 acc = 1, base = a % p;
  while (e) {
    if (e & 1) acc = acc * base % p;
    base = base * base % p;
    e >>= 1;
  }
  return (u32)acc;
}

extern "C" {

// ---- scalar modular arithmetic (oracle for ops/modops.py) -----------------

// Thread control for the multi-core ("single-socket") baseline legs: the
// reference is OpenMP-parallel, so honest vs-CPU ratios must be measured
// against all cores as well as one (BASELINE.md "≥10x over single-socket").
void rn_set_threads(int n) {
#ifdef _OPENMP
  omp_set_num_threads(n);
#else
  (void)n;
#endif
}

int rn_get_max_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

u32 rn_mulmod(u32 a, u32 b, u32 p) { return mulmod(a, b, p); }
u32 rn_powmod(u32 a, u64 e, u32 p) { return powmod(a, e, p); }
u32 rn_invmod(u32 a, u32 p) { return powmod(a, p - 2, p); }

// elementwise vectors
void rn_vec_mulmod(const u32* a, const u32* b, u32* out, u64 n, u32 p) {
  for (u64 i = 0; i < n; i++) out[i] = mulmod(a[i], b[i], p);
}
void rn_vec_addmod(const u32* a, const u32* b, u32* out, u64 n, u32 p) {
  for (u64 i = 0; i < n; i++) out[i] = addmod(a[i], b[i], p);
}

// ---- NTT ------------------------------------------------------------------
// Identical ordering to ops/ntt.py: forward = DIF (natural in, bit-reversed
// out), inverse = DIT (bit-reversed in, natural out, scaled by M^-1).
// w = primitive M-th root, psi = primitive 2M-th root with psi^2 = w.

struct NttTables {
  u32 p;
  u32 M;
  std::vector<u32> w_pows, winv_pows, psi_pows, psiinv_scaled;
  u32 minv;
};

static void make_tables(NttTables& t, u32 p, u32 M, u32 w, u32 psi) {
  t.p = p;
  t.M = M;
  t.w_pows.resize(M);
  t.winv_pows.resize(M);
  u32 winv = powmod(w, p - 2, p);
  t.w_pows[0] = t.winv_pows[0] = 1;
  for (u32 i = 1; i < M; i++) {
    t.w_pows[i] = mulmod(t.w_pows[i - 1], w, p);
    t.winv_pows[i] = mulmod(t.winv_pows[i - 1], winv, p);
  }
  t.minv = powmod(M, p - 2, p);
  if (psi) {
    t.psi_pows.resize(M);
    t.psiinv_scaled.resize(M);
    u32 psiinv = powmod(psi, p - 2, p);
    t.psi_pows[0] = 1;
    t.psiinv_scaled[0] = t.minv;
    for (u32 i = 1; i < M; i++) {
      t.psi_pows[i] = mulmod(t.psi_pows[i - 1], psi, p);
      t.psiinv_scaled[i] = mulmod(t.psiinv_scaled[i - 1], psiinv, p);
    }
  }
}

static void dif_forward(u32* x, const NttTables& t) {
  const u32 p = t.p, M = t.M;
  for (u32 d = M >> 1, stride = 1; d >= 1; d >>= 1, stride <<= 1) {
    for (u32 blk = 0; blk < M; blk += 2 * d) {
      for (u32 i = 0; i < d; i++) {
        u32 a = x[blk + i], b = x[blk + i + d];
        x[blk + i] = addmod(a, b, p);
        x[blk + i + d] = mulmod(submod(a, b, p), t.w_pows[(u64)i * stride], p);
      }
    }
  }
}

static void dit_inverse(u32* x, const NttTables& t) {
  const u32 p = t.p, M = t.M;
  for (u32 d = 1, stride = M >> 1; d <= M >> 1; d <<= 1, stride >>= 1) {
    for (u32 blk = 0; blk < M; blk += 2 * d) {
      for (u32 i = 0; i < d; i++) {
        u32 a = x[blk + i];
        u32 b = mulmod(x[blk + i + d], t.winv_pows[(u64)i * stride], p);
        x[blk + i] = addmod(a, b, p);
        x[blk + i + d] = submod(a, b, p);
      }
    }
  }
}

// batched negacyclic forward NTT in place: data[batch][M]
void rn_negacyclic_ntt(u32* data, u64 batch, u32 M, u32 p, u32 w, u32 psi) {
  NttTables t;
  make_tables(t, p, M, w, psi);
#pragma omp parallel for schedule(static)
  for (u64 b = 0; b < batch; b++) {
    u32* x = data + b * M;
    for (u32 i = 0; i < M; i++) x[i] = mulmod(x[i], t.psi_pows[i], p);
    dif_forward(x, t);
  }
}

// batched negacyclic inverse NTT in place
void rn_negacyclic_intt(u32* data, u64 batch, u32 M, u32 p, u32 w, u32 psi) {
  NttTables t;
  make_tables(t, p, M, w, psi);
#pragma omp parallel for schedule(static)
  for (u64 b = 0; b < batch; b++) {
    u32* x = data + b * M;
    dit_inverse(x, t);
    for (u32 i = 0; i < M; i++) x[i] = mulmod(x[i], t.psiinv_scaled[i], p);
  }
}

// batched cyclic forward / inverse
void rn_cyclic_ntt(u32* data, u64 batch, u32 M, u32 p, u32 w) {
  NttTables t;
  make_tables(t, p, M, w, 0);
#pragma omp parallel for schedule(static)
  for (u64 b = 0; b < batch; b++) dif_forward(data + b * M, t);
}

void rn_cyclic_intt(u32* data, u64 batch, u32 M, u32 p, u32 w) {
  NttTables t;
  make_tables(t, p, M, w, 0);
#pragma omp parallel for schedule(static)
  for (u64 b = 0; b < batch; b++) {
    u32* x = data + b * M;
    dit_inverse(x, t);
    for (u32 i = 0; i < M; i++) x[i] = mulmod(x[i], t.minv, p);
  }
}

// ---- fused ciphertext-plaintext inner product ----------------------------
// acc[j] += sum_b ct[b][j] * pt[b][j]  (one limb; lazy u128 accumulation)
void rn_ip_accumulate(const u32* ct, const u32* pt, u32* acc, u64 batch,
                      u64 n, u32 p) {
#pragma omp parallel for schedule(static)
  for (u64 j = 0; j < n; j++) {
    u128 s = acc[j];
    for (u64 b = 0; b < batch; b++) {
      s += (u64)ct[b * n + j] * pt[b * n + j];
    }
    acc[j] = (u32)(s % p);
  }
}

}  // extern "C"
