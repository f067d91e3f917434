// Native host runtime for curdleproofs_tpu: BLS12-381 Fq/G1 over 64-bit limbs.
//
// This is the first-party replacement for the reference's native layer
// (arkworks ark-ff/ark-ec with x86 asm, /root/reference/Cargo.toml:24-25,35):
// Montgomery CIOS multiplication with __int128 accumulation, Jacobian group
// law, windowed scalar multiplication and Pippenger MSM. Exposed as a C ABI
// consumed via ctypes (no pybind11 in this image).
//
// Data layout at the boundary (all little-endian, canonical — not Montgomery):
//   scalar: 32 bytes
//   point (Jacobian): 3 x 48 bytes (x, y, z); z == 0 encodes infinity.

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---- generated-at-build-time constants (see build.py) ----
#include "constants_generated.h"
// Provides:
//   static const u64 P[6];        // Fq modulus
//   static const u64 P_INV64;     // -p^{-1} mod 2^64
//   static const u64 R2[6];       // (2^384)^2 mod p
//   static const u64 ONE_MONT[6]; // 2^384 mod p

namespace {

struct Fq {
    u64 l[6];
};

inline bool fq_is_zero(const Fq &a) {
    return !(a.l[0] | a.l[1] | a.l[2] | a.l[3] | a.l[4] | a.l[5]);
}

inline bool fq_geq_p(const Fq &a) {
    for (int i = 5; i >= 0; --i) {
        if (a.l[i] > P[i]) return true;
        if (a.l[i] < P[i]) return false;
    }
    return true;
}

inline void fq_sub_p(Fq &a) {
    u128 borrow = 0;
    for (int i = 0; i < 6; ++i) {
        u128 d = (u128)a.l[i] - P[i] - (u64)borrow;
        a.l[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

inline void fq_add(const Fq &a, const Fq &b, Fq &r) {
    u128 carry = 0;
    for (int i = 0; i < 6; ++i) {
        u128 s = (u128)a.l[i] + b.l[i] + (u64)carry;
        r.l[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fq_geq_p(r)) fq_sub_p(r);
}

inline void fq_sub(const Fq &a, const Fq &b, Fq &r) {
    u128 borrow = 0;
    for (int i = 0; i < 6; ++i) {
        u128 d = (u128)a.l[i] - b.l[i] - (u64)borrow;
        r.l[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 6; ++i) {
            u128 s = (u128)r.l[i] + P[i] + (u64)carry;
            r.l[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

inline void fq_neg(const Fq &a, Fq &r) {
    if (fq_is_zero(a)) { r = a; return; }
    u128 borrow = 0;
    for (int i = 0; i < 6; ++i) {
        u128 d = (u128)P[i] - a.l[i] - (u64)borrow;
        r.l[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

// Montgomery CIOS product: r = a * b * 2^{-384} mod p
void fq_mul(const Fq &a, const Fq &b, Fq &r) {
    u64 t[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 6; ++i) {
        u128 c = 0;
        for (int j = 0; j < 6; ++j) {
            u128 cur = (u128)t[j] + (u128)a.l[j] * b.l[i] + (u64)c;
            t[j] = (u64)cur;
            c = cur >> 64;
        }
        u128 cur = (u128)t[6] + (u64)c;
        t[6] = (u64)cur;
        t[7] = (u64)(cur >> 64);

        u64 m = t[0] * P_INV64;
        c = ((u128)t[0] + (u128)m * P[0]) >> 64;
        for (int j = 1; j < 6; ++j) {
            u128 cur2 = (u128)t[j] + (u128)m * P[j] + (u64)c;
            t[j - 1] = (u64)cur2;
            c = cur2 >> 64;
        }
        cur = (u128)t[6] + (u64)c;
        t[5] = (u64)cur;
        t[6] = t[7] + (u64)(cur >> 64);
    }
    std::memcpy(r.l, t, 48);
    if (t[6] || fq_geq_p(r)) fq_sub_p(r);
}

// Dedicated Montgomery squaring (SOS): cross products once + doubled,
// diagonal added, then a separate 6-step reduction. ~25% fewer limb products
// than fq_mul.
void fq_sqr(const Fq &a, Fq &r) {
    u64 t[13] = {0};
    // cross terms i < j
    for (int i = 0; i < 6; ++i) {
        u128 c = 0;
        for (int j = i + 1; j < 6; ++j) {
            u128 cur = (u128)t[i + j] + (u128)a.l[i] * a.l[j] + (u64)c;
            t[i + j] = (u64)cur;
            c = cur >> 64;
        }
        u128 cur = (u128)t[i + 6] + (u64)c;
        t[i + 6] = (u64)cur;
        // (carry out of t[i+6] impossible: t[i+6] only holds prior carries)
    }
    // double
    u64 top = 0;
    for (int i = 11; i >= 1; --i) {
        t[i] = (t[i] << 1) | (t[i - 1] >> 63);
    }
    t[0] <<= 1;
    // add diagonals
    u128 c = 0;
    for (int i = 0; i < 6; ++i) {
        u128 sq = (u128)a.l[i] * a.l[i];
        u128 lo = (u128)t[2 * i] + (u64)sq + (u64)c;
        t[2 * i] = (u64)lo;
        u128 hi = (u128)t[2 * i + 1] + (u64)(sq >> 64) + (u64)(lo >> 64);
        t[2 * i + 1] = (u64)hi;
        c = hi >> 64;
    }
    t[12] = (u64)c;
    // Montgomery reduction (SOS): clear limbs 0..5
    u64 extra = t[12];
    for (int i = 0; i < 6; ++i) {
        u64 m = t[i] * P_INV64;
        u128 cc = 0;
        for (int j = 0; j < 6; ++j) {
            u128 cur = (u128)t[i + j] + (u128)m * P[j] + (u64)cc;
            t[i + j] = (u64)cur;
            cc = cur >> 64;
        }
        // propagate carry into the higher limbs
        int k = i + 6;
        while (cc && k < 12) {
            u128 cur = (u128)t[k] + (u64)cc;
            t[k] = (u64)cur;
            cc = cur >> 64;
            ++k;
        }
        extra += (u64)cc;
    }
    std::memcpy(r.l, t + 6, 48);
    if (extra || fq_geq_p(r)) fq_sub_p(r);
}

inline void to_mont(Fq &a) {
    Fq r2;
    std::memcpy(r2.l, R2, 48);
    Fq out;
    fq_mul(a, r2, out);
    a = out;
}

inline void from_mont(Fq &a) {
    Fq one = {{1, 0, 0, 0, 0, 0}};
    Fq out;
    fq_mul(a, one, out);
    a = out;
}

inline void fq_dbl(const Fq &a, Fq &r) { fq_add(a, a, r); }

// ---- G1 in Jacobian coordinates (Montgomery-form coordinates) ----

struct G1 {
    Fq x, y, z;  // z == 0 => infinity
};

void g1_set_inf(G1 &p);

inline bool g1_is_inf(const G1 &p) { return fq_is_zero(p.z); }

void g1_double(const G1 &p, G1 &r) {
    if (g1_is_inf(p)) { r = p; return; }
    Fq A, B, C, D, E, F, t0, t1;
    fq_sqr(p.x, A);
    fq_sqr(p.y, B);
    fq_sqr(B, C);
    // D = 2*((X+B)^2 - A - C)
    fq_add(p.x, B, t0);
    fq_sqr(t0, t0);
    fq_sub(t0, A, t0);
    fq_sub(t0, C, t0);
    fq_dbl(t0, D);
    // E = 3A; F = E^2
    fq_dbl(A, E);
    fq_add(E, A, E);
    fq_sqr(E, F);
    // X3 = F - 2D
    fq_dbl(D, t0);
    fq_sub(F, t0, r.x);
    // Y3 = E*(D - X3) - 8C
    fq_sub(D, r.x, t0);
    fq_mul(E, t0, t0);
    fq_dbl(C, t1);
    fq_dbl(t1, t1);
    fq_dbl(t1, t1);
    Fq y3;
    fq_sub(t0, t1, y3);
    // Z3 = 2*Y1*Z1
    Fq z3;
    fq_mul(p.y, p.z, z3);
    fq_dbl(z3, r.z);
    r.y = y3;
}

inline bool fq_is_one_mont(const Fq &a) {
    return std::memcmp(a.l, ONE_MONT, 48) == 0;
}

void g1_add(const G1 &p, const G1 &q, G1 &r) {
    if (g1_is_inf(p)) { r = q; return; }
    if (g1_is_inf(q)) { r = p; return; }
    Fq Z1Z1, Z2Z2, U1, U2, S1, S2, t;
    bool q_affine = fq_is_one_mont(q.z);
    fq_sqr(p.z, Z1Z1);
    if (q_affine) {  // mixed addition: skip 4 muls
        U1 = p.x;
        S1 = p.y;
    } else {
        fq_sqr(q.z, Z2Z2);
        fq_mul(p.x, Z2Z2, U1);
        fq_mul(p.y, q.z, t);
        fq_mul(t, Z2Z2, S1);
    }
    fq_mul(q.x, Z1Z1, U2);
    fq_mul(q.y, p.z, t);
    fq_mul(t, Z1Z1, S2);

    Fq H, I, J, rr, V;
    fq_sub(U2, U1, H);
    if (fq_is_zero(H)) {
        Fq sd;
        fq_sub(S2, S1, sd);
        if (fq_is_zero(sd)) { g1_double(p, r); return; }
        g1_set_inf(r);
        return;
    }
    fq_dbl(H, t);
    fq_sqr(t, I);
    fq_mul(H, I, J);
    fq_sub(S2, S1, rr);
    fq_dbl(rr, rr);
    fq_mul(U1, I, V);
    // X3 = r^2 - J - 2V
    Fq x3;
    fq_sqr(rr, x3);
    fq_sub(x3, J, x3);
    fq_sub(x3, V, x3);
    fq_sub(x3, V, x3);
    // Y3 = r*(V - X3) - 2*S1*J
    Fq y3;
    fq_sub(V, x3, t);
    fq_mul(rr, t, y3);
    fq_mul(S1, J, t);
    fq_dbl(t, t);
    fq_sub(y3, t, y3);
    // Z3 = 2*Z1*Z2*H  (note: ((Z1+Z2)^2 - Z1Z1 - Z2Z2)*H / 2... use direct)
    Fq z3;
    fq_mul(p.z, q.z, z3);
    fq_mul(z3, H, z3);
    fq_dbl(z3, z3);
    r.x = x3; r.y = y3; r.z = z3;
}

void g1_set_inf(G1 &p) {
    std::memset(&p, 0, sizeof(G1));
    std::memcpy(p.y.l, ONE_MONT, 48);
}

// scalar given as 32 LE bytes (canonical)
void g1_mul(const G1 &p, const uint8_t *scalar, G1 &r) {
    g1_set_inf(r);
    bool started = false;
    for (int byte = 31; byte >= 0; --byte) {
        for (int bit = 7; bit >= 0; --bit) {
            if (started) g1_double(r, r);
            if ((scalar[byte] >> bit) & 1) {
                if (started) {
                    G1 t;
                    g1_add(r, p, t);
                    r = t;
                } else {
                    r = p;
                    started = true;
                }
            }
        }
    }
}

// ---- boundary codecs ----

void load_fq(const uint8_t *in, Fq &out) {
    std::memcpy(out.l, in, 48);
    to_mont(out);
}

void store_fq(const Fq &in, uint8_t *out) {
    Fq t = in;
    from_mont(t);
    std::memcpy(out, t.l, 48);
}

void load_g1(const uint8_t *in, G1 &out) {
    load_fq(in, out.x);
    load_fq(in + 48, out.y);
    load_fq(in + 96, out.z);
}

void store_g1(const G1 &in, uint8_t *out) {
    store_fq(in.x, out);
    store_fq(in.y, out + 48);
    store_fq(in.z, out + 96);
}

// ---- Pippenger MSM ----

int pick_window(size_t n) {
    if (n < 32) return 3;
    int c = 1;
    size_t v = n;
    while (v >>= 1) ++c;      // ~log2(n)
    c = c > 3 ? c - 2 : 3;    // log2(n) - 2 heuristic (arkworks-like)
    return c > 13 ? 13 : c;
}

static inline unsigned extract_digit(const uint8_t *s, int bit_lo, int c) {
    unsigned digit = 0;
    for (int k = 0; k < c; ++k) {
        int bit = bit_lo + k;
        if (bit >= 256) break;
        digit |= (((s[bit >> 3] >> (bit & 7)) & 1u) << k);
    }
    return digit;
}

// Straus interleaved MSM: one shared doubling chain, per-point 4-bit tables.
// Wins for small n (the protocol's sub-argument MSMs are n = logn .. 2n).
void msm_straus(const G1 *pts, const uint8_t *scalars, size_t n, G1 &out) {
    const int C = 4;
    const int DIGITS = (255 + C - 1) / C;  // 64
    std::vector<G1> table(n * 15);         // table[i][d-1] = d * P_i
    for (size_t i = 0; i < n; ++i) {
        G1 *t = &table[i * 15];
        t[0] = pts[i];
        for (int d = 2; d <= 15; ++d) {
            if (d % 2 == 0) g1_double(t[d / 2 - 1], t[d - 1]);
            else g1_add(t[d - 2], pts[i], t[d - 1]);
        }
    }
    g1_set_inf(out);
    for (int w = DIGITS - 1; w >= 0; --w) {
        for (int k = 0; k < C; ++k) g1_double(out, out);
        for (size_t i = 0; i < n; ++i) {
            unsigned digit = extract_digit(scalars + 32 * i, w * C, C);
            if (digit) {
                G1 t;
                g1_add(out, table[i * 15 + digit - 1], t);
                out = t;
            }
        }
    }
}

void msm_impl(const G1 *pts, const uint8_t *scalars, size_t n, G1 &out) {
    const int NB = 255;
    if (n <= 48) { msm_straus(pts, scalars, n, out); return; }
    int c = pick_window(n);
    int windows = (NB + c - 1) / c;
    std::vector<G1> buckets((size_t)1 << c);

    g1_set_inf(out);
    for (int w = windows - 1; w >= 0; --w) {
        for (int k = 0; k < c; ++k) g1_double(out, out);
        size_t nb = (size_t)1 << c;
        size_t max_bucket = 0;
        for (size_t b = 0; b < nb; ++b) g1_set_inf(buckets[b]);
        int bit_lo = w * c;
        for (size_t i = 0; i < n; ++i) {
            unsigned digit = extract_digit(scalars + 32 * i, bit_lo, c);
            if (digit) {
                G1 t;
                g1_add(buckets[digit], pts[i], t);
                buckets[digit] = t;
                if (digit > max_bucket) max_bucket = digit;
            }
        }
        if (!max_bucket) continue;
        G1 running, wsum, t;
        g1_set_inf(running);
        g1_set_inf(wsum);
        for (size_t b = max_bucket; b >= 1; --b) {
            g1_add(running, buckets[b], t);
            running = t;
            g1_add(wsum, running, t);
            wsum = t;
        }
        g1_add(out, wsum, t);
        out = t;
    }
}

}  // namespace

extern "C" {

// points: n * 144 bytes (Jacobian canonical LE); scalars: n * 32 bytes; out: 144
void cp_msm(const uint8_t *points, const uint8_t *scalars, uint64_t n,
            uint8_t *out) {
    std::vector<G1> pts(n);
    for (uint64_t i = 0; i < n; ++i) load_g1(points + 144 * i, pts[i]);
    G1 r;
    msm_impl(pts.data(), scalars, n, r);
    store_g1(r, out);
}

void cp_add(const uint8_t *p, const uint8_t *q, uint8_t *out) {
    G1 a, b, r;
    load_g1(p, a);
    load_g1(q, b);
    g1_add(a, b, r);
    store_g1(r, out);
}

void cp_mul(const uint8_t *p, const uint8_t *scalar, uint8_t *out) {
    G1 a, r;
    load_g1(p, a);
    g1_mul(a, scalar, r);
    store_g1(r, out);
}

// out: n * 144
void cp_batch_mul(const uint8_t *points, uint64_t n, const uint8_t *scalar,
                  uint8_t *out) {
    for (uint64_t i = 0; i < n; ++i) {
        G1 a, r;
        load_g1(points + 144 * i, a);
        g1_mul(a, scalar, r);
        store_g1(r, out + 144 * i);
    }
}

void cp_batch_mul_each(const uint8_t *points, const uint8_t *scalars,
                       uint64_t n, uint8_t *out) {
    for (uint64_t i = 0; i < n; ++i) {
        G1 a, r;
        load_g1(points + 144 * i, a);
        g1_mul(a, scalars + 32 * i, r);
        store_g1(r, out + 144 * i);
    }
}

// left/right: n*144; out[i] = left[i] + gamma*right[i]
void cp_fold(const uint8_t *left, const uint8_t *right, uint64_t n,
             const uint8_t *gamma, uint8_t *out) {
    for (uint64_t i = 0; i < n; ++i) {
        G1 l, rp, m, r;
        load_g1(left + 144 * i, l);
        load_g1(right + 144 * i, rp);
        g1_mul(rp, gamma, m);
        g1_add(l, m, r);
        store_g1(r, out + 144 * i);
    }
}

}  // extern "C"

// ---- Keccak-f[1600] (STROBE/Merlin transcript hot loop) ----

extern "C" {

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int KECCAK_ROT[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                                   25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

static inline u64 rotl64(u64 v, int n) {
    if (n == 0) return v;
    return (v << n) | (v >> (64 - n));
}

// state: 200 bytes, lanes little-endian (in-place)
void cp_keccak_f1600(uint8_t *state) {
    u64 a[25];
    std::memcpy(a, state, 200);
    for (int round = 0; round < 24; ++round) {
        u64 c[5], d[5];
        for (int x = 0; x < 5; ++x)
            c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; ++x)
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
        for (int i = 0; i < 25; ++i) a[i] ^= d[i % 5];
        u64 b[25];
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(a[x + 5 * y], KECCAK_ROT[x + 5 * y]);
        for (int y = 0; y < 5; ++y)
            for (int x = 0; x < 5; ++x)
                a[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
        a[0] ^= KECCAK_RC[round];
    }
    std::memcpy(state, a, 200);
}

// Raw (unreduced) scalar multiplication; scalar_len bytes little-endian.
void cp_mul_raw(const uint8_t *p, const uint8_t *scalar, uint64_t scalar_len,
                uint8_t *out) {
    G1 a, r;
    load_g1(p, a);
    g1_set_inf(r);
    bool started = false;
    for (int64_t byte = (int64_t)scalar_len - 1; byte >= 0; --byte) {
        for (int bit = 7; bit >= 0; --bit) {
            if (started) g1_double(r, r);
            if ((scalar[byte] >> bit) & 1) {
                if (started) {
                    G1 t;
                    g1_add(r, a, t);
                    r = t;
                } else {
                    r = a;
                    started = true;
                }
            }
        }
    }
    store_g1(r, out);
}

}  // extern "C"

// ---- GLV dual-scalar multiplication ----
// out[i] = (left ? left[i] : 0) + k1*P_i + k2*phi(P_i), phi = (beta*x, y, z)
// k1/k2: |value| as 32-byte LE + sign flags; nbits bounds both bit lengths.

namespace {

void g1_neg_inplace(G1 &p) {
    if (!g1_is_inf(p)) fq_neg(p.y, p.y);
}

void build_table15(const G1 &p, G1 *t) {  // t[d-1] = d*p, d = 1..15
    t[0] = p;
    for (int d = 2; d <= 15; ++d) {
        if (d % 2 == 0) g1_double(t[d / 2 - 1], t[d - 1]);
        else g1_add(t[d - 2], p, t[d - 1]);
    }
}

void dual_mul_core(const G1 &base, const Fq &beta_mont,
                   const uint8_t *k1, int neg1,
                   const uint8_t *k2, int neg2, int nbits,
                   const G1 *left, G1 &out) {
    G1 r1 = base;
    if (neg1) g1_neg_inplace(r1);
    G1 r2 = base;
    fq_mul(r2.x, beta_mont, r2.x);
    if (neg2) g1_neg_inplace(r2);

    G1 t1[15], t2[15];
    build_table15(r1, t1);
    build_table15(r2, t2);

    const int C = 4;
    int windows = (nbits + C - 1) / C;
    G1 acc;
    g1_set_inf(acc);
    G1 tmp;
    for (int w = windows - 1; w >= 0; --w) {
        for (int k = 0; k < C; ++k) g1_double(acc, acc);
        unsigned d1 = extract_digit(k1, w * C, C);
        unsigned d2 = extract_digit(k2, w * C, C);
        if (d1) { g1_add(acc, t1[d1 - 1], tmp); acc = tmp; }
        if (d2) { g1_add(acc, t2[d2 - 1], tmp); acc = tmp; }
    }
    if (left) { g1_add(acc, *left, tmp); acc = tmp; }
    out = acc;
}

}  // namespace

extern "C" {

// mode: 0 = batch_mul (same k for all points, no left)
//       1 = fold (left provided)
void cp_dual_mul(const uint8_t *left_bytes, const uint8_t *points,
                 uint64_t n, const uint8_t *beta48,
                 const uint8_t *k1, int32_t neg1,
                 const uint8_t *k2, int32_t neg2, int32_t nbits,
                 uint8_t *out) {
    Fq beta;
    load_fq(beta48, beta);
    for (uint64_t i = 0; i < n; ++i) {
        G1 base, l, r;
        load_g1(points + 144 * i, base);
        if (left_bytes) load_g1(left_bytes + 144 * i, l);
        dual_mul_core(base, beta, k1, neg1, k2, neg2, nbits,
                      left_bytes ? &l : nullptr, r);
        store_g1(r, out + 144 * i);
    }
}

// per-point scalars, pre-decomposed: k1s/k2s are n*32 bytes, negs are n int8
void cp_dual_mul_each(const uint8_t *points, uint64_t n,
                      const uint8_t *beta48,
                      const uint8_t *k1s, const int8_t *negs1,
                      const uint8_t *k2s, const int8_t *negs2,
                      int32_t nbits, uint8_t *out) {
    Fq beta;
    load_fq(beta48, beta);
    for (uint64_t i = 0; i < n; ++i) {
        G1 base, r;
        load_g1(points + 144 * i, base);
        dual_mul_core(base, beta, k1s + 32 * i, negs1[i], k2s + 32 * i,
                      negs2[i], nbits, nullptr, r);
        store_g1(r, out + 144 * i);
    }
}

}  // extern "C"
