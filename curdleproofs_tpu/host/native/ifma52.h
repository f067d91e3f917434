// 8-wide BLS12-381 Fq arithmetic on AVX512-IFMA (radix-2^52, vertical SoA).
//
// This is the host-side analogue of the reference's performance substrate
// (arkworks ark-ff with x86_64 asm, /root/reference/Cargo.toml:35): instead of
// one Montgomery multiply at a time, vpmadd52{lo,hi}uq computes eight
// independent multiplies per instruction stream, ~6 ns per multiply vs ~52 ns
// for the scalar ADX path. Everything here is included into bls12_381.cpp's
// anonymous namespace; it assumes the generated constants P52/P_INV52/... are
// in scope, plus the scalar `Fq` type for conversions.
//
// Layout: an element in "packed" form is 8 contiguous u64 limbs (one cache
// line), value = sum limb[j] * 2^(52j), canonical (< p, limbs < 2^52),
// Montgomery-52 domain (value stored is a * 2^416 mod p). A batch `Fq8` is
// the 8x8 transpose: v[j] lane k = limb j of element k.

#pragma once

#if defined(__AVX512IFMA__) && defined(__AVX512VL__) && defined(__AVX512DQ__)
#define CP_HAVE_IFMA 1

#include <immintrin.h>

namespace ifma {

typedef uint64_t u64;

struct Fq8 {
    __m512i v[8];
};

inline __m512i mask52v() { return _mm512_set1_epi64((1ULL << 52) - 1); }

// ---- packed (8xu64) <-> 6x64 scalar Fq repack (same integer, same domain) --

inline void repack_6to8(const u64 in[6], u64 out[8]) {
    unsigned __int128 acc = 0;
    int bits = 0, j = 0;
    for (int i = 0; i < 6; ++i) {
        acc |= (unsigned __int128)in[i] << bits;
        bits += 64;
        while (bits >= 52) {
            out[j++] = (u64)(acc & ((1ULL << 52) - 1));
            acc >>= 52;
            bits -= 52;
        }
    }
    while (j < 8) { out[j++] = (u64)(acc & ((1ULL << 52) - 1)); acc >>= 52; }
}

inline void repack_8to6(const u64 in[8], u64 out[6]) {
    unsigned __int128 acc = 0;
    int bits = 0, j = 0;
    for (int i = 0; i < 8; ++i) {
        acc |= (unsigned __int128)in[i] << bits;
        bits += 52;
        if (bits >= 64) {
            out[j++] = (u64)acc;
            acc >>= 64;
            bits -= 64;
        }
    }
    if (j < 6) out[j] = (u64)acc;
}

// ---- 8x8 u64 transpose (24 shuffles); involution, used both directions ----

inline void transpose8(const __m512i r[8], __m512i o[8]) {
    __m512i t0 = _mm512_unpacklo_epi64(r[0], r[1]);
    __m512i t1 = _mm512_unpackhi_epi64(r[0], r[1]);
    __m512i t2 = _mm512_unpacklo_epi64(r[2], r[3]);
    __m512i t3 = _mm512_unpackhi_epi64(r[2], r[3]);
    __m512i t4 = _mm512_unpacklo_epi64(r[4], r[5]);
    __m512i t5 = _mm512_unpackhi_epi64(r[4], r[5]);
    __m512i t6 = _mm512_unpacklo_epi64(r[6], r[7]);
    __m512i t7 = _mm512_unpackhi_epi64(r[6], r[7]);
    __m512i u0 = _mm512_shuffle_i64x2(t0, t2, 0x88);
    __m512i u1 = _mm512_shuffle_i64x2(t1, t3, 0x88);
    __m512i u2 = _mm512_shuffle_i64x2(t0, t2, 0xdd);
    __m512i u3 = _mm512_shuffle_i64x2(t1, t3, 0xdd);
    __m512i u4 = _mm512_shuffle_i64x2(t4, t6, 0x88);
    __m512i u5 = _mm512_shuffle_i64x2(t5, t7, 0x88);
    __m512i u6 = _mm512_shuffle_i64x2(t4, t6, 0xdd);
    __m512i u7 = _mm512_shuffle_i64x2(t5, t7, 0xdd);
    o[0] = _mm512_shuffle_i64x2(u0, u4, 0x88);
    o[1] = _mm512_shuffle_i64x2(u1, u5, 0x88);
    o[2] = _mm512_shuffle_i64x2(u2, u6, 0x88);
    o[3] = _mm512_shuffle_i64x2(u3, u7, 0x88);
    o[4] = _mm512_shuffle_i64x2(u0, u4, 0xdd);
    o[5] = _mm512_shuffle_i64x2(u1, u5, 0xdd);
    o[6] = _mm512_shuffle_i64x2(u2, u6, 0xdd);
    o[7] = _mm512_shuffle_i64x2(u3, u7, 0xdd);
}

// gather 8 packed elements (64B each, arbitrary addresses) into vertical form
inline void load8(const u64 *const src[8], Fq8 &out) {
    __m512i rows[8];
    for (int k = 0; k < 8; ++k)
        rows[k] = _mm512_loadu_si512((const void *)src[k]);
    transpose8(rows, out.v);
}

// scatter vertical form back to 8 packed elements; `lanes` masks which
// elements are written (bit k = element k)
inline void store8(const Fq8 &in, u64 *const dst[8], unsigned lanes = 0xff) {
    __m512i rows[8];
    transpose8(in.v, rows);
    for (int k = 0; k < 8; ++k)
        if (lanes & (1u << k))
            _mm512_storeu_si512((void *)dst[k], rows[k]);
}

// ---- modular ops (all inputs/outputs canonical: limbs < 2^52, value < p) --

// conditional subtract p on lanes where value >= p; input limbs < 2^52 but
// value may be in [0, 2p)
inline void csub_p(__m512i t[8]) {
    const __m512i mask = mask52v();
    const __m512i zero = _mm512_setzero_si512();
    __m512i d[8], borrow = zero;
    for (int j = 0; j < 8; ++j) {
        __m512i pj = _mm512_set1_epi64((long long)P52[j]);
        __m512i x = _mm512_sub_epi64(_mm512_sub_epi64(t[j], pj), borrow);
        borrow = _mm512_srli_epi64(x, 63);
        d[j] = _mm512_and_si512(x, mask);
    }
    __mmask8 geq = _mm512_cmpeq_epu64_mask(borrow, zero);  // no borrow: t >= p
    for (int j = 0; j < 8; ++j)
        t[j] = _mm512_mask_blend_epi64(geq, t[j], d[j]);
}

// full carry propagation of redundant limbs (each < 2^63) into canonical-
// width limbs; assumes the true value fits 416 bits
inline void carry_prop(__m512i t[8]) {
    const __m512i mask = mask52v();
    __m512i carry = _mm512_setzero_si512();
    for (int j = 0; j < 8; ++j) {
        __m512i x = _mm512_add_epi64(t[j], carry);
        carry = _mm512_srli_epi64(x, 52);
        t[j] = _mm512_and_si512(x, mask);
    }
}

// r = a + b mod p
inline void add8(const Fq8 &a, const Fq8 &b, Fq8 &r) {
    for (int j = 0; j < 8; ++j) r.v[j] = _mm512_add_epi64(a.v[j], b.v[j]);
    carry_prop(r.v);
    csub_p(r.v);
}

// r = 2a mod p
inline void dbl8(const Fq8 &a, Fq8 &r) { add8(a, a, r); }

// r = a - b mod p
inline void sub8(const Fq8 &a, const Fq8 &b, Fq8 &r) {
    const __m512i mask = mask52v();
    const __m512i zero = _mm512_setzero_si512();
    __m512i borrow = zero;
    for (int j = 0; j < 8; ++j) {
        __m512i x = _mm512_sub_epi64(_mm512_sub_epi64(a.v[j], b.v[j]), borrow);
        borrow = _mm512_srli_epi64(x, 63);
        r.v[j] = _mm512_and_si512(x, mask);
    }
    // lanes that borrowed: add p back
    __mmask8 neg = _mm512_cmpneq_epu64_mask(borrow, zero);
    __m512i carry = zero;
    for (int j = 0; j < 8; ++j) {
        __m512i pj = _mm512_maskz_mov_epi64(neg, _mm512_set1_epi64((long long)P52[j]));
        __m512i x = _mm512_add_epi64(_mm512_add_epi64(r.v[j], pj), carry);
        carry = _mm512_srli_epi64(x, 52);
        r.v[j] = _mm512_and_si512(x, mask);
    }
}

// r = -a mod p (lanes with a == 0 stay 0)
inline void neg8(const Fq8 &a, Fq8 &r) {
    const __m512i zero = _mm512_setzero_si512();
    __m512i any = zero;
    for (int j = 0; j < 8; ++j) any = _mm512_or_si512(any, a.v[j]);
    __mmask8 nz = _mm512_cmpneq_epu64_mask(any, zero);
    const __m512i mask = mask52v();
    __m512i borrow = zero;
    for (int j = 0; j < 8; ++j) {
        __m512i pj = _mm512_set1_epi64((long long)P52[j]);
        __m512i x = _mm512_sub_epi64(_mm512_sub_epi64(pj, a.v[j]), borrow);
        borrow = _mm512_srli_epi64(x, 63);
        x = _mm512_and_si512(x, mask);
        r.v[j] = _mm512_maskz_mov_epi64(nz, x);
    }
}

// Montgomery product, SOS form: r = a * b * 2^-416 mod p.
// Accumulators stay redundant (< 2^57) through the product and reduction
// phases; one final carry propagation + conditional subtract.
inline void montmul8(const Fq8 &a, const Fq8 &b, Fq8 &r) {
    const __m512i zero = _mm512_setzero_si512();
    __m512i t[16];
    for (int k = 0; k < 16; ++k) t[k] = zero;
    // product phase: t[0..15] += a * b
    for (int i = 0; i < 8; ++i) {
        const __m512i bi = b.v[i];
        for (int j = 0; j < 8; ++j) {
            t[i + j] = _mm512_madd52lo_epu64(t[i + j], a.v[j], bi);
            t[i + j + 1] = _mm512_madd52hi_epu64(t[i + j + 1], a.v[j], bi);
        }
    }
    // reduction phase: clear t[0..7]
    const __m512i pinv = _mm512_set1_epi64((long long)P_INV52);
    __m512i pv[8];
    for (int j = 0; j < 8; ++j) pv[j] = _mm512_set1_epi64((long long)P52[j]);
    for (int i = 0; i < 8; ++i) {
        __m512i m = _mm512_madd52lo_epu64(zero, t[i], pinv);
        for (int j = 0; j < 8; ++j) {
            t[i + j] = _mm512_madd52lo_epu64(t[i + j], m, pv[j]);
            t[i + j + 1] = _mm512_madd52hi_epu64(t[i + j + 1], m, pv[j]);
        }
        t[i + 1] = _mm512_add_epi64(t[i + 1], _mm512_srli_epi64(t[i], 52));
    }
    for (int j = 0; j < 8; ++j) r.v[j] = t[8 + j];
    carry_prop(r.v);
    csub_p(r.v);
}

// Montgomery square. The halved-cross-term schedule below accumulates
// multiple (i, j) pairs of equal i+j into the same t slot back-to-back,
// which serialises on the 4-cycle madd52 latency and measures ~30% SLOWER
// than the plain product schedule despite 56 fewer madds (86 vs 111 ns on
// the target Xeon, cp_ifma_bench kinds 0/2) — so sqr8 delegates to
// montmul8.  The original schedule is kept (unused) as _sqr8_halved for
// wider cores where the madd ports, not the dependency chains, bind.
inline void sqr8(const Fq8 &a, Fq8 &r) { montmul8(a, a, r); }

inline void _sqr8_halved(const Fq8 &a, Fq8 &r) {
    const __m512i zero = _mm512_setzero_si512();
    __m512i t[16];
    for (int k = 0; k < 16; ++k) t[k] = zero;
    // cross terms i < j
    for (int i = 0; i < 8; ++i) {
        for (int j = i + 1; j < 8; ++j) {
            t[i + j] = _mm512_madd52lo_epu64(t[i + j], a.v[i], a.v[j]);
            t[i + j + 1] = _mm512_madd52hi_epu64(t[i + j + 1], a.v[i], a.v[j]);
        }
    }
    // double, then add diagonals
    for (int k = 0; k < 16; ++k) t[k] = _mm512_add_epi64(t[k], t[k]);
    for (int i = 0; i < 8; ++i) {
        t[2 * i] = _mm512_madd52lo_epu64(t[2 * i], a.v[i], a.v[i]);
        t[2 * i + 1] = _mm512_madd52hi_epu64(t[2 * i + 1], a.v[i], a.v[i]);
    }
    // Montgomery reduction (same as montmul8)
    const __m512i pinv = _mm512_set1_epi64((long long)P_INV52);
    __m512i pv[8];
    for (int j = 0; j < 8; ++j) pv[j] = _mm512_set1_epi64((long long)P52[j]);
    for (int i = 0; i < 8; ++i) {
        __m512i m = _mm512_madd52lo_epu64(zero, t[i], pinv);
        for (int j = 0; j < 8; ++j) {
            t[i + j] = _mm512_madd52lo_epu64(t[i + j], m, pv[j]);
            t[i + j + 1] = _mm512_madd52hi_epu64(t[i + j + 1], m, pv[j]);
        }
        t[i + 1] = _mm512_add_epi64(t[i + 1], _mm512_srli_epi64(t[i], 52));
    }
    for (int j = 0; j < 8; ++j) r.v[j] = t[8 + j];
    carry_prop(r.v);
    csub_p(r.v);
}

// broadcast one packed element to all lanes
inline void broadcast8(const u64 src[8], Fq8 &out) {
    for (int j = 0; j < 8; ++j)
        out.v[j] = _mm512_set1_epi64((long long)src[j]);
}

inline void set_zero8(Fq8 &out) {
    for (int j = 0; j < 8; ++j) out.v[j] = _mm512_setzero_si512();
}

// lane-wise select: r = m ? a : b (per lane bit)
inline void select8(__mmask8 m, const Fq8 &a, const Fq8 &b, Fq8 &r) {
    for (int j = 0; j < 8; ++j)
        r.v[j] = _mm512_mask_blend_epi64(m, b.v[j], a.v[j]);
}

// lane-wise equality of canonical elements
inline __mmask8 eq8(const Fq8 &a, const Fq8 &b) {
    __m512i diff = _mm512_xor_si512(a.v[0], b.v[0]);
    for (int j = 1; j < 8; ++j)
        diff = _mm512_or_si512(diff, _mm512_xor_si512(a.v[j], b.v[j]));
    return _mm512_cmpeq_epu64_mask(diff, _mm512_setzero_si512());
}

// lane-wise is-zero of canonical elements
inline __mmask8 is_zero8(const Fq8 &a) {
    __m512i acc = a.v[0];
    for (int j = 1; j < 8; ++j) acc = _mm512_or_si512(acc, a.v[j]);
    return _mm512_cmpeq_epu64_mask(acc, _mm512_setzero_si512());
}

}  // namespace ifma

#else
#define CP_HAVE_IFMA 0
#endif
