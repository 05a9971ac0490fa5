// BN254 (alt_bn128) host-side pairing verifier — native C++ companion to
// ops/ref_bn254.py (the pure-Python oracle it is bit-tested against).
//
// Role parity with the reference stack: the verifier-side pairing product
// check that arkworks provides to the Rust verifier
// (co-noir-spartan/co-spartan verifier paths; SURVEY.md §0 "ark-ec").
// The prover never calls this — it is the host verifier's hot loop
// (nv+1 pairings per PST13 opening), ~20x faster than the Python oracle.
//
// Algorithm structure mirrors ref_bn254.py exactly (optimal-ate Miller loop
// over an FQ12 polynomial-basis tower, points lifted via the sextic twist,
// one shared final exponentiation), itself derived from the Ethereum
// Foundation's public py_ecc (MIT). Nothing here derives from
// /root/reference.
//
// Build: g++ -O3 -shared -fPIC -o libbn254host.so bn254_host.cpp
// ABI: see multi_pairing_is_one / pairing_check_bytes at the bottom.

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------- Fq (mod P)
// P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
static const u64 P_LIMBS[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL};
// -P^{-1} mod 2^64 (Montgomery n0')
static const u64 N0INV = 0x87d20782e4866389ULL;
// R^2 mod P (R = 2^256)
static const u64 R2_LIMBS[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                                0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};

struct Fq {
    u64 v[4];  // Montgomery form
};

static inline bool geq_p(const u64 a[4]) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] > P_LIMBS[i]) return true;
        if (a[i] < P_LIMBS[i]) return false;
    }
    return true;  // equal
}

static inline void sub_p(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - P_LIMBS[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline Fq fq_add(const Fq &a, const Fq &b) {
    Fq r;
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        r.v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_p(r.v)) sub_p(r.v);
    return r;
}

static inline Fq fq_sub(const Fq &a, const Fq &b) {
    Fq r;
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        r.v[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)r.v[i] + P_LIMBS[i] + carry;
            r.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
    return r;
}

static inline Fq fq_neg(const Fq &a) {
    Fq zero{};
    return fq_sub(zero, a);
}

// CIOS Montgomery multiplication
static inline Fq fq_mul(const Fq &a, const Fq &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * N0INV;
        carry = ((u128)t[0] + (u128)m * P_LIMBS[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 c2 = (u128)t[j] + (u128)m * P_LIMBS[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    Fq r;
    memcpy(r.v, t, 32);
    if (t[4] || geq_p(r.v)) sub_p(r.v);
    return r;
}

static inline bool fq_is_zero(const Fq &a) {
    return !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
}

static inline bool fq_eq(const Fq &a, const Fq &b) {
    return !memcmp(a.v, b.v, 32);
}

static Fq fq_from_u64(u64 x) {
    Fq r{{x, 0, 0, 0}};
    Fq r2;
    memcpy(r2.v, R2_LIMBS, 32);
    return fq_mul(r, r2);  // to Montgomery
}

static Fq fq_from_std(const u64 limbs[4]) {
    Fq r;
    memcpy(r.v, limbs, 32);
    Fq r2;
    memcpy(r2.v, R2_LIMBS, 32);
    return fq_mul(r, r2);
}

static void fq_to_std(const Fq &a, u64 out[4]) {
    // Montgomery reduce once (multiply by 1)
    Fq one{{1, 0, 0, 0}};
    Fq r = fq_mul(a, one);
    memcpy(out, r.v, 32);
}

// a^(P-2) — Fermat inverse (not hot; clarity over speed)
static Fq fq_inv(const Fq &a) {
    // exponent P-2
    u64 e[4];
    memcpy(e, P_LIMBS, 32);
    // subtract 2
    if (e[0] >= 2) {
        e[0] -= 2;
    } else {
        e[0] = e[0] - 2;  // wraps; borrow
        int i = 1;
        while (e[i] == 0) e[i++] -= 1;
        e[i] -= 1;
    }
    Fq result = fq_from_u64(1);
    Fq base = a;
    for (int limb = 0; limb < 4; ++limb) {
        for (int bit = 0; bit < 64; ++bit) {
            if ((e[limb] >> bit) & 1) result = fq_mul(result, base);
            base = fq_mul(base, base);
        }
    }
    return result;
}

// ---------------------------------------------------------------- FQ12 tower
// FQ12 = FQ[w] / (w^12 - 18 w^6 + 82), matching ref_bn254.py exactly.

struct Fq12 {
    Fq c[12];
};

static Fq12 fq12_zero() {
    Fq12 r{};
    return r;
}

static Fq12 fq12_one() {
    Fq12 r{};
    r.c[0] = fq_from_u64(1);
    return r;
}

static bool fq12_eq(const Fq12 &a, const Fq12 &b) {
    for (int i = 0; i < 12; ++i)
        if (!fq_eq(a.c[i], b.c[i])) return false;
    return true;
}

static bool fq12_is_zero(const Fq12 &a) {
    for (int i = 0; i < 12; ++i)
        if (!fq_is_zero(a.c[i])) return false;
    return true;
}

static Fq12 fq12_add(const Fq12 &a, const Fq12 &b) {
    Fq12 r;
    for (int i = 0; i < 12; ++i) r.c[i] = fq_add(a.c[i], b.c[i]);
    return r;
}

static Fq12 fq12_sub(const Fq12 &a, const Fq12 &b) {
    Fq12 r;
    for (int i = 0; i < 12; ++i) r.c[i] = fq_sub(a.c[i], b.c[i]);
    return r;
}

static Fq12 fq12_neg(const Fq12 &a) {
    Fq12 r;
    for (int i = 0; i < 12; ++i) r.c[i] = fq_neg(a.c[i]);
    return r;
}

static Fq12 fq12_scalar(const Fq12 &a, const Fq &s) {
    Fq12 r;
    for (int i = 0; i < 12; ++i) r.c[i] = fq_mul(a.c[i], s);
    return r;
}

// schoolbook 12x12 then reduce by w^12 = 18 w^6 - 82
static Fq12 fq12_mul(const Fq12 &a, const Fq12 &b) {
    Fq t[23] = {};
    for (int i = 0; i < 12; ++i) {
        if (fq_is_zero(a.c[i])) continue;
        for (int j = 0; j < 12; ++j)
            t[i + j] = fq_add(t[i + j], fq_mul(a.c[i], b.c[j]));
    }
    const Fq k18 = fq_from_u64(18);
    const Fq k82 = fq_from_u64(82);
    for (int i = 22; i >= 12; --i) {
        if (fq_is_zero(t[i])) continue;
        // w^i = w^(i-12) * (18 w^6 - 82)
        t[i - 6] = fq_add(t[i - 6], fq_mul(t[i], k18));
        t[i - 12] = fq_sub(t[i - 12], fq_mul(t[i], k82));
        t[i] = Fq{};
    }
    Fq12 r;
    memcpy(r.c, t, sizeof(Fq) * 12);
    return r;
}

static Fq12 fq12_sq(const Fq12 &a) { return fq12_mul(a, a); }

// extended Euclid over FQ[x] — direct transliteration of
// PolyExtField.inv (ref_bn254.py)
static void poly_rounded_div(const Fq *a, int lena, const Fq *b, int lenb,
                             Fq *out, int &leno) {
    auto deg = [](const Fq *p, int n) {
        for (int i = n - 1; i >= 0; --i)
            if (!fq_is_zero(p[i])) return i;
        return 0;
    };
    int dega = deg(a, lena), degb = deg(b, lenb);
    Fq temp[14];
    for (int i = 0; i < lena; ++i) temp[i] = a[i];
    Fq o[14] = {};
    Fq binv = fq_inv(b[degb]);
    for (int i = dega - degb; i >= 0; --i) {
        o[i] = fq_add(o[i], fq_mul(temp[degb + i], binv));
        for (int c = 0; c <= degb; ++c)
            temp[c + i] = fq_sub(temp[c + i], fq_mul(o[i], b[c]));
    }
    leno = deg(o, 14) + 1;
    for (int i = 0; i < leno; ++i) out[i] = o[i];
}

static Fq12 fq12_inv(const Fq12 &a) {
    const int d = 12;
    Fq lm[14] = {}, hm[14] = {}, low[14] = {}, high[14] = {};
    lm[0] = fq_from_u64(1);
    for (int i = 0; i < d; ++i) low[i] = a.c[i];
    // modulus_coeffs = (82, 0,...,0, -18, 0,...,0) + leading 1
    high[0] = fq_from_u64(82);
    high[6] = fq_neg(fq_from_u64(18));
    high[12] = fq_from_u64(1);

    auto deg = [](const Fq *p, int n) {
        for (int i = n - 1; i >= 0; --i)
            if (!fq_is_zero(p[i])) return i;
        return 0;
    };

    while (deg(low, 14) > 0) {
        Fq rq[14];
        int lenr;
        poly_rounded_div(high, 14, low, 14, rq, lenr);
        Fq nm[14], nw[14];
        memcpy(nm, hm, sizeof(hm));
        memcpy(nw, high, sizeof(high));
        for (int i = 0; i <= d; ++i)
            for (int j = 0; j + i <= d; ++j) {
                if (i < lenr) {
                    nm[i + j] = fq_sub(nm[i + j], fq_mul(lm[j], rq[i]));
                    nw[i + j] = fq_sub(nw[i + j], fq_mul(low[j], rq[i]));
                }
            }
        memcpy(hm, lm, sizeof(lm));
        memcpy(high, low, sizeof(low));
        memcpy(lm, nm, sizeof(nm));
        memcpy(low, nw, sizeof(nw));
    }
    Fq c0inv = fq_inv(low[0]);
    Fq12 r;
    for (int i = 0; i < d; ++i) r.c[i] = fq_mul(lm[i], c0inv);
    return r;
}

// Frobenius x -> x^P via generic square-and-multiply (used twice per
// Miller loop; not hot enough to justify precomputed coefficient tables)
static Fq12 fq12_pow_p(const Fq12 &a) {
    Fq12 result = fq12_one();
    Fq12 base = a;
    for (int limb = 0; limb < 4; ++limb)
        for (int bit = 0; bit < 64; ++bit) {
            if ((P_LIMBS[limb] >> bit) & 1) result = fq12_mul(result, base);
            base = fq12_sq(base);
        }
    return result;
}

// ------------------------------------------------------- curve over FQ12
struct PtFq12 {
    Fq12 x, y;
    bool inf;
};

static PtFq12 pt_double(const PtFq12 &p) {
    if (p.inf || fq12_is_zero(p.y)) return PtFq12{fq12_zero(), fq12_zero(), true};
    Fq12 x2 = fq12_sq(p.x);
    Fq12 num = fq12_add(fq12_add(x2, x2), x2);           // 3x^2
    Fq12 den = fq12_add(p.y, p.y);                        // 2y
    Fq12 m = fq12_mul(num, fq12_inv(den));
    Fq12 nx = fq12_sub(fq12_sub(fq12_sq(m), p.x), p.x);
    Fq12 ny = fq12_sub(fq12_mul(m, fq12_sub(p.x, nx)), p.y);
    return PtFq12{nx, ny, false};
}

static PtFq12 pt_add(const PtFq12 &p1, const PtFq12 &p2) {
    if (p1.inf) return p2;
    if (p2.inf) return p1;
    if (fq12_eq(p1.x, p2.x)) {
        if (fq12_eq(p1.y, p2.y)) return pt_double(p1);
        return PtFq12{fq12_zero(), fq12_zero(), true};
    }
    Fq12 m = fq12_mul(fq12_sub(p2.y, p1.y), fq12_inv(fq12_sub(p2.x, p1.x)));
    Fq12 nx = fq12_sub(fq12_sub(fq12_sq(m), p1.x), p2.x);
    Fq12 ny = fq12_sub(fq12_mul(m, fq12_sub(p1.x, nx)), p1.y);
    return PtFq12{nx, ny, false};
}

// linefunc — transliteration of ref_bn254.linefunc
static Fq12 linefunc(const PtFq12 &p1, const PtFq12 &p2, const PtFq12 &t) {
    if (!fq12_eq(p1.x, p2.x)) {
        Fq12 m = fq12_mul(fq12_sub(p2.y, p1.y),
                          fq12_inv(fq12_sub(p2.x, p1.x)));
        return fq12_sub(fq12_mul(m, fq12_sub(t.x, p1.x)),
                        fq12_sub(t.y, p1.y));
    } else if (fq12_eq(p1.y, p2.y)) {
        Fq12 x2 = fq12_sq(p1.x);
        Fq12 num = fq12_add(fq12_add(x2, x2), x2);
        Fq12 m = fq12_mul(num, fq12_inv(fq12_add(p1.y, p1.y)));
        return fq12_sub(fq12_mul(m, fq12_sub(t.x, p1.x)),
                        fq12_sub(t.y, p1.y));
    }
    return fq12_sub(t.x, p1.x);
}

// --------------------------------------------------------------- Miller loop
static const u64 ATE_LOOP_COUNT = 29793968203157093288ULL;
static const int LOG_ATE = 63;

// twist: lift (x, y) in FQ2 (c0 + c1*i) to FQ12 * w^2 / w^3 — mirrors
// ref_bn254.twist: xc = (x0 - 9 x1, x1) placed at coeffs (0, 6), then * w^k.
static Fq12 twist_coord(const Fq &c0, const Fq &c1, int wpow) {
    Fq nine = fq_from_u64(9);
    Fq12 r = fq12_zero();
    r.c[0] = fq_sub(c0, fq_mul(nine, c1));
    r.c[6] = c1;
    // multiply by w^wpow: shift coefficients (w^12 = 18w^6 - 82 reduction
    // not needed for wpow <= 3 from degree <= 6 -> max 9)
    Fq12 s = fq12_zero();
    for (int i = 0; i < 12 - wpow; ++i) s.c[i + wpow] = r.c[i];
    return s;
}

static Fq12 miller_loop(const Fq q_g2[4], const Fq p_g1[2], bool q_inf,
                        bool p_inf) {
    if (q_inf || p_inf) return fq12_one();
    PtFq12 q;
    q.x = twist_coord(q_g2[0], q_g2[1], 2);
    q.y = twist_coord(q_g2[2], q_g2[3], 3);
    q.inf = false;
    PtFq12 pt;
    pt.x = fq12_zero();
    pt.x.c[0] = p_g1[0];
    pt.y = fq12_zero();
    pt.y.c[0] = p_g1[1];
    pt.inf = false;

    PtFq12 r = q;
    Fq12 f = fq12_one();
    for (int i = LOG_ATE; i >= 0; --i) {
        f = fq12_mul(fq12_sq(f), linefunc(r, r, pt));
        r = pt_double(r);
        if (ATE_LOOP_COUNT & (1ULL << i)) {
            f = fq12_mul(f, linefunc(r, q, pt));
            r = pt_add(r, q);
        }
    }
    PtFq12 q1{fq12_pow_p(q.x), fq12_pow_p(q.y), false};
    PtFq12 nq2{fq12_pow_p(q1.x), fq12_neg(fq12_pow_p(q1.y)), false};
    f = fq12_mul(f, linefunc(r, q1, pt));
    r = pt_add(r, q1);
    f = fq12_mul(f, linefunc(r, nq2, pt));
    return f;
}

// final exponent (P^12 - 1) / R passed in as little-endian bits from the
// caller (Python computes the 3184-bit constant exactly)
static Fq12 fq12_pow_bits(const Fq12 &a, const uint8_t *bits, int nbits) {
    Fq12 result = fq12_one();
    Fq12 base = a;
    for (int i = 0; i < nbits; ++i) {
        if (bits[i >> 3] & (1 << (i & 7))) result = fq12_mul(result, base);
        base = fq12_sq(base);
    }
    return result;
}

// ------------------------------------------------------------------- C ABI
extern "C" {

// g1: n points, 8 u64 each (x, y little-endian 4-limb standard form);
//     (0, 0) encodes infinity.
// g2: n points, 16 u64 each (x0, x1, y0, y1); all-zero encodes infinity.
// fexp_bits: (P^12-1)/R as packed little-endian bits.
// returns 1 if prod e(P_i, Q_i) == 1 else 0.
int multi_pairing_is_one(const u64 *g1, const u64 *g2, int n,
                         const uint8_t *fexp_bits, int fexp_nbits) {
    Fq12 acc = fq12_one();
    for (int k = 0; k < n; ++k) {
        const u64 *p = g1 + 8 * k;
        const u64 *q = g2 + 16 * k;
        bool p_inf = true, q_inf = true;
        for (int i = 0; i < 8; ++i) p_inf &= (p[i] == 0);
        for (int i = 0; i < 16; ++i) q_inf &= (q[i] == 0);
        Fq pg[2] = {fq_from_std(p), fq_from_std(p + 4)};
        Fq qg[4] = {fq_from_std(q), fq_from_std(q + 4), fq_from_std(q + 8),
                    fq_from_std(q + 12)};
        acc = fq12_mul(acc, miller_loop(qg, pg, q_inf, p_inf));
    }
    Fq12 out = fq12_pow_bits(acc, fexp_bits, fexp_nbits);
    return fq12_eq(out, fq12_one()) ? 1 : 0;
}

// single pairing, result written as 12 coefficients in standard form
// (for differential testing against the Python oracle)
void pairing_raw(const u64 *g1, const u64 *g2, const uint8_t *fexp_bits,
                 int fexp_nbits, u64 *out /* 12*4 limbs */) {
    bool p_inf = true, q_inf = true;
    for (int i = 0; i < 8; ++i) p_inf &= (g1[i] == 0);
    for (int i = 0; i < 16; ++i) q_inf &= (g2[i] == 0);
    Fq pg[2] = {fq_from_std(g1), fq_from_std(g1 + 4)};
    Fq qg[4] = {fq_from_std(g2), fq_from_std(g2 + 4), fq_from_std(g2 + 8),
                fq_from_std(g2 + 12)};
    Fq12 f = miller_loop(qg, pg, q_inf, p_inf);
    Fq12 e = fq12_pow_bits(f, fexp_bits, fexp_nbits);
    for (int i = 0; i < 12; ++i) fq_to_std(e.c[i], out + 4 * i);
}

}  // extern "C"
