/* Native BLS12-381 host backend: Fp on 6x64 Montgomery limbs, the
 * Fp2/Fp6/Fp12 tower, Jacobian G1 with a wNAF Straus MSM, and the
 * optimal-ate pairing (Miller loop on the twist + cyclotomic final
 * exponentiation).
 *
 * Role in the framework: the VERIFIER is O(1) and host-resident
 * (SURVEY.md §3.3); its cost is ~30 small MSM points and 2 pairings.
 * The pure-Python tower (fields/fp.py, curves/pairing.py, pcs/msm.py)
 * is the readable ORACLE — this file re-implements the exact same
 * algebra natively (same tower: Fp2=Fp[u]/(u^2+1), Fp6=Fp2[v]/(v^3-
 * (u+1)), Fp12=Fp6[w]/(w^2-v); same Miller-loop/line shape; same
 * Hayashida-Hayasaka-Teruya hard part) and is asserted bit-equal in
 * tests/test_native_bls.py.  Python callers fall back to the oracle
 * when no C compiler is present (tpu_plonk/native/__init__.py).
 *
 * Boundary convention: field elements cross as CANONICAL (non-
 * Montgomery) little-endian u64[6]; scalars as u64[4].  Conversion to
 * Montgomery form happens on load.
 *
 * Reference analog: dusk-plonk verifies through bls12_381's pairing
 * (SURVEY.md §2.4/§3.3); this is that stack's role, built natively.
 */

#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;

typedef struct { uint64_t l[6]; } fp;
typedef struct { fp c0, c1; } fp2;
typedef struct { fp2 c0, c1, c2; } fp6;
typedef struct { fp6 c0, c1; } fp12;

/* ---- constants (little-endian u64 limbs) ------------------------------- */

static const fp P = {{0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                      0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                      0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL}};
static const fp R2 = {{0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL,
                       0x8de5476c4c95b6d5ULL, 0x67eb88a9939d83c0ULL,
                       0x9a793e85b519952dULL, 0x11988fe592cae3aaULL}};
static const fp ONE = {{0x760900000002fffdULL, 0xebf4000bc40c0002ULL,
                        0x5f48985753c758baULL, 0x77ce585370525745ULL,
                        0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL}};
static const uint64_t INV = 0x89f3fffcfffcfffdULL;
/* BLS parameter magnitude (x is negative for BLS12-381) */
static const uint64_t BLS_X = 0xd201000000010000ULL;
/* (x_signed - 1)^2 / 3 = ((|x|+1)^2)/3, 126 bits */
static const uint64_t HARD_C[2] = {0x8c00aaab0000aaabULL,
                                   0x396c8c005555e156ULL};
/* (p - 1) / 6, exponent for the Frobenius gamma base */
static const uint64_t P1_OVER_6[6] = {
    0x49aa7ffffffff1c7ULL, 0x051caaaa72e35555ULL, 0xe688231ad3c82906ULL,
    0xe613e1eb7deb831fULL, 0x0c849bf3b5e1f223ULL, 0x045582fc5eeaa66fULL};

/* ---- Fp ----------------------------------------------------------------- */

static inline int fp_is_zero(const fp *a)
{
    uint64_t r = 0;
    for (int i = 0; i < 6; i++) r |= a->l[i];
    return r == 0;
}

static inline int fp_eq(const fp *a, const fp *b)
{
    uint64_t r = 0;
    for (int i = 0; i < 6; i++) r |= a->l[i] ^ b->l[i];
    return r == 0;
}

/* a >= b over 6 limbs */
static inline int fp_geq(const fp *a, const fp *b)
{
    for (int i = 5; i >= 0; i--) {
        if (a->l[i] > b->l[i]) return 1;
        if (a->l[i] < b->l[i]) return 0;
    }
    return 1;
}

static inline void fp_sub_raw(fp *r, const fp *a, const fp *b)
{
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a->l[i] - b->l[i] - (uint64_t)borrow;
        r->l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fp_add(fp *r, const fp *a, const fp *b)
{
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a->l[i] + b->l[i] + (uint64_t)carry;
        r->l[i] = (uint64_t)s;
        carry = s >> 64;
    }
    /* p < 2^382 so no limb overflow past carry; reduce once */
    if (carry || fp_geq(r, &P)) fp_sub_raw(r, r, &P);
}

static inline void fp_sub(fp *r, const fp *a, const fp *b)
{
    if (fp_geq(a, b)) {
        fp_sub_raw(r, a, b);
    } else {
        /* a + p - b; a + p < 2p < 2^382 never carries out of limb 5 */
        fp t;
        u128 carry = 0;
        for (int i = 0; i < 6; i++) {
            u128 s = (u128)a->l[i] + P.l[i] + (uint64_t)carry;
            t.l[i] = (uint64_t)s;
            carry = s >> 64;
        }
        fp_sub_raw(r, &t, b);
    }
}

static inline void fp_neg(fp *r, const fp *a)
{
    if (fp_is_zero(a)) { *r = *a; return; }
    fp_sub_raw(r, &P, a);
}

static inline void fp_dbl(fp *r, const fp *a) { fp_add(r, a, a); }

/* CIOS Montgomery multiplication: r = a*b*R^-1 mod p */
static void fp_mul(fp *r, const fp *a, const fp *b)
{
    uint64_t t[8] = {0};
    for (int i = 0; i < 6; i++) {
        u128 carry = 0;
        uint64_t ai = a->l[i];
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)ai * b->l[j] + t[j] + (uint64_t)carry;
            t[j] = (uint64_t)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[6] + (uint64_t)carry;
        t[6] = (uint64_t)s;
        t[7] = (uint64_t)(s >> 64);

        uint64_t m = t[0] * INV;
        carry = 0;
        u128 s0 = (u128)m * P.l[0] + t[0];
        carry = s0 >> 64;
        for (int j = 1; j < 6; j++) {
            u128 s2 = (u128)m * P.l[j] + t[j] + (uint64_t)carry;
            t[j - 1] = (uint64_t)s2;
            carry = s2 >> 64;
        }
        u128 s3 = (u128)t[6] + (uint64_t)carry;
        t[5] = (uint64_t)s3;
        t[6] = t[7] + (uint64_t)(s3 >> 64);
        t[7] = 0;
    }
    fp out;
    memcpy(out.l, t, 48);
    if (t[6] || fp_geq(&out, &P)) fp_sub_raw(&out, &out, &P);
    *r = out;
}

static inline void fp_sqr(fp *r, const fp *a) { fp_mul(r, a, a); }

static void fp_to_mont(fp *r, const fp *a) { fp_mul(r, a, &R2); }

static void fp_from_mont(fp *r, const fp *a)
{
    fp one = {{1, 0, 0, 0, 0, 0}};
    fp_mul(r, a, &one);
}

/* Binary extended Euclid modular inverse of the integer value x
 * (0 < x < p).  On a Montgomery residue aR this yields a^-1 R^-1;
 * callers re-scale by R2 twice to recover Montgomery form. */
static void fp_inv_raw(fp *r, const fp *x)
{
    fp u = *x, v = P, b = {{1, 0, 0, 0, 0, 0}}, c = {{0}};
    fp one = {{1, 0, 0, 0, 0, 0}};
    while (!fp_eq(&u, &one) && !fp_eq(&v, &one)) {
        while (!(u.l[0] & 1)) {
            /* u >>= 1 */
            for (int i = 0; i < 5; i++)
                u.l[i] = (u.l[i] >> 1) | (u.l[i + 1] << 63);
            u.l[5] >>= 1;
            if (b.l[0] & 1) {
                /* b += p, may carry into bit 384 */
                u128 carry = 0;
                uint64_t hi = 0;
                for (int i = 0; i < 6; i++) {
                    u128 s = (u128)b.l[i] + P.l[i] + (uint64_t)carry;
                    b.l[i] = (uint64_t)s;
                    carry = s >> 64;
                }
                hi = (uint64_t)carry;
                for (int i = 0; i < 5; i++)
                    b.l[i] = (b.l[i] >> 1) | (b.l[i + 1] << 63);
                b.l[5] = (b.l[5] >> 1) | (hi << 63);
            } else {
                for (int i = 0; i < 5; i++)
                    b.l[i] = (b.l[i] >> 1) | (b.l[i + 1] << 63);
                b.l[5] >>= 1;
            }
        }
        while (!(v.l[0] & 1)) {
            for (int i = 0; i < 5; i++)
                v.l[i] = (v.l[i] >> 1) | (v.l[i + 1] << 63);
            v.l[5] >>= 1;
            if (c.l[0] & 1) {
                u128 carry = 0;
                uint64_t hi = 0;
                for (int i = 0; i < 6; i++) {
                    u128 s = (u128)c.l[i] + P.l[i] + (uint64_t)carry;
                    c.l[i] = (uint64_t)s;
                    carry = s >> 64;
                }
                hi = (uint64_t)carry;
                for (int i = 0; i < 5; i++)
                    c.l[i] = (c.l[i] >> 1) | (c.l[i + 1] << 63);
                c.l[5] = (c.l[5] >> 1) | (hi << 63);
            } else {
                for (int i = 0; i < 5; i++)
                    c.l[i] = (c.l[i] >> 1) | (c.l[i + 1] << 63);
                c.l[5] >>= 1;
            }
        }
        if (fp_geq(&u, &v)) {
            fp_sub_raw(&u, &u, &v);
            fp_sub(&b, &b, &c); /* mod-p subtract keeps b < p */
        } else {
            fp_sub_raw(&v, &v, &u);
            fp_sub(&c, &c, &b);
        }
    }
    *r = fp_eq(&u, &one) ? b : c;
}

/* Montgomery-domain inverse: in aR, out a^-1 R */
static void fp_inv(fp *r, const fp *a)
{
    fp t;
    fp_inv_raw(&t, a);      /* a^-1 R^-1 */
    fp_mul(&t, &t, &R2);    /* a^-1     */
    fp_mul(r, &t, &R2);     /* a^-1 R   */
}

/* ---- Fp2 = Fp[u]/(u^2+1) ------------------------------------------------ */

static inline void f2_add(fp2 *r, const fp2 *a, const fp2 *b)
{ fp_add(&r->c0, &a->c0, &b->c0); fp_add(&r->c1, &a->c1, &b->c1); }

static inline void f2_sub(fp2 *r, const fp2 *a, const fp2 *b)
{ fp_sub(&r->c0, &a->c0, &b->c0); fp_sub(&r->c1, &a->c1, &b->c1); }

static inline void f2_neg(fp2 *r, const fp2 *a)
{ fp_neg(&r->c0, &a->c0); fp_neg(&r->c1, &a->c1); }

static inline void f2_dbl(fp2 *r, const fp2 *a) { f2_add(r, a, a); }

static void f2_mul(fp2 *r, const fp2 *a, const fp2 *b)
{
    fp t0, t1, t2, s0, s1;
    fp_mul(&t0, &a->c0, &b->c0);
    fp_mul(&t1, &a->c1, &b->c1);
    fp_add(&s0, &a->c0, &a->c1);
    fp_add(&s1, &b->c0, &b->c1);
    fp_mul(&t2, &s0, &s1);
    fp_sub(&r->c0, &t0, &t1);
    fp_sub(&t2, &t2, &t0);
    fp_sub(&r->c1, &t2, &t1);
}

static void f2_sqr(fp2 *r, const fp2 *a)
{
    fp t, s0, s1;
    fp_mul(&t, &a->c0, &a->c1);
    fp_add(&s0, &a->c0, &a->c1);
    fp_sub(&s1, &a->c0, &a->c1);
    fp_mul(&r->c0, &s0, &s1);
    fp_dbl(&r->c1, &t);
}

static void f2_scale(fp2 *r, const fp2 *a, const fp *k)
{ fp_mul(&r->c0, &a->c0, k); fp_mul(&r->c1, &a->c1, k); }

static void f2_inv(fp2 *r, const fp2 *a)
{
    fp t0, t1, d;
    fp_sqr(&t0, &a->c0);
    fp_sqr(&t1, &a->c1);
    fp_add(&d, &t0, &t1);
    fp_inv(&d, &d);
    fp_mul(&r->c0, &a->c0, &d);
    fp neg;
    fp_neg(&neg, &a->c1);
    fp_mul(&r->c1, &neg, &d);
}

static inline void f2_conj(fp2 *r, const fp2 *a)
{ r->c0 = a->c0; fp_neg(&r->c1, &a->c1); }

/* * (u + 1) */
static inline void f2_mul_nr(fp2 *r, const fp2 *a)
{
    fp t0, t1;
    fp_sub(&t0, &a->c0, &a->c1);
    fp_add(&t1, &a->c0, &a->c1);
    r->c0 = t0; r->c1 = t1;
}

static inline int f2_is_zero(const fp2 *a)
{ return fp_is_zero(&a->c0) && fp_is_zero(&a->c1); }

static inline int f2_eq(const fp2 *a, const fp2 *b)
{ return fp_eq(&a->c0, &b->c0) && fp_eq(&a->c1, &b->c1); }

/* ---- Fp6 = Fp2[v]/(v^3 - (u+1)) ----------------------------------------- */

static void f6_add(fp6 *r, const fp6 *a, const fp6 *b)
{ f2_add(&r->c0, &a->c0, &b->c0); f2_add(&r->c1, &a->c1, &b->c1);
  f2_add(&r->c2, &a->c2, &b->c2); }

static void f6_sub(fp6 *r, const fp6 *a, const fp6 *b)
{ f2_sub(&r->c0, &a->c0, &b->c0); f2_sub(&r->c1, &a->c1, &b->c1);
  f2_sub(&r->c2, &a->c2, &b->c2); }

static void f6_neg(fp6 *r, const fp6 *a)
{ f2_neg(&r->c0, &a->c0); f2_neg(&r->c1, &a->c1); f2_neg(&r->c2, &a->c2); }

static void f6_mul(fp6 *r, const fp6 *a, const fp6 *b)
{
    fp2 t0, t1, t2, s0, s1, x, y;
    f2_mul(&t0, &a->c0, &b->c0);
    f2_mul(&t1, &a->c1, &b->c1);
    f2_mul(&t2, &a->c2, &b->c2);
    /* c0 = t0 + nr((a1+a2)(b1+b2) - t1 - t2) */
    f2_add(&s0, &a->c1, &a->c2);
    f2_add(&s1, &b->c1, &b->c2);
    f2_mul(&x, &s0, &s1);
    f2_sub(&x, &x, &t1);
    f2_sub(&x, &x, &t2);
    f2_mul_nr(&x, &x);
    fp2 c0;
    f2_add(&c0, &t0, &x);
    /* c1 = (a0+a1)(b0+b1) - t0 - t1 + nr(t2) */
    f2_add(&s0, &a->c0, &a->c1);
    f2_add(&s1, &b->c0, &b->c1);
    f2_mul(&x, &s0, &s1);
    f2_sub(&x, &x, &t0);
    f2_sub(&x, &x, &t1);
    f2_mul_nr(&y, &t2);
    fp2 c1;
    f2_add(&c1, &x, &y);
    /* c2 = (a0+a2)(b0+b2) - t0 - t2 + t1 */
    f2_add(&s0, &a->c0, &a->c2);
    f2_add(&s1, &b->c0, &b->c2);
    f2_mul(&x, &s0, &s1);
    f2_sub(&x, &x, &t0);
    f2_sub(&x, &x, &t2);
    f2_add(&r->c2, &x, &t1);
    r->c0 = c0; r->c1 = c1;
}

/* * v : (a0, a1, a2) -> (nr(a2), a0, a1) */
static void f6_mul_nr(fp6 *r, const fp6 *a)
{
    fp2 t;
    f2_mul_nr(&t, &a->c2);
    r->c2 = a->c1; r->c1 = a->c0; r->c0 = t;
}

static void f6_inv(fp6 *r, const fp6 *a)
{
    fp2 c0, c1, c2, t, x, y;
    f2_sqr(&t, &a->c0);
    f2_mul(&x, &a->c1, &a->c2);
    f2_mul_nr(&x, &x);
    f2_sub(&c0, &t, &x);
    f2_sqr(&t, &a->c2);
    f2_mul_nr(&t, &t);
    f2_mul(&x, &a->c0, &a->c1);
    f2_sub(&c1, &t, &x);
    f2_sqr(&t, &a->c1);
    f2_mul(&x, &a->c0, &a->c2);
    f2_sub(&c2, &t, &x);
    /* t = inv(a0 c0 + nr(a2 c1 + a1 c2)) */
    f2_mul(&x, &a->c2, &c1);
    f2_mul(&y, &a->c1, &c2);
    f2_add(&x, &x, &y);
    f2_mul_nr(&x, &x);
    f2_mul(&y, &a->c0, &c0);
    f2_add(&x, &x, &y);
    f2_inv(&t, &x);
    f2_mul(&r->c0, &c0, &t);
    f2_mul(&r->c1, &c1, &t);
    f2_mul(&r->c2, &c2, &t);
}

/* ---- Fp12 = Fp6[w]/(w^2 - v) -------------------------------------------- */

static void f12_mul(fp12 *r, const fp12 *a, const fp12 *b)
{
    fp6 t0, t1, s0, s1, x;
    f6_mul(&t0, &a->c0, &b->c0);
    f6_mul(&t1, &a->c1, &b->c1);
    f6_add(&s0, &a->c0, &a->c1);
    f6_add(&s1, &b->c0, &b->c1);
    f6_mul(&x, &s0, &s1);
    f6_sub(&x, &x, &t0);
    f6_sub(&x, &x, &t1);
    fp6 nt1;
    f6_mul_nr(&nt1, &t1);
    f6_add(&r->c0, &t0, &nt1);
    r->c1 = x;
}

static void f12_sqr(fp12 *r, const fp12 *a)
{
    fp6 t, vt, s0, s1, x;
    f6_mul(&t, &a->c0, &a->c1);
    f6_mul_nr(&vt, &t);
    f6_add(&s0, &a->c0, &a->c1);
    f6_mul_nr(&x, &a->c1);
    f6_add(&s1, &a->c0, &x);
    f6_mul(&x, &s0, &s1);
    f6_sub(&x, &x, &t);
    f6_sub(&r->c0, &x, &vt);
    f6_add(&r->c1, &t, &t);
}

static void f12_inv(fp12 *r, const fp12 *a)
{
    fp6 t0, t1, t;
    f6_mul(&t0, &a->c0, &a->c0);
    f6_mul(&t1, &a->c1, &a->c1);
    f6_mul_nr(&t1, &t1);
    f6_sub(&t0, &t0, &t1);
    f6_inv(&t, &t0);
    f6_mul(&r->c0, &a->c0, &t);
    fp6 m;
    f6_mul(&m, &a->c1, &t);
    f6_neg(&r->c1, &m);
}

static void f12_conj(fp12 *r, const fp12 *a)
{ r->c0 = a->c0; f6_neg(&r->c1, &a->c1); }

static void f12_one(fp12 *r)
{
    memset(r, 0, sizeof(*r));
    r->c0.c0.c0 = ONE;
}

static int f12_is_one(const fp12 *a)
{
    fp12 one;
    f12_one(&one);
    return memcmp(a, &one, sizeof(one)) == 0;
}

/* Frobenius gammas: gamma1[i] = (u+1)^(i (p-1)/6), computed at init */
static fp2 GAMMA1[6];
static int g_init_done = 0;

static void f2_pow_u64s(fp2 *r, const fp2 *a, const uint64_t *e, int n)
{
    fp2 base = *a, acc;
    acc.c0 = ONE;
    memset(&acc.c1, 0, sizeof(fp));
    for (int i = 0; i < n * 64; i++) {
        int limb = i >> 6, bit = i & 63;
        if ((e[limb] >> bit) & 1) f2_mul(&acc, &acc, &base);
        f2_sqr(&base, &base);
    }
    *r = acc;
}

static void ensure_init(void)
{
    if (g_init_done) return;
    fp2 xi;
    xi.c0 = ONE;
    xi.c1 = ONE;
    GAMMA1[0].c0 = ONE;
    memset(&GAMMA1[0].c1, 0, sizeof(fp));
    f2_pow_u64s(&GAMMA1[1], &xi, P1_OVER_6, 6);
    for (int i = 2; i < 6; i++)
        f2_mul(&GAMMA1[i], &GAMMA1[i - 1], &GAMMA1[1]);
    g_init_done = 1;
}

static void f12_frobenius(fp12 *r, const fp12 *a)
{
    fp2 t;
    f2_conj(&t, &a->c0.c0); f2_mul(&r->c0.c0, &t, &GAMMA1[0]);
    f2_conj(&t, &a->c0.c1); f2_mul(&r->c0.c1, &t, &GAMMA1[2]);
    f2_conj(&t, &a->c0.c2); f2_mul(&r->c0.c2, &t, &GAMMA1[4]);
    f2_conj(&t, &a->c1.c0); f2_mul(&r->c1.c0, &t, &GAMMA1[1]);
    f2_conj(&t, &a->c1.c1); f2_mul(&r->c1.c1, &t, &GAMMA1[3]);
    f2_conj(&t, &a->c1.c2); f2_mul(&r->c1.c2, &t, &GAMMA1[5]);
}

/* ---- cyclotomic ops (final exponentiation) ------------------------------ */

static void fp4_sqr(fp2 *c0, fp2 *c1, const fp2 *a, const fp2 *b)
{
    fp2 t0, t1, s;
    f2_sqr(&t0, a);
    f2_sqr(&t1, b);
    f2_mul_nr(&s, &t1);
    f2_add(c0, &s, &t0);
    f2_add(&s, a, b);
    f2_sqr(&s, &s);
    f2_sub(&s, &s, &t0);
    f2_sub(c1, &s, &t1);
}

/* 3t - 2z and 3t + 2z */
static void three_minus_two(fp2 *r, const fp2 *t, const fp2 *z)
{
    fp2 t3, z2;
    f2_dbl(&t3, t); f2_add(&t3, &t3, t);
    f2_dbl(&z2, z);
    f2_sub(r, &t3, &z2);
}

static void three_plus_two(fp2 *r, const fp2 *t, const fp2 *z)
{
    fp2 t3, z2;
    f2_dbl(&t3, t); f2_add(&t3, &t3, t);
    f2_dbl(&z2, z);
    f2_add(r, &t3, &z2);
}

/* Granger-Scott squaring, mirrors fields/fp.py f12_cyclo_sqr */
static void f12_cyclo_sqr(fp12 *r, const fp12 *f)
{
    fp2 z0 = f->c0.c0, z4 = f->c0.c1, z3 = f->c0.c2;
    fp2 z2 = f->c1.c0, z1 = f->c1.c1, z5 = f->c1.c2;
    fp2 t0, t1, t2, t3, nr;

    fp4_sqr(&t0, &t1, &z0, &z1);
    three_minus_two(&z0, &t0, &z0);
    three_plus_two(&z1, &t1, &z1);
    fp4_sqr(&t0, &t1, &z2, &z3);
    fp4_sqr(&t2, &t3, &z4, &z5);
    three_minus_two(&z4, &t0, &z4);
    three_plus_two(&z5, &t1, &z5);
    f2_mul_nr(&nr, &t3);
    three_plus_two(&z2, &nr, &z2);
    three_minus_two(&z3, &t2, &z3);

    r->c0.c0 = z0; r->c0.c1 = z4; r->c0.c2 = z3;
    r->c1.c0 = z2; r->c1.c1 = z1; r->c1.c2 = z5;
}

/* a^e (cyclotomic a, e as n little-endian u64 limbs), NAF digits */
static void f12_cyclo_pow(fp12 *r, const fp12 *a, const uint64_t *e_in,
                          int n)
{
    /* copy exponent into a local bignum we can mutate (n <= 6, +1 slack) */
    uint64_t e[8];
    memset(e, 0, sizeof(e));
    memcpy(e, e_in, (size_t)n * 8);
    int8_t naf[520];
    int len = 0;
    for (;;) {
        int zero = 1;
        for (int i = 0; i < 8; i++) if (e[i]) { zero = 0; break; }
        if (zero) break;
        int d = 0;
        if (e[0] & 1) {
            d = 2 - (int)(e[0] & 3);
            if (d == 1) {
                /* e -= 1 */
                for (int i = 0; i < 8; i++) { if (e[i]--) break; }
            } else {
                /* e += 1 */
                for (int i = 0; i < 8; i++) { if (++e[i]) break; }
            }
        }
        naf[len++] = (int8_t)d;
        for (int i = 0; i < 7; i++)
            e[i] = (e[i] >> 1) | (e[i + 1] << 63);
        e[7] >>= 1;
    }
    fp12 acc, aconj;
    f12_one(&acc);
    f12_conj(&aconj, a);
    for (int i = len - 1; i >= 0; i--) {
        f12_cyclo_sqr(&acc, &acc);
        if (naf[i] == 1) f12_mul(&acc, &acc, a);
        else if (naf[i] == -1) f12_mul(&acc, &acc, &aconj);
    }
    *r = acc;
}

/* f^x for cyclotomic f (x negative: pow by |x| then conjugate) */
static void exp_by_x(fp12 *r, const fp12 *f)
{
    uint64_t x[1] = {BLS_X};
    fp12 t;
    f12_cyclo_pow(&t, f, x, 1);
    f12_conj(r, &t);
}

static void final_exponentiation(fp12 *r, const fp12 *f_in)
{
    fp12 f, t, m, m1, m2, m3, x, y;
    /* easy part: f^((p^6-1)(p^2+1)) */
    f12_inv(&t, f_in);
    f12_conj(&f, f_in);
    f12_mul(&f, &f, &t);
    f12_frobenius(&t, &f);
    f12_frobenius(&t, &t);
    f12_mul(&m, &t, &f);
    /* hard part: m^(c(x+p)(x^2+p^2-1)) * m */
    f12_cyclo_pow(&m1, &m, HARD_C, 2);
    exp_by_x(&x, &m1);
    f12_frobenius(&y, &m1);
    f12_mul(&m2, &x, &y);
    exp_by_x(&x, &m2);
    exp_by_x(&x, &x);
    f12_frobenius(&y, &m2);
    f12_frobenius(&y, &y);
    f12_mul(&m3, &x, &y);
    f12_conj(&t, &m2);
    f12_mul(&m3, &m3, &t);
    f12_mul(r, &m3, &m);
}

/* ---- Miller loop (affine on the twist, mirrors curves/pairing.py) ------- */

/* f *= (c0 + c2 w^2 + c3 w^3), sparse positions {0, 2, 3} */
static void f12_mul_sparse023(fp12 *f, const fp2 *c0, const fp2 *c2,
                              const fp2 *c3)
{
    fp6 m0, t0, t1, s, a01;
    m0.c0 = *c0; m0.c1 = *c2;
    memset(&m0.c2, 0, sizeof(fp2));
    f6_mul(&t0, &f->c0, &m0);
    /* t1 = a1 * (0, c3, 0) = (nr(a1.c2 c3), a1.c0 c3, a1.c1 c3) */
    f2_mul(&t1.c1, &f->c1.c0, c3);
    f2_mul(&t1.c2, &f->c1.c1, c3);
    f2_mul(&t1.c0, &f->c1.c2, c3);
    f2_mul_nr(&t1.c0, &t1.c0);
    /* s = (a0 + a1) * (c0, c2 + c3, 0) */
    f6_add(&a01, &f->c0, &f->c1);
    fp6 msum = m0;
    f2_add(&msum.c1, &m0.c1, c3);
    f6_mul(&s, &a01, &msum);
    f6_sub(&s, &s, &t0);
    f6_sub(&s, &s, &t1);
    fp6 nt1;
    f6_mul_nr(&nt1, &t1);
    f6_add(&f->c0, &t0, &nt1);
    f->c1 = s;
}

typedef struct { fp2 x, y; } g2_aff;

/* ---- prepared lines (the verifier pairs the SAME two G2 points —
 * [tau]G2 and the G2 generator — every proof, so the line chain is
 * P-independent: cache (lam, lam*x_T - y_T) per step and the product
 * Miller loop below needs no Fp2 inversions or point updates) -------- */

#define MAX_LINES 130   /* 63 doubling + per-1-bit addition steps */
#define PREP_CACHE 8

typedef struct { fp2 lam, c0; } line_coeffs;

typedef struct {
    uint64_t key[24];            /* canonical G2 coords */
    int n;
    line_coeffs ln[MAX_LINES];
} g2_prepared;

static g2_prepared prep_cache[PREP_CACHE];
static int prep_count = 0;

/* P-independent part of line2 (t,q in Montgomery twist coords) */
static void line_coeffs_step(line_coeffs *out, g2_aff *t, const g2_aff *q)
{
    fp2 num, den, lam, x3, y3, s;
    if (f2_eq(&t->x, &q->x) && f2_eq(&t->y, &q->y)) {
        f2_sqr(&num, &t->x);
        fp2 n2;
        f2_dbl(&n2, &num);
        f2_add(&num, &n2, &num);
        f2_dbl(&den, &t->y);
    } else {
        f2_sub(&num, &q->y, &t->y);
        f2_sub(&den, &q->x, &t->x);
    }
    f2_inv(&den, &den);
    f2_mul(&lam, &num, &den);
    f2_sqr(&x3, &lam);
    f2_sub(&x3, &x3, &t->x);
    f2_sub(&x3, &x3, &q->x);
    f2_sub(&s, &t->x, &x3);
    f2_mul(&y3, &lam, &s);
    f2_sub(&y3, &y3, &t->y);
    out->lam = lam;
    f2_mul(&out->c0, &lam, &t->x);
    f2_sub(&out->c0, &out->c0, &t->y);
    t->x = x3;
    t->y = y3;
}

static const g2_prepared *prepare_g2(const uint64_t *g2_canon)
{
    for (int i = 0; i < prep_count; i++)
        if (!memcmp(prep_cache[i].key, g2_canon, 24 * 8))
            return &prep_cache[i];
    g2_prepared *p = prep_count < PREP_CACHE ? &prep_cache[prep_count++]
                                             : &prep_cache[PREP_CACHE - 1];
    memcpy(p->key, g2_canon, 24 * 8);
    g2_aff q;
    fp t;
    memcpy(t.l, g2_canon, 48);      fp_to_mont(&q.x.c0, &t);
    memcpy(t.l, g2_canon + 6, 48);  fp_to_mont(&q.x.c1, &t);
    memcpy(t.l, g2_canon + 12, 48); fp_to_mont(&q.y.c0, &t);
    memcpy(t.l, g2_canon + 18, 48); fp_to_mont(&q.y.c1, &t);
    g2_aff tt = q;
    p->n = 0;
    int started = 0;
    for (int i = 63; i >= 0; i--) {
        uint64_t bit = (BLS_X >> i) & 1;
        if (!started) { if (bit) started = 1; continue; }
        line_coeffs_step(&p->ln[p->n++], &tt, &tt);
        if (bit)
            line_coeffs_step(&p->ln[p->n++], &tt, &q);
    }
    return p;
}

/* Product of Miller loops over all live pairs with ONE shared
 * squaring chain: f <- f^2 once per bit, then every pair multiplies
 * its (prepared) line in — saves (npairs-1) full f12_sqr chains and
 * all per-step Fp2 inversions. */
static void miller_product(fp12 *f, long npairs, const fp *xp_neg,
                           const fp *yp, const g2_prepared **preps)
{
    f12_one(f);
    int idx = 0;
    int started = 0;
    for (int i = 63; i >= 0; i--) {
        uint64_t bit = (BLS_X >> i) & 1;
        if (!started) { if (bit) started = 1; continue; }
        f12_sqr(f, f);
        for (long k = 0; k < npairs; k++) {
            const line_coeffs *ln = &preps[k]->ln[idx];
            fp2 c2, c3;
            f2_scale(&c2, &ln->lam, &xp_neg[k]);
            c3.c0 = yp[k];
            memset(&c3.c1, 0, sizeof(fp));
            f12_mul_sparse023(f, &ln->c0, &c2, &c3);
        }
        idx++;
        if (bit) {
            for (long k = 0; k < npairs; k++) {
                const line_coeffs *ln = &preps[k]->ln[idx];
                fp2 c2, c3;
                f2_scale(&c2, &ln->lam, &xp_neg[k]);
                c3.c0 = yp[k];
                memset(&c3.c1, 0, sizeof(fp));
                f12_mul_sparse023(f, &ln->c0, &c2, &c3);
            }
            idx++;
        }
    }
    fp12 out;
    f12_conj(&out, f);
    *f = out;
}

/* ---- G1 Jacobian -------------------------------------------------------- */

typedef struct { fp x, y, z; } g1_jac;

static void g1_set_inf(g1_jac *p)
{
    memset(p, 0, sizeof(*p));
    p->y = ONE;
}

static inline int g1_is_inf(const g1_jac *p) { return fp_is_zero(&p->z); }

static void g1_double(g1_jac *r, const g1_jac *p)
{
    if (g1_is_inf(p)) { *r = *p; return; }
    fp a, b, c, d, e, f, x, y, z, t;
    fp_sqr(&a, &p->x);
    fp_sqr(&b, &p->y);
    fp_sqr(&c, &b);
    /* d = 2((x+b)^2 - a - c) */
    fp_add(&t, &p->x, &b);
    fp_sqr(&t, &t);
    fp_sub(&t, &t, &a);
    fp_sub(&t, &t, &c);
    fp_dbl(&d, &t);
    /* e = 3a */
    fp_dbl(&e, &a);
    fp_add(&e, &e, &a);
    fp_sqr(&f, &e);
    /* x3 = f - 2d */
    fp_dbl(&t, &d);
    fp_sub(&x, &f, &t);
    /* y3 = e(d - x3) - 8c */
    fp_sub(&t, &d, &x);
    fp_mul(&y, &e, &t);
    fp_dbl(&t, &c); fp_dbl(&t, &t); fp_dbl(&t, &t);
    fp_sub(&y, &y, &t);
    /* z3 = 2 y z */
    fp_mul(&z, &p->y, &p->z);
    fp_dbl(&z, &z);
    r->x = x; r->y = y; r->z = z;
}

static void g1_add(g1_jac *r, const g1_jac *p, const g1_jac *q)
{
    if (g1_is_inf(p)) { *r = *q; return; }
    if (g1_is_inf(q)) { *r = *p; return; }
    fp z1z1, z2z2, u1, u2, s1, s2, t;
    fp_sqr(&z1z1, &p->z);
    fp_sqr(&z2z2, &q->z);
    fp_mul(&u1, &p->x, &z2z2);
    fp_mul(&u2, &q->x, &z1z1);
    fp_mul(&s1, &p->y, &q->z);
    fp_mul(&s1, &s1, &z2z2);
    fp_mul(&s2, &q->y, &p->z);
    fp_mul(&s2, &s2, &z1z1);
    if (fp_eq(&u1, &u2)) {
        if (fp_eq(&s1, &s2)) { g1_double(r, p); return; }
        g1_set_inf(r);
        return;
    }
    fp h, i, j, rr, v, x, y, z;
    fp_sub(&h, &u2, &u1);
    fp_dbl(&t, &h);
    fp_sqr(&i, &t);
    fp_mul(&j, &h, &i);
    fp_sub(&rr, &s2, &s1);
    fp_dbl(&rr, &rr);
    fp_mul(&v, &u1, &i);
    /* x3 = r^2 - j - 2v */
    fp_sqr(&x, &rr);
    fp_sub(&x, &x, &j);
    fp_dbl(&t, &v);
    fp_sub(&x, &x, &t);
    /* y3 = r(v - x3) - 2 s1 j */
    fp_sub(&t, &v, &x);
    fp_mul(&y, &rr, &t);
    fp_mul(&t, &s1, &j);
    fp_dbl(&t, &t);
    fp_sub(&y, &y, &t);
    /* z3 = ((z1 + z2)^2 - z1z1 - z2z2) h */
    fp_add(&t, &p->z, &q->z);
    fp_sqr(&t, &t);
    fp_sub(&t, &t, &z1z1);
    fp_sub(&t, &t, &z2z2);
    fp_mul(&z, &t, &h);
    r->x = x; r->y = y; r->z = z;
}

static void g1_neg(g1_jac *r, const g1_jac *p)
{ r->x = p->x; fp_neg(&r->y, &p->y); r->z = p->z; }

/* ---- wNAF Straus MSM ----------------------------------------------------- */

#define WNAF_W 5
#define TBL (1 << (WNAF_W - 2))   /* odd multiples 1,3,..,2^(w-1)-1 */

static int wnaf_digits(const uint64_t *s_in, int8_t *out)
{
    uint64_t e[5];
    memcpy(e, s_in, 32);
    e[4] = 0;
    int len = 0;
    const int64_t half = 1 << (WNAF_W - 1);
    const int64_t full = 1 << WNAF_W;
    for (;;) {
        int zero = 1;
        for (int i = 0; i < 5; i++) if (e[i]) { zero = 0; break; }
        if (zero) break;
        int64_t d = 0;
        if (e[0] & 1) {
            d = (int64_t)(e[0] & (uint64_t)(full - 1));
            if (d >= half) d -= full;
            if (d > 0) {
                uint64_t mag = (uint64_t)d;
                for (int i = 0; i < 5; i++) {
                    uint64_t before = e[i];
                    e[i] -= mag;
                    if (before >= mag) break;
                    mag = 1;
                }
            } else {
                uint64_t mag = (uint64_t)(-d);
                for (int i = 0; i < 5; i++) {
                    e[i] += mag;
                    if (e[i] >= mag) break;
                    mag = 1;
                }
            }
        }
        out[len++] = (int8_t)d;
        for (int i = 0; i < 4; i++)
            e[i] = (e[i] >> 1) | (e[i + 1] << 63);
        e[4] >>= 1;
    }
    return len;
}

/* n points (canonical affine limbs) * n scalars -> affine out.
 * pts: n * 12 u64 (x limbs then y limbs per point); inf: n bytes;
 * scalars: n * 4 u64; out: 12 u64; out_inf: 1 byte. */
void b381_g1_msm(long n, const uint64_t *pts, const uint8_t *inf,
                 const uint64_t *scalars, uint64_t *out, uint8_t *out_inf)
{
    ensure_init();
    enum { MAXN = 64 };
    /* tables allocated per call; verifier MSMs are <= ~40 points.
     * For larger n, process in blocks (results add). */
    g1_jac acc;
    g1_set_inf(&acc);
    long done = 0;
    while (done < n) {
        long blk = n - done > MAXN ? MAXN : n - done;
        static g1_jac table[MAXN][TBL];
        static int8_t naf[MAXN][260];
        static int naf_len[MAXN];
        int used = 0;
        int top = 0;
        for (long k = 0; k < blk; k++) {
            long i = done + k;
            uint64_t sz = 0;
            for (int j = 0; j < 4; j++) sz |= scalars[i * 4 + j];
            if (inf[i] || !sz) continue;
            g1_jac base;
            fp xc, yc;
            memcpy(xc.l, pts + i * 12, 48);
            memcpy(yc.l, pts + i * 12 + 6, 48);
            fp_to_mont(&base.x, &xc);
            fp_to_mont(&base.y, &yc);
            base.z = ONE;
            g1_jac twice;
            g1_double(&twice, &base);
            table[used][0] = base;
            for (int j = 1; j < TBL; j++)
                g1_add(&table[used][j], &table[used][j - 1], &twice);
            naf_len[used] = wnaf_digits(scalars + i * 4, naf[used]);
            if (naf_len[used] > top) top = naf_len[used];
            used++;
        }
        g1_jac bacc;
        g1_set_inf(&bacc);
        for (int i = top - 1; i >= 0; i--) {
            g1_double(&bacc, &bacc);
            for (int k = 0; k < used; k++) {
                if (i >= naf_len[k]) continue;
                int d = naf[k][i];
                if (!d) continue;
                g1_jac q = table[k][(d > 0 ? d : -d) >> 1];
                if (d < 0) g1_neg(&q, &q);
                g1_add(&bacc, &bacc, &q);
            }
        }
        g1_add(&acc, &acc, &bacc);
        done += blk;
    }
    if (g1_is_inf(&acc)) {
        *out_inf = 1;
        memset(out, 0, 96);
        return;
    }
    *out_inf = 0;
    fp zi, zi2, zi3, xa, ya;
    fp_inv(&zi, &acc.z);
    fp_sqr(&zi2, &zi);
    fp_mul(&zi3, &zi2, &zi);
    fp_mul(&xa, &acc.x, &zi2);
    fp_mul(&ya, &acc.y, &zi3);
    fp xo, yo;
    fp_from_mont(&xo, &xa);
    fp_from_mont(&yo, &ya);
    memcpy(out, xo.l, 48);
    memcpy(out + 6, yo.l, 48);
}

/* ---- Keccak-f[1600] (transcript permutation) ----------------------------- */

static const uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int KECCAK_ROT[5][5] = {
    {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14}};

static inline uint64_t rotl64(uint64_t x, int n)
{ return n ? (x << n) | (x >> (64 - n)) : x; }

/* In-place permutation of 25 LE u64 lanes, lane index i = x + 5y
 * (the 200-byte STROBE state buffer, viewed as u64 on LE hosts). */
void b381_keccakf(uint64_t *st)
{
    for (int r = 0; r < 24; r++) {
        uint64_t c[5], d[5], b[25];
        for (int x = 0; x < 5; x++)
            c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++) {
                uint64_t v = rotl64(st[x + 5 * y] ^ d[x], KECCAK_ROT[x][y]);
                b[y + 5 * ((2 * x + 3 * y) % 5)] = v;
            }
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                st[x + 5 * y] = b[x + 5 * y] ^
                    (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
        st[0] ^= KECCAK_RC[r];
    }
}

/* ---- pairing product ----------------------------------------------------- */

/* prod_i e(P_i, Q_i), final-exp'd.  g1: n*12 canonical u64; g1inf: n;
 * g2: n*24 canonical u64 (x.c0, x.c1, y.c0, y.c1); g2inf: n;
 * out: 72 u64 canonical Fp12 coefficients (c0.c0.c0 .. c1.c2.c1).
 * Returns 1 iff the product equals one. */
int b381_pairing_product(long n, const uint64_t *g1pts,
                         const uint8_t *g1inf, const uint64_t *g2pts,
                         const uint8_t *g2inf, uint64_t *out)
{
    ensure_init();
    enum { MAXP = 16 };
    const g2_prepared *preps[MAXP];
    fp xp_neg[MAXP], yp[MAXP];
    long live = 0;
    fp12 f;
    f12_one(&f);
    for (long i = 0; i < n; i++) {
        if (g1inf[i] || g2inf[i]) continue;
        fp xc, yc, xm;
        memcpy(xc.l, g1pts + i * 12, 48);
        memcpy(yc.l, g1pts + i * 12 + 6, 48);
        fp_to_mont(&xm, &xc);
        fp_to_mont(&yp[live], &yc);
        fp_neg(&xp_neg[live], &xm);
        preps[live] = prepare_g2(g2pts + i * 24);
        if (++live == MAXP) {
            fp12 part;
            miller_product(&part, live, xp_neg, yp, preps);
            f12_mul(&f, &f, &part);
            live = 0;
        }
    }
    if (live) {
        fp12 part;
        miller_product(&part, live, xp_neg, yp, preps);
        f12_mul(&f, &f, &part);
    }
    fp12 r;
    final_exponentiation(&r, &f);
    /* export canonical */
    const fp *coeffs[12] = {
        &r.c0.c0.c0, &r.c0.c0.c1, &r.c0.c1.c0, &r.c0.c1.c1,
        &r.c0.c2.c0, &r.c0.c2.c1, &r.c1.c0.c0, &r.c1.c0.c1,
        &r.c1.c1.c0, &r.c1.c1.c1, &r.c1.c2.c0, &r.c1.c2.c1};
    for (int i = 0; i < 12; i++) {
        fp c;
        fp_from_mont(&c, coeffs[i]);
        memcpy(out + i * 6, c.l, 48);
    }
    return f12_is_one(&r);
}
