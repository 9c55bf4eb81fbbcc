/* GLV scalar decomposition for BLS12-381 G1 (batch, u64-limb bignum).
 *
 * k = k1 + k2*lambda mod r with |k1|, |k2| < 2^127 via Babai rounding:
 *   c1 = round(k * z2 / r),  c2 = round(k / r)
 *   k2 = c1 - c2 * z2,       k1 = k - c1*lambda - c2
 * Divisions by r run as Barrett reductions with mu = floor(2^SHIFT / r)
 * passed in from Python (manta_tpu.ops.msm derives all constants and
 * checks the identities at import).
 *
 * The Python loop this replaces costs ~5-10 s per 2^20 scalars; this
 * batch runs in tens of milliseconds, so the decomposition stays inside
 * the timed MSM region honestly.
 *
 * Build: cc -O2 -shared -fPIC glv.c -o glv.so   (loaded via ctypes)
 */

#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

#define MAXW 16

/* out[0..na+nb) = a[0..na) * b[0..nb) (schoolbook) */
static void mul_nm(const u64 *a, int na, const u64 *b, int nb, u64 *out) {
    memset(out, 0, (size_t)(na + nb) * sizeof(u64));
    for (int i = 0; i < na; i++) {
        u128 carry = 0;
        for (int j = 0; j < nb; j++) {
            u128 cur = (u128)a[i] * b[j] + out[i + j] + carry;
            out[i + j] = (u64)cur;
            carry = cur >> 64;
        }
        out[i + nb] = (u64)carry;
    }
}

static void add_n(u64 *a, const u64 *b, int n) {
    u128 carry = 0;
    for (int i = 0; i < n; i++) {
        u128 cur = (u128)a[i] + b[i] + carry;
        a[i] = (u64)cur;
        carry = cur >> 64;
    }
}

/* a -= b; returns borrow */
static u64 sub_n(u64 *a, const u64 *b, int n) {
    u128 borrow = 0;
    for (int i = 0; i < n; i++) {
        u128 cur = (u128)a[i] - b[i] - borrow;
        a[i] = (u64)cur;
        borrow = (cur >> 64) & 1;
    }
    return (u64)borrow;
}

static int cmp_n(const u64 *a, const u64 *b, int n) {
    for (int i = n - 1; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

/* q = floor(x / r) for x < 2^shift_bits, via mu = floor(2^shift_bits / r).
 * q_words receives nq words. Standard Barrett: q ~ (x*mu) >> shift, then
 * up to two corrections. */
static void barrett_div(const u64 *x, int nx, const u64 *mu, int nmu,
                        const u64 *r, int nr, int shift_words, u64 *q,
                        int nq) {
    u64 prod[2 * MAXW + 2];
    mul_nm(x, nx, mu, nmu, prod);
    /* q_est = prod >> (64 * shift_words) */
    u64 qe[MAXW + 2];
    memset(qe, 0, sizeof(qe));
    int avail = nx + nmu - shift_words;
    for (int i = 0; i < nq + 1 && i < avail; i++) qe[i] = prod[shift_words + i];
    /* rem = x - qe * r */
    u64 qr[2 * MAXW + 2];
    mul_nm(qe, nq + 1, r, nr, qr);
    u64 rem[2 * MAXW + 2];
    memset(rem, 0, sizeof(rem));
    memcpy(rem, x, (size_t)nx * sizeof(u64));
    sub_n(rem, qr, nx); /* exact: qe*r <= x */
    /* correct: while rem >= r: rem -= r, qe++ */
    u64 rext[2 * MAXW + 2];
    memset(rext, 0, sizeof(rext));
    memcpy(rext, r, (size_t)nr * sizeof(u64));
    while (cmp_n(rem, rext, nx) >= 0) {
        sub_n(rem, rext, nx);
        u128 carry = 1;
        for (int i = 0; i < nq + 1 && carry; i++) {
            u128 cur = (u128)qe[i] + carry;
            qe[i] = (u64)cur;
            carry = cur >> 64;
        }
    }
    memcpy(q, qe, (size_t)nq * sizeof(u64));
}

/* round(x / r) = floor((x + r/2) / r) */
static void round_div(const u64 *x, int nx, const u64 *half_r, int nhr,
                      const u64 *mu, int nmu, const u64 *r, int nr,
                      int shift_words, u64 *q, int nq) {
    u64 xr[2 * MAXW + 2];
    memset(xr, 0, sizeof(xr));
    memcpy(xr, x, (size_t)nx * sizeof(u64));
    u64 hr[2 * MAXW + 2];
    memset(hr, 0, sizeof(hr));
    memcpy(hr, half_r, (size_t)nhr * sizeof(u64));
    add_n(xr, hr, nx + 1);
    barrett_div(xr, nx + 1, mu, nmu, r, nr, shift_words, q, nq);
}

/* signed value in sign/magnitude: mag[nm], neg flag */
typedef struct {
    u64 mag[MAXW];
    int neg;
} sval;

static void smul(const sval *a, int na, const u64 *b, int nb, int bneg,
                 sval *out) {
    u64 prod[2 * MAXW + 2];
    mul_nm(a->mag, na, b, nb, prod);
    memcpy(out->mag, prod, sizeof(out->mag));
    out->neg = a->neg ^ bneg;
}

/* out = a + b (sign/magnitude, n words) */
static void sadd(sval *a, const sval *b, int n) {
    if (a->neg == b->neg) {
        add_n(a->mag, b->mag, n);
        return;
    }
    if (cmp_n(a->mag, b->mag, n) >= 0) {
        sub_n(a->mag, b->mag, n);
    } else {
        u64 tmp[MAXW];
        memcpy(tmp, b->mag, sizeof(tmp));
        sub_n(tmp, a->mag, n);
        memcpy(a->mag, tmp, sizeof(a->mag));
        a->neg = b->neg;
    }
}

static int is_zero_n(const u64 *a, int n) {
    for (int i = 0; i < n; i++)
        if (a[i]) return 0;
    return 1;
}

/* Batch decompose.
 * scalars: n * 4 u64 (LE words, canonical < r)
 * constants (all LE u64): r[4], half_r[4], mu510[5] = floor(2^(64*9)/r),
 * z2[4] (positive), lambda[2+]: lam[4].
 * outputs: k_abs: 2n * 2 u64 (|k1| lanes then |k2| lanes), neg: 2n u8. */
void glv_decompose_batch(const u64 *scalars, long n, const u64 *r,
                         const u64 *half_r, const u64 *mu, const u64 *z2,
                         const u64 *lam, u64 *k_abs, unsigned char *neg) {
    const int NW = 4;      /* scalar words */
    const int NMU = 6;     /* mu words: floor(2^(64*9)/r) < 2^321 */
    const int SHIFT_W = 9; /* Barrett shift in words */
#pragma omp parallel for schedule(static)
    for (long i = 0; i < n; i++) {
        const u64 *k = scalars + 4 * i;
        /* c1 = round(k*z2 / r): k*z2 < 2^509 */
        u64 kz2[2 * MAXW + 2];
        mul_nm(k, NW, z2, NW, kz2);
        u64 c1[MAXW], c2[MAXW];
        memset(c1, 0, sizeof(c1));
        memset(c2, 0, sizeof(c2));
        round_div(kz2, 2 * NW, half_r, NW, mu, NMU, r, NW, SHIFT_W, c1, NW);
        round_div(k, NW, half_r, NW, mu, NMU, r, NW, SHIFT_W, c2, NW);
        /* k2 = c1 - c2*z2 */
        sval sk2;
        memset(&sk2, 0, sizeof(sk2));
        memcpy(sk2.mag, c1, NW * sizeof(u64));
        sk2.neg = 0;
        sval t;
        memset(&t, 0, sizeof(t));
        {
            sval sc2;
            memset(&sc2, 0, sizeof(sc2));
            memcpy(sc2.mag, c2, NW * sizeof(u64));
            sc2.neg = 1; /* minus c2*z2 */
            smul(&sc2, NW, z2, NW, 0, &t);
        }
        sadd(&sk2, &t, 2 * NW);
        /* k1 = k - c1*lam - c2 */
        sval sk1;
        memset(&sk1, 0, sizeof(sk1));
        memcpy(sk1.mag, k, NW * sizeof(u64));
        sk1.neg = 0;
        {
            sval sc1;
            memset(&sc1, 0, sizeof(sc1));
            memcpy(sc1.mag, c1, NW * sizeof(u64));
            sc1.neg = 1;
            memset(&t, 0, sizeof(t));
            smul(&sc1, NW, lam, NW, 0, &t);
            sadd(&sk1, &t, 2 * NW);
        }
        {
            sval sc2m;
            memset(&sc2m, 0, sizeof(sc2m));
            memcpy(sc2m.mag, c2, NW * sizeof(u64));
            sc2m.neg = 1;
            sadd(&sk1, &sc2m, 2 * NW);
        }
        /* write |k1|, |k2| (2 words each) + signs; zero -> sign 0 */
        k_abs[2 * i] = sk1.mag[0];
        k_abs[2 * i + 1] = sk1.mag[1];
        k_abs[2 * (n + i)] = sk2.mag[0];
        k_abs[2 * (n + i) + 1] = sk2.mag[1];
        neg[i] = (unsigned char)(sk1.neg && !is_zero_n(sk1.mag, 2 * NW));
        neg[n + i] = (unsigned char)(sk2.neg && !is_zero_n(sk2.mag, 2 * NW));
    }
}
