"""Host-side pairings for BN254 and BLS12-381.

Replaces the reference's pairing dependency (ark-ec Miller loop + final
exponentiation, SURVEY.md §2.9#6) for the verification path — which the
reference also keeps off the hot proving path; proof generation never
pairs. Correctness requirement: a bilinear non-degenerate pairing computed
consistently — the Groth16 verification equation
  e(A,B) = e(αg1, βg2) · e(Σ aᵢ γᵢ, γg2) · e(C, δg2)
holds for ANY choice of pairing, so we implement the (simpler, loop-longer)
reduced Tate pairing with affine Miller lines over an explicit
Fq2 → Fq6 → Fq12 tower:

- Fq2 = Fq[u]/(u²+1) (both curves),
- Fq6 = Fq2[v]/(v³-ξ) with ξ = 9+u (BN254) or 1+u (BLS12-381),
- Fq12 = Fq6[w]/(w²-v).

G2 points untwist into E(Fq12): D-twist (BN254) multiplies coords by
(w², w³); M-twist (BLS12-381) divides. Final exponentiation: easy part via
conjugate/inverse, then a generic square-and-multiply by (p⁶+1)/r.
"""

from __future__ import annotations

import dataclasses
import functools

from manta_tpu.utils import hostmath
from manta_tpu.utils.hostmath import fq2_add, fq2_inv, fq2_mul, fq2_neg, fq2_sub


@dataclasses.dataclass(frozen=True)
class PairingConfig:
    name: str
    g1: hostmath.WeierstrassCurve
    g2: hostmath.WeierstrassCurve
    xi: tuple  # Fq6 non-residue in Fq2
    m_twist: bool  # True: E' = x^3 + b*xi (BLS); False: D-twist b/xi (BN)


BN254_PAIRING = PairingConfig(
    name="bn254",
    g1=hostmath.BN254_G1,
    g2=hostmath.BN254_G2,
    xi=(9, 1),
    m_twist=False,
)

BLS12_381_PAIRING = PairingConfig(
    name="bls12_381",
    g1=hostmath.BLS12_381_G1,
    g2=hostmath.BLS12_381_G2,
    xi=(1, 1),
    m_twist=True,
)


class Fq12:
    """Arithmetic in the Fq12 tower; elements are ((c0,c1,c2),(c3,c4,c5))
    of Fq2 pairs: a = A + B·w with A,B ∈ Fq6 = (x, y, z) meaning x+yv+zv²."""

    def __init__(self, p: int, xi):
        self.p = p
        self.xi = xi

    # -- fq6 --
    def f6_add(self, a, b):
        return tuple(fq2_add(x, y, self.p) for x, y in zip(a, b))

    def f6_sub(self, a, b):
        return tuple(fq2_sub(x, y, self.p) for x, y in zip(a, b))

    def f6_neg(self, a):
        return tuple(fq2_neg(x, self.p) for x in a)

    def _mul_xi(self, a):
        return fq2_mul(a, self.xi, self.p)

    def f6_mul(self, a, b):
        p = self.p
        a0, a1, a2 = a
        b0, b1, b2 = b
        t0 = fq2_mul(a0, b0, p)
        t1 = fq2_mul(a1, b1, p)
        t2 = fq2_mul(a2, b2, p)
        c0 = fq2_add(
            t0,
            self._mul_xi(
                fq2_sub(
                    fq2_mul(fq2_add(a1, a2, p), fq2_add(b1, b2, p), p),
                    fq2_add(t1, t2, p),
                    p,
                )
            ),
            p,
        )
        c1 = fq2_add(
            fq2_sub(
                fq2_mul(fq2_add(a0, a1, p), fq2_add(b0, b1, p), p),
                fq2_add(t0, t1, p),
                p,
            ),
            self._mul_xi(t2),
            p,
        )
        c2 = fq2_add(
            fq2_sub(
                fq2_mul(fq2_add(a0, a2, p), fq2_add(b0, b2, p), p),
                fq2_add(t0, t2, p),
                p,
            ),
            t1,
            p,
        )
        return (c0, c1, c2)

    def f6_mul_by_v(self, a):
        """a * v: (x, y, z) -> (xi*z, x, y)."""
        return (self._mul_xi(a[2]), a[0], a[1])

    def f6_inv(self, a):
        p = self.p
        a0, a1, a2 = a
        c0 = fq2_sub(
            fq2_mul(a0, a0, p), self._mul_xi(fq2_mul(a1, a2, p)), p
        )
        c1 = fq2_sub(self._mul_xi(fq2_mul(a2, a2, p)), fq2_mul(a0, a1, p), p)
        c2 = fq2_sub(fq2_mul(a1, a1, p), fq2_mul(a0, a2, p), p)
        t = fq2_add(
            fq2_add(
                self._mul_xi(fq2_mul(a2, c1, p)),
                self._mul_xi(fq2_mul(a1, c2, p)),
                p,
            ),
            fq2_mul(a0, c0, p),
            p,
        )
        t_inv = fq2_inv(t, p)
        return (
            fq2_mul(c0, t_inv, p),
            fq2_mul(c1, t_inv, p),
            fq2_mul(c2, t_inv, p),
        )

    # -- fq12 --
    @property
    def zero2(self):
        return (0, 0)

    @property
    def one2(self):
        return (1, 0)

    @property
    def f6_zero(self):
        return ((0, 0), (0, 0), (0, 0))

    @property
    def f6_one(self):
        return ((1, 0), (0, 0), (0, 0))

    @property
    def one(self):
        return (self.f6_one, self.f6_zero)

    def add(self, a, b):
        return (self.f6_add(a[0], b[0]), self.f6_add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f6_sub(a[0], b[0]), self.f6_sub(a[1], b[1]))

    def neg(self, a):
        return (self.f6_neg(a[0]), self.f6_neg(a[1]))

    def mul(self, a, b):
        a0, a1 = a
        b0, b1 = b
        t0 = self.f6_mul(a0, b0)
        t1 = self.f6_mul(a1, b1)
        c0 = self.f6_add(t0, self.f6_mul_by_v(t1))
        c1 = self.f6_sub(
            self.f6_mul(self.f6_add(a0, a1), self.f6_add(b0, b1)),
            self.f6_add(t0, t1),
        )
        return (c0, c1)

    def square(self, a):
        return self.mul(a, a)

    def conj(self, a):
        """a^(p^6): conjugation over Fq6 (negate the w component)."""
        return (a[0], self.f6_neg(a[1]))

    def inv(self, a):
        a0, a1 = a
        t = self.f6_sub(
            self.f6_mul(a0, a0), self.f6_mul_by_v(self.f6_mul(a1, a1))
        )
        t_inv = self.f6_inv(t)
        return (self.f6_mul(a0, t_inv), self.f6_neg(self.f6_mul(a1, t_inv)))

    def pow(self, a, e: int):
        result = self.one
        base = a
        while e:
            if e & 1:
                result = self.mul(result, base)
            base = self.square(base)
            e >>= 1
        return result

    def scalar_fq(self, a, k: int):
        """Multiply an Fq12 element by a base-field scalar."""
        return tuple(
            tuple(hostmath.fq2_scalar(c, k, self.p) for c in part) for part in a
        )

    def embed_fq(self, x: int):
        """Fq -> Fq12."""
        return (((x % self.p, 0), (0, 0), (0, 0)), self.f6_zero)

    def embed_fq2(self, x):
        return ((x, (0, 0), (0, 0)), self.f6_zero)

    @property
    def w(self):
        return (self.f6_zero, self.f6_one)


@functools.lru_cache(maxsize=None)
def _engine(cfg: PairingConfig):
    return PairingEngine(cfg)


class PairingEngine:
    def __init__(self, cfg: PairingConfig):
        self.cfg = cfg
        self.p = cfg.g1.field.modulus
        self.r = cfg.g1.scalar_field.modulus
        self.f = Fq12(self.p, cfg.xi)
        f = self.f
        w2 = f.mul(f.w, f.w)
        w3 = f.mul(w2, f.w)
        if cfg.m_twist:
            self.tw_x, self.tw_y = f.inv(w2), f.inv(w3)
        else:
            self.tw_x, self.tw_y = w2, w3

    def untwist(self, q):
        """G2 affine (Fq2 pair coords) -> E(Fq12) affine."""
        f = self.f
        x = f.mul(f.embed_fq2(q[0]), self.tw_x)
        y = f.mul(f.embed_fq2(q[1]), self.tw_y)
        return (x, y)

    def miller_tate(self, p_pt, q12):
        """f_{r,P}(Q) with P ∈ G1 affine, Q untwisted in E(Fq12)."""
        f12 = self.f
        p = self.p
        qx, qy = q12
        f_acc = f12.one
        tx, ty = p_pt  # T = P, affine Fq coords
        px, py = p_pt

        def line_eval(lam, x, y):
            # l(Q) = qy - y - lam*(qx - x)  (all Fq scalars except qx, qy)
            t1 = f12.scalar_fq(qx, lam)
            c = (y - lam * x) % p
            res = f12.sub(qy, t1)
            return f12.sub(res, f12.embed_fq(c))

        def vertical_eval(x):
            return f12.sub(qx, f12.embed_fq(x))

        for bit in bin(self.r)[3:]:
            # doubling step: lambda = 3x^2 / 2y
            lam = 3 * tx * tx % p * pow(2 * ty % p, -1, p) % p
            l_val = line_eval(lam, tx, ty)
            f_acc = f12.mul(f12.square(f_acc), l_val)
            x3 = (lam * lam - 2 * tx) % p
            y3 = (lam * (tx - x3) - ty) % p
            tx, ty = x3, y3
            if bit == "1":
                if tx == px and ty == py:
                    lam = 3 * tx * tx % p * pow(2 * ty % p, -1, p) % p
                elif tx == px:
                    # vertical line: T + P = infinity (only at the very end)
                    f_acc = f12.mul(f_acc, vertical_eval(tx))
                    tx, ty = None, None
                    continue
                else:
                    lam = (ty - py) * pow(tx - px, -1, p) % p
                l_val = line_eval(lam, tx, ty)
                f_acc = f12.mul(f_acc, l_val)
                x3 = (lam * lam - tx - px) % p
                y3 = (lam * (tx - x3) - ty) % p
                tx, ty = x3, y3
        # final vertical at T (T should be -P or infinity at loop end for
        # r·P = O; the standard reduced Tate includes the last vertical)
        if tx is not None:
            f_acc = f12.mul(f_acc, vertical_eval(tx))
        return f_acc

    def final_exponentiation(self, f_val):
        f12 = self.f
        p = self.p
        # easy part: f^(p^6 - 1)
        f_val = f12.mul(f12.conj(f_val), f12.inv(f_val))
        # remaining exponent: (p^6 + 1) / r
        exp = (p**6 + 1) // self.r
        return f12.pow(f_val, exp)

    def pairing(self, p_pt, q_pt):
        """Full reduced Tate pairing; None inputs (infinity) -> 1."""
        if p_pt is None or q_pt is None:
            return self.f.one
        return self.final_exponentiation(
            self.miller_tate(p_pt, self.untwist(q_pt))
        )

    def multi_pairing_is_one(self, pairs) -> bool:
        """prod e(Pi, Qi) == 1, with a single shared final exponentiation."""
        f12 = self.f
        acc = f12.one
        for p_pt, q_pt in pairs:
            if p_pt is None or q_pt is None:
                continue
            acc = f12.mul(acc, self.miller_tate(p_pt, self.untwist(q_pt)))
        return self.final_exponentiation(acc) == f12.one


def engine(cfg: PairingConfig) -> PairingEngine:
    return _engine(cfg)
