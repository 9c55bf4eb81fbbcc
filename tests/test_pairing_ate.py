"""ark-identical BN254 optimal-ate pairing: bit-exactness oracles.

The published verifying contexts embed two ark-generated artifacts that a
reimplementation can be checked against byte-for-byte (reference
`manta-crypto/src/arkworks/groth16.rs:308-500`):

- `G2Prepared.ell_coeffs` for -gamma_g2 / -delta_g2 (91 triples each),
- the precomputed GT element e(alpha_g1, beta_g2).

With the proving keys being LFS stubs in this mount, these are the only
remaining pairing bit-exactness oracles available (VERDICT round 1, item 5).
"""

import os

import pytest

from manta_tpu.models import pairing as PR
from manta_tpu.utils import hostmath

VERIFYING_DIR = "/root/reference/manta-parameters/data/pay/verifying"

needs_data = pytest.mark.skipif(
    not os.path.isdir(VERIFYING_DIR), reason="published parameters not mounted"
)


@pytest.fixture(scope="module")
def eng():
    e = PR.engine(PR.BN254_PAIRING)
    assert isinstance(e, PR.BnAtePairingEngine)
    return e


class TestAteInternals:
    def test_bilinearity(self, eng):
        g1 = hostmath.BN254_G1
        g2 = hostmath.BN254_G2
        p1 = g1.generator
        q1 = g2.generator
        a, b = 7, 11
        lhs = eng.pairing(g1.scalar_mul(a, p1), g2.scalar_mul(b, q1))
        rhs = eng.f.pow(eng.pairing(p1, q1), a * b)
        assert lhs == rhs
        assert lhs != eng.f.one  # non-degenerate

    def test_structured_final_exp_matches_flat(self):
        """The generic structured final exponentiation (easy part +
        (p^4-p^2+1)/r hard part) equals the flat (p^12-1)/r pow — checked on
        the Tate engine, whose hard part is NOT the ark multiple."""
        e = PR.PairingEngine(PR.BLS12_381_PAIRING)
        g1 = hostmath.BLS12_381_G1
        g2 = hostmath.BLS12_381_G2
        m = e.miller_tate(g1.generator, e.untwist(g2.generator))
        structured = e.final_exponentiation(m)
        flat = e.f.pow(m, (e.p**12 - 1) // e.r)
        assert structured == flat

    def test_groth16_style_product(self, eng):
        """e(aP, Q) * e(-P, aQ) == 1 via the shared-final-exp product."""
        g1 = hostmath.BN254_G1
        g2 = hostmath.BN254_G2
        a = 13
        pairs = [
            (g1.scalar_mul(a, g1.generator), g2.generator),
            (g1.neg(g1.generator), g2.scalar_mul(a, g2.generator)),
        ]
        assert eng.multi_pairing_is_one(pairs)


@needs_data
class TestPublishedVkOracles:
    @pytest.fixture(scope="class", params=["to-private", "private-transfer", "to-public"])
    def pvk(self, request):
        from manta_tpu.utils import ark_groth16 as AG

        return AG.load_verifying_context_file(
            f"{VERIFYING_DIR}/{request.param}.dat"
        )

    def test_prepared_coefficients_match(self, eng, pvk):
        g2 = hostmath.BN254_G2
        gamma_neg = g2.neg(pvk.vk.gamma_g2)
        delta_neg = g2.neg(pvk.vk.delta_g2)
        assert eng.prepare_g2(gamma_neg) == pvk.gamma_ell_coeffs
        assert eng.prepare_g2(delta_neg) == pvk.delta_ell_coeffs

    def test_alpha_beta_gt_matches(self, eng, pvk):
        got = eng.pairing(pvk.vk.alpha_g1, pvk.vk.beta_g2)
        assert got == pvk.alpha_g1_beta_g2
