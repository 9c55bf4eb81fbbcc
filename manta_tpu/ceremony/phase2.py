"""Groth16 phase 2: circuit specialization + δ contributions.

Mirrors the reference (`manta-trusted-setup/src/groth16/mpc.rs`):

- `initialize` (`mpc.rs:355-431`): consume a phase-1 powers-of-tau
  accumulator and the circuit's R1CS matrices; build the Groth16 key
  material with γ = δ = 1. Lagrange-basis commitments [L_j(τ)]G come from a
  *group-element* inverse NTT over the τ-power chains (the ceremony-init
  hot loop — `Radix2EvaluationDomain::ifft` over G1/G2 in the reference);
  h_query uses [τ^i Z(τ)] = [τ^(i+m)] − [τ^i].
- `contribute` (`mpc.rs:451`): rescale δ_g1/δ_g2 by fresh δ and l/h queries
  by δ^-1, publishing a ratio proof.
- `verify_transform` (`mpc.rs:472`): ratio-proof check + structural
  same-ratio checks between consecutive states.
- `extract_keys` (`mpc.rs:581`): final ProvingKey/VerifyingKey in the
  `manta_tpu.models.groth16` format.
"""

from __future__ import annotations

import dataclasses
from typing import List

from manta_tpu.ceremony import kzg as KZG
from manta_tpu.ceremony import ratio as R
from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR
from manta_tpu.models.circuit import ConstraintMatrices


def group_intt(curve, points: List, omega_inv: int, n_inv: int):
    """Inverse NTT over group elements (host; device group-NTT is the
    scaling hook for production domains)."""
    n = len(points)
    if n == 1:
        return list(points)
    r = curve.scalar_field.modulus
    bits = n.bit_length() - 1
    rev = [int(bin(i)[2:].zfill(bits)[::-1], 2) for i in range(n)]
    a = [points[rev[i]] for i in range(n)]
    size = 2
    while size <= n:
        wstep = pow(omega_inv, n // size, r)
        half = size // 2
        for start in range(0, n, size):
            wcur = 1
            for k in range(half):
                u = a[start + k]
                v = curve.scalar_mul(wcur, a[start + k + half])
                a[start + k] = curve.add(u, v)
                a[start + k + half] = curve.add(u, curve.neg(v) if v else None)
                wcur = wcur * wstep % r
        size *= 2
    return [curve.scalar_mul(n_inv, x) for x in a]


@dataclasses.dataclass
class Phase2State:
    """Proving-key material with running δ (γ fixed to 1)."""

    cfg: PR.PairingConfig
    domain_size: int
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    a_query: list
    b_g1_query: list
    b_g2_query: list
    gamma_abc_g1: list
    l_query: list
    h_query: list
    num_instance: int

    def challenge(self) -> bytes:
        import hashlib

        from manta_tpu.utils import codec

        h = hashlib.blake2b()
        h.update(codec.serialize_g1_compressed(self.delta_g1, self.cfg.g1))
        h.update(codec.serialize_g2_compressed(self.delta_g2, self.cfg.g2))
        for pt in self.h_query[:4]:
            h.update(codec.serialize_g1_compressed(pt, self.cfg.g1))
        return h.digest()


def initialize(
    acc: KZG.Accumulator, matrices: ConstraintMatrices
) -> Phase2State:
    cfg = acc.cfg
    g1 = cfg.g1
    r = g1.scalar_field.modulus
    rows = G._qap_rows(matrices)
    m = G._domain_size(len(rows))
    assert len(acc.tau_powers_g2) >= m, "phase-1 accumulator too small"
    fr = g1.scalar_field
    omega = fr.root_of_unity(m)
    omega_inv = pow(omega, -1, r)
    m_inv = pow(m, -1, r)

    # Lagrange commitments via group iNTT over the power chains
    lagrange_g1 = group_intt(g1, acc.tau_powers_g1[:m], omega_inv, m_inv)
    lagrange_alpha = group_intt(g1, acc.alpha_tau_powers_g1[:m], omega_inv, m_inv)
    lagrange_beta = group_intt(g1, acc.beta_tau_powers_g1[:m], omega_inv, m_inv)
    lagrange_g2 = group_intt(cfg.g2, acc.tau_powers_g2[:m], omega_inv, m_inv)

    num_vars = matrices.num_variables
    ni = matrices.num_instance
    a_query = [None] * num_vars
    b_g1_query = [None] * num_vars
    b_g2_query = [None] * num_vars
    abc = [None] * num_vars  # [(β u_i + α v_i + w_i)(τ)]G1

    for j, (a_lc, b_lc, c_lc) in enumerate(rows):
        for col, coeff in a_lc.items():
            a_query[col] = g1.add(
                a_query[col], g1.scalar_mul(coeff, lagrange_g1[j])
            )
            abc[col] = g1.add(abc[col], g1.scalar_mul(coeff, lagrange_beta[j]))
        for col, coeff in b_lc.items():
            b_g1_query[col] = g1.add(
                b_g1_query[col], g1.scalar_mul(coeff, lagrange_g1[j])
            )
            b_g2_query[col] = cfg.g2.add(
                b_g2_query[col], cfg.g2.scalar_mul(coeff, lagrange_g2[j])
            )
            abc[col] = g1.add(abc[col], g1.scalar_mul(coeff, lagrange_alpha[j]))
        for col, coeff in c_lc.items():
            abc[col] = g1.add(abc[col], g1.scalar_mul(coeff, lagrange_g1[j]))

    # h_query: [τ^i Z(τ)] = [τ^(i+m)] - [τ^i], i < m-1
    h_query = [
        g1.add(acc.tau_powers_g1[i + m], g1.neg(acc.tau_powers_g1[i]))
        for i in range(m - 1)
    ]
    return Phase2State(
        cfg=cfg,
        domain_size=m,
        alpha_g1=acc.alpha_tau_powers_g1[0],
        beta_g1=acc.beta_tau_powers_g1[0],
        beta_g2=acc.beta_g2,
        delta_g1=g1.generator,
        delta_g2=cfg.g2.generator,
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        gamma_abc_g1=abc[:ni],
        l_query=abc[ni:],
        h_query=h_query,
        num_instance=ni,
    )


def _rlc_coefficients(cfg, challenge: bytes, proof, next_pts) -> List[int]:
    """Deterministic 128-bit batching coefficients, Fiat-Shamir-bound to
    the round challenge, the ratio proof, AND the claimed next points (so
    a cheating contributor cannot craft points against known coefficients)."""
    import hashlib

    from manta_tpu.utils import codec

    h = hashlib.blake2b()
    h.update(challenge)
    h.update(codec.serialize_g1_compressed(proof.ratio[0], cfg.g1))
    h.update(codec.serialize_g1_compressed(proof.ratio[1], cfg.g1))
    h.update(codec.serialize_g2_compressed(proof.matching_point, cfg.g2))
    for pt in next_pts:
        h.update(codec.serialize_g1_compressed(pt, cfg.g1))
    seed = h.digest()
    out = []
    for i in range(len(next_pts)):
        d = hashlib.blake2b(seed + i.to_bytes(8, "little"), digest_size=16)
        out.append(int.from_bytes(d.digest(), "little"))
    return out


def _host_msm(curve, coeffs: List[int], pts: List):
    """sum_i coeffs[i]·pts[i] on host bignums (None = infinity)."""
    acc = None
    for c, pt in zip(coeffs, pts):
        if pt is None:
            continue
        acc = curve.add(acc, curve.scalar_mul(c, pt))
    return acc


def contribute(state: Phase2State, delta: int, nonce: int = 5) -> R.RatioProof:
    """Rescale by fresh δ (reference `mpc.rs:451`)."""
    cfg = state.cfg
    r = cfg.g1.scalar_field.modulus
    challenge = state.challenge()
    delta_inv = pow(delta, -1, r)
    state.delta_g1 = cfg.g1.scalar_mul(delta, state.delta_g1)
    state.delta_g2 = cfg.g2.scalar_mul(delta, state.delta_g2)
    state.l_query = [cfg.g1.scalar_mul(delta_inv, pt) for pt in state.l_query]
    state.h_query = [cfg.g1.scalar_mul(delta_inv, pt) for pt in state.h_query]
    return R.RatioProof.prove(cfg, challenge + b"delta", delta, nonce)


def verify_transform(
    prev: Phase2State, nxt: Phase2State, proof: R.RatioProof
) -> bool:
    """Reference `mpc.rs:472`: knowledge + structural same-ratio checks."""
    cfg = prev.cfg
    challenge = prev.challenge()
    if not proof.verify(cfg, challenge + b"delta"):
        return False
    # delta_g1 moved by the proven ratio
    h = R.hash_to_g2(
        cfg, R._challenge_bytes(cfg, challenge + b"delta", *proof.ratio)
    )
    if not R.same_ratio(
        cfg, (prev.delta_g1, nxt.delta_g1), (h, proof.matching_point)
    ):
        return False
    # delta_g2 consistent with delta_g1
    if not R.same_ratio(
        cfg,
        (cfg.g1.generator, nxt.delta_g1),
        (cfg.g2.generator, nxt.delta_g2),
    ):
        return False
    # l/h queries rescaled by THIS round's delta^-1: with H the round's
    # ratio hash point, e(next_l, δ·H) == e(prev_l, H). Batched with a
    # deterministic random linear combination (Fiat-Shamir over the round
    # challenge + proof) — ONE pairing check for the whole query set, as
    # the reference batches its checks (`kzg.rs:472` random-linear-
    # combination merge); 128-bit coefficients suffice for soundness.
    prev_pts = prev.l_query + prev.h_query
    next_pts = nxt.l_query + nxt.h_query
    if len(prev_pts) != len(next_pts):
        return False
    coeffs = _rlc_coefficients(cfg, challenge, proof, next_pts)
    prev_comb = _host_msm(cfg.g1, coeffs, prev_pts)
    next_comb = _host_msm(cfg.g1, coeffs, next_pts)
    if (prev_comb is None) != (next_comb is None):
        return False
    if prev_comb is not None and not R.same_ratio(
        cfg, (next_comb, prev_comb), (h, proof.matching_point)
    ):
        return False
    # untouched sections must be identical
    if (
        prev.a_query != nxt.a_query
        or prev.b_g2_query != nxt.b_g2_query
        or prev.gamma_abc_g1 != nxt.gamma_abc_g1
    ):
        return False
    return True


def extract_keys(state: Phase2State) -> tuple:
    """Final (ProvingKey, VerifyingKey) (reference `mpc.rs:581`)."""
    cfg = state.cfg
    pk = G.ProvingKey(
        cfg=cfg,
        domain_size=state.domain_size,
        alpha_g1=state.alpha_g1,
        beta_g1=state.beta_g1,
        delta_g1=state.delta_g1,
        a_query=state.a_query,
        b_g1_query=state.b_g1_query,
        h_query=state.h_query,
        l_query=state.l_query,
        beta_g2=state.beta_g2,
        delta_g2=state.delta_g2,
        b_g2_query=state.b_g2_query,
    )
    vk = G.VerifyingKey(
        cfg=cfg,
        alpha_g1=state.alpha_g1,
        beta_g2=state.beta_g2,
        gamma_g2=cfg.g2.generator,  # γ = 1
        delta_g2=state.delta_g2,
        gamma_abc_g1=state.gamma_abc_g1,
    )
    return pk, vk
