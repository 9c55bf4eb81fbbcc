"""KZG phase 1: the powers-of-tau accumulator.

Mirrors the reference (`manta-trusted-setup/src/groth16/kzg.rs`):

    Accumulator {
        tau_powers_g1:       [τ^i]G1, i < 2k-1
        tau_powers_g2:       [τ^i]G2, i < k
        alpha_tau_powers_g1: [α τ^i]G1, i < k
        beta_tau_powers_g1:  [β τ^i]G1, i < k
        beta_g2:             [β]G2
    }

A contribution rescales every element by fresh (τ', α', β') — the hot
batched scalar multiplication (`kzg.rs:444 Accumulator::update`); the
device path batches these through `manta_tpu.ops.curve.scalar_mul`.
`verify_transform` (`kzg.rs:472`) checks contribution ratio proofs for the
three scalars plus the structural pairing ratios (consecutive-power
consistency via random linear combination here simplified to the pairwise
checks on the full chains).
"""

from __future__ import annotations

import dataclasses
import hashlib

from manta_tpu.ceremony import ratio as R
from manta_tpu.models import pairing as PR
from manta_tpu.utils import codec


@dataclasses.dataclass
class Accumulator:
    cfg: PR.PairingConfig
    tau_powers_g1: List[tuple]
    tau_powers_g2: List[tuple]
    alpha_tau_powers_g1: List[tuple]
    beta_tau_powers_g1: List[tuple]
    beta_g2: tuple

    @classmethod
    def default(cls, cfg: PR.PairingConfig, size: int):
        """Initial accumulator: all scalars = 1 (reference kzg.rs Default)."""
        g, h = cfg.g1.generator, cfg.g2.generator
        return cls(
            cfg=cfg,
            tau_powers_g1=[g] * (2 * size - 1),
            tau_powers_g2=[h] * size,
            alpha_tau_powers_g1=[g] * size,
            beta_tau_powers_g1=[g] * size,
            beta_g2=h,
        )

    def challenge(self) -> bytes:
        h = hashlib.blake2b()
        for pt in self.tau_powers_g1:
            h.update(codec.serialize_g1_compressed(pt, self.cfg.g1))
        for pt in self.tau_powers_g2:
            h.update(codec.serialize_g2_compressed(pt, self.cfg.g2))
        h.update(codec.serialize_g2_compressed(self.beta_g2, self.cfg.g2))
        return h.digest()


@dataclasses.dataclass
class Contribution:
    """Proof data published with each round (reference kzg.rs:161)."""

    tau_proof: R.RatioProof
    alpha_proof: R.RatioProof
    beta_proof: R.RatioProof


def contribute(
    acc: Accumulator, tau: int, alpha: int, beta: int, nonce: int = 3
) -> Contribution:
    """Rescale the accumulator in place by fresh scalars and return the
    contribution proofs (reference `kzg.rs:444`)."""
    cfg = acc.cfg
    r_mod = cfg.g1.scalar_field.modulus
    challenge = acc.challenge()
    size = len(acc.tau_powers_g2)
    g1 = cfg.g1
    g2 = cfg.g2
    tau_pow = 1
    new_t1, new_a1, new_b1 = [], [], []
    for i in range(2 * size - 1):
        new_t1.append(g1.scalar_mul(tau_pow, acc.tau_powers_g1[i]))
        if i < size:
            new_a1.append(
                g1.scalar_mul(alpha * tau_pow % r_mod, acc.alpha_tau_powers_g1[i])
            )
            new_b1.append(
                g1.scalar_mul(beta * tau_pow % r_mod, acc.beta_tau_powers_g1[i])
            )
        tau_pow = tau_pow * tau % r_mod
    new_t2 = [
        g2.scalar_mul(pow(tau, i, r_mod), acc.tau_powers_g2[i])
        for i in range(size)
    ]
    acc.tau_powers_g1 = new_t1
    acc.tau_powers_g2 = new_t2
    acc.alpha_tau_powers_g1 = new_a1
    acc.beta_tau_powers_g1 = new_b1
    acc.beta_g2 = g2.scalar_mul(beta, acc.beta_g2)
    return Contribution(
        tau_proof=R.RatioProof.prove(cfg, challenge + b"tau", tau, nonce),
        alpha_proof=R.RatioProof.prove(cfg, challenge + b"alpha", alpha, nonce + 1),
        beta_proof=R.RatioProof.prove(cfg, challenge + b"beta", beta, nonce + 2),
    )


def verify_transform(
    prev: Accumulator, next_acc: Accumulator, contribution: Contribution
) -> bool:
    """Check one contribution round (reference `kzg.rs:472`)."""
    cfg = prev.cfg
    challenge = prev.challenge()
    # 1. knowledge proofs
    for proof, tag in (
        (contribution.tau_proof, b"tau"),
        (contribution.alpha_proof, b"alpha"),
        (contribution.beta_proof, b"beta"),
    ):
        if not proof.verify(cfg, challenge + tag):
            return False
    # 2. the new tau_g1[1] must relate to the old by the proven tau ratio:
    #    e(prev_t1, x·H_tau) == e(next_t1, H_tau)
    tau_ratio = contribution.tau_proof.ratio
    if not R.same_ratio(
        cfg,
        (prev.tau_powers_g1[1], next_acc.tau_powers_g1[1]),
        (
            R.hash_to_g2(
                cfg,
                R._challenge_bytes(cfg, challenge + b"tau", *tau_ratio),
            ),
            contribution.tau_proof.matching_point,
        ),
    ):
        return False
    # 3. structural consistency: consecutive powers share the tau ratio
    #    e(t1[i+1], g2) == e(t1[i], t2[1]) for all i; same for g2 powers.
    t2_1 = next_acc.tau_powers_g2[1]
    for i in range(len(next_acc.tau_powers_g1) - 1):
        if not R.same_ratio(
            cfg,
            (next_acc.tau_powers_g1[i], next_acc.tau_powers_g1[i + 1]),
            (cfg.g2.generator, t2_1),
        ):
            return False
    t1_1 = next_acc.tau_powers_g1[1]
    for i in range(len(next_acc.tau_powers_g2) - 1):
        if not R.same_ratio(
            cfg,
            (cfg.g1.generator, t1_1),
            (next_acc.tau_powers_g2[i], next_acc.tau_powers_g2[i + 1]),
        ):
            return False
    # 4. alpha/beta chains follow tau powers
    for i in range(len(next_acc.alpha_tau_powers_g1) - 1):
        if not R.same_ratio(
            cfg,
            (next_acc.alpha_tau_powers_g1[i], next_acc.alpha_tau_powers_g1[i + 1]),
            (cfg.g2.generator, t2_1),
        ):
            return False
        if not R.same_ratio(
            cfg,
            (next_acc.beta_tau_powers_g1[i], next_acc.beta_tau_powers_g1[i + 1]),
            (cfg.g2.generator, t2_1),
        ):
            return False
    # 5. beta_g2 consistent with beta chain:
    #    e(beta_t1[0], g2) == e(g1, beta_g2)
    if not R.same_ratio(
        cfg,
        (cfg.g1.generator, next_acc.beta_tau_powers_g1[0]),
        (cfg.g2.generator, next_acc.beta_g2),
    ):
        return False
    return True
