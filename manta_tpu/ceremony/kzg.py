"""KZG phase 1: the powers-of-tau accumulator.

Mirrors the reference (`manta-trusted-setup/src/groth16/kzg.rs`):

    Accumulator {
        tau_powers_g1:       [τ^i]G1, i < 2k-1
        tau_powers_g2:       [τ^i]G2, i < k
        alpha_tau_powers_g1: [α τ^i]G1, i < k
        beta_tau_powers_g1:  [β τ^i]G1, i < k
        beta_g2:             [β]G2
    }

Scale design (the reference handles G2 = 2^17 / G1 = 2^18−1 powers,
`ceremony/config/ppot.rs:698-699`):

- `contribute` rescales every element by fresh (τ', α', β') — the hot
  batched scalar multiplication (`kzg.rs:444 Accumulator::update`). With
  `backend="device"` the four power chains run through the batched
  device kernel `ops.curve.CurveOps.scalar_mul` (lane-parallel
  double-and-add over the whole chain at once); `backend="host"` is the
  big-int path for small sizes and tests.
- `verify_transform` (`kzg.rs:472-546`) compresses each
  consecutive-powers chain to ONE pairing ratio check via the
  random-linear-combination `power_pairs` (`util.rs:339`): with verifier
  randomness r_i, L = Σ r_i P_i and R = Σ r_i P_{i+1} satisfy
  R = τ·L iff (whp over r) every consecutive pair does. The total
  pairing count (~18) is INDEPENDENT of the accumulator size — the
  pairwise-per-power loop this module used before round 5 was years of
  compute at PPoT scale.
"""

from __future__ import annotations

import dataclasses
import hashlib
import random
from typing import List, Optional, Sequence

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


def _device_rescale(curve, points: Sequence[tuple], scalars: Sequence[int]):
    """points[i] * scalars[i] through the batched device kernel
    (`Accumulator::update`'s hot loop, `kzg.rs:444-468`)."""
    import jax.numpy as jnp

    from manta_tpu.ops import curve as C
    from manta_tpu.ops import field_ops as F

    cops = C.curve_ops_for(curve, "fused")
    pts = cops.encode_points(list(points))
    sc = jnp.asarray(
        F.encode_ints(curve.scalar_field, list(scalars), montgomery=False)
    )
    return cops.decode_points(cops.to_affine(cops.scalar_mul(sc, pts)))


def _rescale(curve, points, scalars, backend: str):
    if backend == "device":
        return _device_rescale(curve, points, scalars)
    return [
        curve.scalar_mul(s, pt) for s, pt in zip(scalars, points)
    ]


def contribute(
    acc: Accumulator,
    tau: int,
    alpha: int,
    beta: int,
    nonce: int = 3,
    backend: str = "host",
) -> Contribution:
    """Rescale the accumulator in place by fresh scalars and return the
    contribution proofs (reference `kzg.rs:444`). `backend="device"` runs
    the four power chains as batched lane-parallel scalar muls on the
    accelerator — the path that scales to the PPoT sizes."""
    cfg = acc.cfg
    r_mod = cfg.g1.scalar_field.modulus
    challenge = acc.challenge()
    size = len(acc.tau_powers_g2)
    # τ^i tables (host bignum: two modmuls per power, negligible next to
    # the point muls)
    tau_powers = [1] * (2 * size - 1)
    for i in range(1, 2 * size - 1):
        tau_powers[i] = tau_powers[i - 1] * tau % r_mod
    acc.tau_powers_g1 = _rescale(
        cfg.g1, acc.tau_powers_g1, tau_powers, backend
    )
    acc.tau_powers_g2 = _rescale(
        cfg.g2, acc.tau_powers_g2, tau_powers[:size], backend
    )
    acc.alpha_tau_powers_g1 = _rescale(
        cfg.g1,
        acc.alpha_tau_powers_g1,
        [alpha * t % r_mod for t in tau_powers[:size]],
        backend,
    )
    acc.beta_tau_powers_g1 = _rescale(
        cfg.g1,
        acc.beta_tau_powers_g1,
        [beta * t % r_mod for t in tau_powers[:size]],
        backend,
    )
    acc.beta_g2 = cfg.g2.scalar_mul(beta, acc.beta_g2)
    return Contribution(
        tau_proof=R.RatioProof.prove(cfg, challenge + b"tau", tau, nonce),
        alpha_proof=R.RatioProof.prove(cfg, challenge + b"alpha", alpha, nonce + 1),
        beta_proof=R.RatioProof.prove(cfg, challenge + b"beta", beta, nonce + 2),
    )


def power_pairs(
    curve, points: Sequence[tuple], rng: Optional[random.Random] = None
):
    """Compress a consecutive-powers chain to one ratio pair
    (reference `util.rs:339`): with verifier randomness r_i,
    (Σ r_i P_i, Σ r_i P_{i+1}) share ratio τ iff (whp) every
    consecutive pair does. Two MSMs of length n-1; the pairing count of
    the caller's check becomes independent of n."""
    rng = rng or random.SystemRandom()
    n = len(points) - 1
    assert n >= 1, "power chain needs at least two points"
    scalars = [rng.randrange(1, curve.scalar_field.modulus) for _ in range(n)]
    # Pippenger, not the naive oracle: at the reference's accumulator
    # sizes (2^17 powers) naive is hours, Pippenger seconds
    left = curve.msm_pippenger(scalars, list(points[:-1]))
    right = curve.msm_pippenger(scalars, list(points[1:]))
    return left, right


def verify_transform(
    prev: Accumulator,
    next_acc: Accumulator,
    contribution: Contribution,
    rng: Optional[random.Random] = None,
) -> bool:
    """Check one contribution round (reference `kzg.rs:472-546`).

    Pairing count is constant (~18) regardless of accumulator size: each
    structural chain check is one `power_pairs` compression + one
    `same_ratio` pairing pair."""
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
    # 3. structural consistency via random-linear-combination compression:
    #    every consecutive G1 pair shares ratio tau (witnessed by t2[1]),
    #    and every consecutive G2 pair shares it (witnessed by t1[1])
    t2_pair = (cfg.g2.generator, next_acc.tau_powers_g2[1])
    if not R.same_ratio(
        cfg, power_pairs(cfg.g1, next_acc.tau_powers_g1, rng), t2_pair
    ):
        return False
    if not R.same_ratio(
        cfg,
        (cfg.g1.generator, next_acc.tau_powers_g1[1]),
        power_pairs(cfg.g2, next_acc.tau_powers_g2, rng),
    ):
        return False
    # 4. alpha/beta chains follow tau powers
    if not R.same_ratio(
        cfg, power_pairs(cfg.g1, next_acc.alpha_tau_powers_g1, rng), t2_pair
    ):
        return False
    if not R.same_ratio(
        cfg, power_pairs(cfg.g1, next_acc.beta_tau_powers_g1, rng), t2_pair
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
