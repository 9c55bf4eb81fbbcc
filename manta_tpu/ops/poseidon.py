"""Batched Poseidon permutation / hashing on device.

TPU-native replacement for the reference's Poseidon core
(`manta-pay/src/crypto/poseidon/`, SURVEY.md §2.9#7). The permutation state
for a batch of N hashes is a (width, L, N) limb tensor; each round is:

- add round keys (per-state-element constants),
- x^5 S-box — on all elements in full rounds, element 0 in partial rounds
  (2 squarings + 1 multiply each),
- MDS mix: width×width *constant* multiply accumulated in the unreduced
  column domain — one Montgomery REDC per output element instead of one per
  product (`field_ops.school_prod`/`redc` two-phase API).

Round structure and parameters are bit-exact with the reference
(8 full rounds split half/half around 55/56 partial rounds, Grain LFSR round
keys, Cauchy MDS — see `manta_tpu.utils.grain`, validated against the
published `manta-parameters` blobs and sage vectors).

The rounds run under `lax.fori_loop` with the round-key table as a device
constant, so the compiled graph holds one full-round body and one
partial-round body regardless of round count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu import fields
from manta_tpu.ops import field_ops as F
from manta_tpu.utils import grain


@functools.lru_cache(maxsize=None)
def _device_constants(spec: grain.PoseidonSpec):
    """Round keys as (rounds, width, L, 1) and MDS as (width, width, L, 1),
    Montgomery form."""
    L = spec.field.num_limbs
    rk = F.encode_ints(spec.field, list(spec.round_keys))  # (L, rounds*width)
    rk = rk.T.reshape(spec.rounds, spec.width, L, 1)
    mds = F.encode_ints(spec.field, list(spec.mds))  # (L, width*width)
    mds = mds.T.reshape(spec.width, spec.width, L, 1)
    return np.ascontiguousarray(rk), np.ascontiguousarray(mds)


def _sbox(fspec: fields.FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """x^5 (SBOX_EXPONENT = 5, reference `config/poseidon.rs:56`)."""
    x2 = F.mont_mul(fspec, x, x)
    x4 = F.mont_mul(fspec, x2, x2)
    return F.mont_mul(fspec, x4, x)


def _mds_mix(spec: grain.PoseidonSpec, mds: jnp.ndarray, state: jnp.ndarray):
    """state: (width, L, N); returns MDS @ state with lazy-column sums."""
    fspec = spec.field
    outs = []
    for i in range(spec.width):
        acc = None
        for j in range(spec.width):
            prod = F.school_prod(fspec, state[j], mds[i, j])
            acc = prod if acc is None else acc + prod
        outs.append(F.redc(fspec, acc))
    return jnp.stack(outs)


def permute(spec: grain.PoseidonSpec, state: jnp.ndarray) -> jnp.ndarray:
    """Full Poseidon permutation. state: (width, L, N) Montgomery limbs."""
    fspec = spec.field
    rk_np, mds_np = _device_constants(spec)
    rk = jnp.asarray(rk_np)
    mds = jnp.asarray(mds_np)
    half = spec.full_rounds // 2

    def add_keys(rnd, st):
        keys = jax.lax.dynamic_index_in_dim(rk, rnd, 0, keepdims=False)
        return jax.vmap(lambda s, k: F.add(fspec, s, k))(st, keys)

    def full_round(rnd, st):
        st = add_keys(rnd, st)
        st = jax.vmap(lambda s: _sbox(fspec, s))(st)
        return _mds_mix(spec, mds, st)

    def partial_round(rnd, st):
        st = add_keys(rnd, st)
        st = st.at[0].set(_sbox(fspec, st[0]))
        return _mds_mix(spec, mds, st)

    state = jax.lax.fori_loop(0, half, full_round, state)
    state = jax.lax.fori_loop(
        half, half + spec.partial_rounds, partial_round, state
    )
    state = jax.lax.fori_loop(
        half + spec.partial_rounds, spec.rounds, full_round, state
    )
    return state


def hash_untruncated(spec: grain.PoseidonSpec, inputs: jnp.ndarray) -> jnp.ndarray:
    """inputs: (arity, L, N) Montgomery limbs -> full output state.

    Prepends the domain tag as state[0]
    (reference `manta-pay/src/crypto/poseidon/hash.rs:107-152`)."""
    n = inputs.shape[-1]
    tag = jnp.broadcast_to(
        jnp.asarray(F.const(spec.field, spec.domain_tag)),
        (spec.field.num_limbs, n),
    )
    state = jnp.concatenate([tag[None], inputs], axis=0)
    return permute(spec, state)


def hash(spec: grain.PoseidonSpec, inputs: jnp.ndarray) -> jnp.ndarray:
    """Poseidon hash: first element of the permuted state. (L, N) out."""
    return hash_untruncated(spec, inputs)[0]


hash_jit = jax.jit(hash, static_argnums=0)
permute_jit = jax.jit(permute, static_argnums=0)


# Production permutation specs (BN254 Fr, domain tag 0 — the MantaPay config)
@functools.lru_cache(maxsize=None)
def production_spec(arity: int) -> grain.PoseidonSpec:
    """Poseidon spec for the MantaPay config arities 2-5
    (reference `manta-pay/src/config/poseidon.rs`)."""
    return grain.poseidon_spec(fields.BN254_FR, arity + 1)
