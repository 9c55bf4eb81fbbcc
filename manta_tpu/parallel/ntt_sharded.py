"""Multi-chip NTT: four-step (Bailey) decomposition over a device mesh.

Replaces ark-poly's `Radix2EvaluationDomain` FFTs at sizes too large (or
too numerous) for one chip (reference use sites: Groth16 h(x) coset FFTs
inside `ark_groth16::prove`, `manta-crypto/src/arkworks/groth16.rs:589`;
trusted-setup initialization `manta-trusted-setup/src/groth16/mpc.rs:378`).

Math (four-step NTT): write n = n1*n2, input index j = j1*n2 + j2 and
output index k = k2*n1 + k1. Then

  X[k2*n1 + k1] = NTT_{n2 over j2}( w_n^(j2*k1) * NTT_{n1 over j1}(x)[k1] )

i.e. (1) size-n1 transforms along the major index, (2) elementwise twiddle
by w_n^(j2*k1), (3) size-n2 transforms along the minor index, (4) output
read transposed. On a mesh the array lives as natural contiguous chunks
(major index sharded), so each stage's transform axis is made device-local
by an `all_to_all` transpose — three total (in, between stages, out), each
moving n/D lanes per device over ICI. The local transforms reuse the
single-chip `manta_tpu.ops.ntt` stages (arkworks twiddle conventions),
so sharded results match single-chip `ntt` (same canonical values; lazy
[0, 2p) representatives can differ because the op order differs).

The step twiddle matrix w_n^(j2*k1) is a per-(spec, n) constant computed
once on host and passed in sharded over j2 — same footprint as the data,
HBM-resident across calls when the caller jits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu.fields import FieldSpec
from manta_tpu.ops import field_ops as F
from manta_tpu.ops import ntt as NTT
from manta_tpu.parallel.mesh import DATA_AXIS


def _split(n: int, n_devices: int):
    """n = n1 * n2 with both factors powers of two and multiples of D."""
    log_n = n.bit_length() - 1
    log_d = n_devices.bit_length() - 1
    assert 1 << log_d == n_devices, "mesh size must be a power of two"
    log_n1 = max(log_d, log_n // 2)
    n1 = 1 << log_n1
    n2 = n // n1
    assert n1 % n_devices == 0 and n2 % n_devices == 0, (
        f"n={n} too small to four-step over {n_devices} devices"
    )
    return n1, n2


@functools.lru_cache(maxsize=None)
def _step_twiddles(spec: FieldSpec, n: int, n1: int, inverse: bool):
    """(L, n1, n2) Montgomery limbs of w_n^(j2*k1), laid out [k1, j2]."""
    n2 = n // n1
    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, spec.modulus)
    pw = np.empty(n, dtype=object)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = acc * omega % spec.modulus
    k1 = np.arange(n1).reshape(n1, 1)
    j2 = np.arange(n2).reshape(1, n2)
    idx = (k1 * j2) % n
    flat = F.encode_ints(spec, [int(v) for v in pw])  # (L, n)
    return np.asarray(flat)[:, idx]  # (L, n1, n2)


def sharded_ntt(
    spec: FieldSpec,
    a: jnp.ndarray,
    mesh,
    inverse: bool = False,
    coset: bool = False,
) -> jnp.ndarray:
    """NTT along the last axis of `a` (L, n), sharded over `mesh`.

    Bit-identical to single-chip `ops.ntt.ntt` / `coset_ntt` / `coset_intt`
    (natural order in and out); input/output are natural contiguous chunks
    over the mesh's data axis. `coset` composes the arkworks coset scaling:
    forward = coset_fft (scale by g^i first), inverse = coset_ifft (scale
    by g^-i last).
    """
    D = mesh.devices.size
    n = a.shape[-1]
    L = spec.num_limbs
    n1, n2 = _split(n, D)
    tw = jnp.asarray(_step_twiddles(spec, n, n1, inverse))
    coset_pw = (
        jnp.asarray(NTT._coset_powers(spec, n, inverse)) if coset else None
    )

    def body(x, tw_l, cpw_l):
        # x: (L, n/D) = rows j1 in [r*n1/D, (r+1)*n1/D), all j2
        if coset and not inverse:
            x = F.mont_mul(spec, x, cpw_l)
        x = x.reshape(L, n1 // D, n2)
        # transpose #1: all j1 local, j2 chunked -> (L, n1, n2/D)
        x = jax.lax.all_to_all(
            x, DATA_AXIS, split_axis=2, concat_axis=1, tiled=True
        )
        # size-n1 transforms along j1 for each local column j2
        x = jnp.swapaxes(x, 1, 2)  # (L, n2/D, n1)
        x = NTT.ntt(spec, x, inverse=inverse)  # k1 natural order
        # step twiddles w_n^(j2*k1): tw_l is (L, n1, n2/D) for local j2
        x = F.mont_mul(spec, x, jnp.swapaxes(tw_l, 1, 2))
        # transpose #2: all j2 local, k1 chunked -> (L, n2, n1/D)
        x = jax.lax.all_to_all(
            x, DATA_AXIS, split_axis=2, concat_axis=1, tiled=True
        )
        # size-n2 transforms along j2 for each local row k1
        x = jnp.swapaxes(x, 1, 2)  # (L, n1/D, n2)
        x = NTT.ntt(spec, x, inverse=inverse)  # k2 natural order
        # output index is k2*n1 + k1: transpose #3 to chunk over k2
        x = jax.lax.all_to_all(
            x, DATA_AXIS, split_axis=2, concat_axis=1, tiled=True
        )  # (L, n1, n2/D)
        x = jnp.swapaxes(x, 1, 2).reshape(L, n // D)  # [k2_local, k1] flat
        if coset and inverse:
            x = F.mont_mul(spec, x, cpw_l)
        return x

    pspec = jax.sharding.PartitionSpec
    shard2 = pspec(None, DATA_AXIS)
    shard3 = pspec(None, None, DATA_AXIS)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(shard2, shard3, shard2 if coset else pspec()),
        out_specs=shard2,
        check_vma=False,
    )(a, tw, coset_pw if coset else jnp.zeros((), jnp.uint32))


sharded_ntt_jit = jax.jit(sharded_ntt, static_argnums=(0, 2, 3, 4))
