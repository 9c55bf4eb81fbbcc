"""Device-resident Groth16 prover.

Round-1's device path round-tripped through the host between every stage:
h(x) decoded to Python ints then re-encoded for the MSM, query points
re-encoded per call, and witness row-evaluation ran as a per-row Python
loop (VERDICT round 1). This module is the redesign: ONE jitted program
per (ProvingKey, circuit) pair that takes the witness vector and returns
the four MSM accumulators, with

- every query point batch encoded once and resident in HBM for the life
  of the prover (the reference keeps its ProvingKey in RAM the same way —
  `manta-crypto/src/arkworks/groth16.rs:548-610`),
- sparse A/B/C row evaluation on device: one Montgomery multiply per
  matrix entry + a segmented modular sum (`field_ops.segment_sum_mod`),
- h(x) computed and consumed on device (no host decode between the coset
  NTT pipeline and the H-query MSM),
- the L-query and H-query MSMs merged into a single larger MSM (same
  window pass, better lane occupancy),
- optional batching: `prove_batch` maps the whole pipeline over B
  witnesses in one dispatch.

The host finishes each proof with the constant-size randomization
(r·δ, s·A, …): ~6 small scalar muls on host bignums, latency-irrelevant.

Replaces `ark_groth16::create_proof_with_assignment` (witness maps +
3 iFFT/2 FFT + 5 MSMs) as used by the reference at
`manta-crypto/src/arkworks/groth16.rs:589`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from manta_tpu import fields
from manta_tpu.models import groth16 as G
from manta_tpu.models.circuit import ConstraintMatrices


def _pow2_at_least(n: int, floor: int = 256) -> int:
    m = floor
    while m < n:
        m *= 2
    return m


@dataclasses.dataclass
class _SparseMat:
    """One R1CS matrix in entry-sorted COO form (static per circuit)."""

    seg_ids: np.ndarray  # (E,) int32 row index per entry, ascending
    cols: np.ndarray  # (E,) int32 variable index per entry
    coeffs: np.ndarray  # (L, E) uint32 Montgomery-form coefficients
    max_row_terms: int


def _build_sparse(fr, rows, which: int) -> _SparseMat:
    from manta_tpu.ops import field_ops as F

    seg, cols, vals = [], [], []
    max_terms = 1
    for j, row in enumerate(rows):
        lc = row[which]
        if not lc:
            continue
        max_terms = max(max_terms, len(lc))
        for col, coeff in sorted(lc.items()):
            seg.append(j)
            cols.append(col)
            vals.append(coeff % fr.modulus)
    return _SparseMat(
        seg_ids=np.asarray(seg, dtype=np.int32),
        cols=np.asarray(cols, dtype=np.int32),
        coeffs=F.encode_ints(fr, vals),
        max_row_terms=max_terms,
    )


@dataclasses.dataclass
class _PkView:
    """The slice of a ProvingKey the prover needs after its query points
    are already encoded: the constant-size randomization points and the
    query lengths (`DeviceProver.from_cache` reconstructs provers from
    disk-cached encoded arrays without the host ProvingKey)."""

    cfg: object
    domain_size: int
    alpha_g1: tuple
    beta_g1: tuple
    delta_g1: tuple
    beta_g2: tuple
    delta_g2: tuple
    l_query: tuple  # length-only placeholders
    h_query: tuple


class DeviceProver:
    """Device-resident prover for one proving key + circuit.

    backend: curve backend for the MSMs ("fused" = whole-formula Pallas
    point kernels; "limb" = per-op kernels — the fallback for platforms
    where Mosaic is unavailable).
    """

    def __init__(
        self,
        pk: G.ProvingKey,
        matrices: ConstraintMatrices,
        backend: str = "fused",
        window_bits: int = 13,
        column_steps: int = 128,
        lane_floor: int = 256,
    ):
        import jax

        from manta_tpu.ops import curve as C

        self.pk = pk
        self.matrices = matrices
        self.window_bits = window_bits
        self.column_steps = column_steps
        cfg = pk.cfg
        self.fr = cfg.g1.scalar_field
        self.g1 = C.curve_ops_for(cfg.g1, backend)
        self.g2 = C.curve_ops_for(cfg.g2, backend)

        rows = G._qap_rows(matrices)
        self.m = pk.domain_size
        assert len(rows) <= self.m
        self.ni = matrices.num_instance
        self.nv = matrices.num_variables
        self.mats = tuple(_build_sparse(self.fr, rows, w) for w in range(3))
        # Sparse-matrix data rides into the jitted scalar program as
        # ARGUMENTS (device buffers), never as baked HLO constants — at
        # spend-shape scale the embedded constants push the serialized
        # program past the axon relay's request-size limit (HTTP 413).
        import jax.numpy as jnp

        self._mat_buffers = tuple(
            (jnp.asarray(m.coeffs), jnp.asarray(m.cols), jnp.asarray(m.seg_ids))
            for m in self.mats
        )
        self.devices = None  # multi-device replication, see replicate_to

        # --- device-resident query points + zero-scalar masks ---
        self.n_ab = _pow2_at_least(self.nv, lane_floor)
        self.a_pts, self.a_mask = self._encode_query(self.g1, pk.a_query, self.n_ab)
        self.b1_pts, self.b1_mask = self._encode_query(
            self.g1, pk.b_g1_query, self.n_ab
        )
        self.b2_pts, self.b2_mask = self._encode_query(
            self.g2, pk.b_g2_query, self.n_ab
        )
        # merged C-side MSM: l_query scalars are z[ni:], h_query scalars are
        # the computed h coefficients — one MSM over the concatenation
        self.n_lh = _pow2_at_least(len(pk.l_query) + len(pk.h_query), lane_floor)
        self.lh_pts, self.lh_mask = self._encode_query(
            self.g1, list(pk.l_query) + list(pk.h_query), self.n_lh
        )
        # Everything the scalar pipeline reads besides the witness rides
        # through the jit boundary as ONE argument pytree (never closure
        # constants baked into the lowered HLO — at spend-shape scale the
        # embedded constants push the serialized program past the axon
        # relay's request-size limit, HTTP 413).
        self._buffers = (
            self._mat_buffers,
            (self.a_mask, self.b1_mask, self.b2_mask, self.lh_mask),
        )

        # Split programs: h-pipeline + scalar glue compile as one small
        # program; each MSM dispatches through the SHARED `msm_jit` (point
        # arrays as arguments), so all provers/tests/dry-runs with the same
        # shapes reuse one compiled executable per (curve, n) — XLA:CPU
        # spends ~0.5s of LLVM codegen per big-int op, so a monolithic
        # 4-MSM prover program costs ~45 min there; the split pieces
        # compile in minutes and live in the persistent cache.
        self._scalars_jit = jax.jit(self._prove_scalars)
        #: monolithic single-dispatch pipeline (TPU compile-check / perf)
        self._core = jax.jit(self._prove_core)

    # -- disk cache of the encoded prover (driver benches must not pay the
    #    minutes of host setup + query encoding on every cold process) --

    def save_cache(self, path: str) -> None:
        """Dump everything a prover needs at run time: the encoded query
        limb arrays, sparse-matrix buffers, and the constant-size
        randomization points. numpy + JSON only — no pickle."""
        import json

        import numpy as np

        meta = {
            "cfg": self.pk.cfg.name,
            "backend": self.g1.backend,
            "window_bits": self.window_bits,
            "column_steps": self.column_steps,
            "domain_size": self.m,
            "ni": self.ni,
            "nv": self.nv,
            "n_ab": self.n_ab,
            "n_lh": self.n_lh,
            "n_l": len(self.pk.l_query),
            "n_h": len(self.pk.h_query),
            "max_row_terms": [m.max_row_terms for m in self.mats],
            "alpha_g1": self.pk.alpha_g1,
            "beta_g1": self.pk.beta_g1,
            "delta_g1": self.pk.delta_g1,
            "beta_g2": self.pk.beta_g2,
            "delta_g2": self.pk.delta_g2,
        }
        arrays = {"meta": np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )}
        for tag, pts, mask in (
            ("a", self.a_pts, self.a_mask),
            ("b1", self.b1_pts, self.b1_mask),
            ("b2", self.b2_pts, self.b2_mask),
            ("lh", self.lh_pts, self.lh_mask),
        ):
            arrays[f"{tag}_x"] = np.asarray(pts.x)
            arrays[f"{tag}_y"] = np.asarray(pts.y)
            arrays[f"{tag}_z"] = np.asarray(pts.z)
            arrays[f"{tag}_mask"] = np.asarray(mask)
        for i, (coeffs, cols, seg) in enumerate(self._mat_buffers):
            arrays[f"mat{i}_coeffs"] = np.asarray(coeffs)
            arrays[f"mat{i}_cols"] = np.asarray(cols)
            arrays[f"mat{i}_seg"] = np.asarray(seg)
        np.savez(path, **arrays)

    @classmethod
    def from_cache(cls, path: str, backend: str = None):
        """Reconstruct a prover from `save_cache` output without the host
        ProvingKey/matrices (no re-encoding, no host setup)."""
        import json

        import jax
        import jax.numpy as jnp
        import numpy as np

        from manta_tpu.models import pairing as PR
        from manta_tpu.ops import curve as C
        from manta_tpu.ops.curve import JacobianPoint

        data = np.load(path)
        meta = json.loads(bytes(data["meta"]).decode())
        cfg = {
            "bn254": PR.BN254_PAIRING,
            "bls12_381": PR.BLS12_381_PAIRING,
        }[meta["cfg"]]

        def as_pt(v):
            if v is None:
                return None
            return tuple(tuple(c) if isinstance(c, list) else c for c in v)

        self = cls.__new__(cls)
        self.pk = _PkView(
            cfg=cfg,
            domain_size=meta["domain_size"],
            alpha_g1=as_pt(meta["alpha_g1"]),
            beta_g1=as_pt(meta["beta_g1"]),
            delta_g1=as_pt(meta["delta_g1"]),
            beta_g2=as_pt(meta["beta_g2"]),
            delta_g2=as_pt(meta["delta_g2"]),
            l_query=(None,) * meta["n_l"],
            h_query=(None,) * meta["n_h"],
        )
        self.matrices = None
        self.window_bits = meta["window_bits"]
        self.column_steps = meta["column_steps"]
        self.fr = cfg.g1.scalar_field
        bk = backend or meta["backend"]
        self.g1 = C.curve_ops_for(cfg.g1, bk)
        self.g2 = C.curve_ops_for(cfg.g2, bk)
        self.m = meta["domain_size"]
        self.ni = meta["ni"]
        self.nv = meta["nv"]
        self.n_ab = meta["n_ab"]
        self.n_lh = meta["n_lh"]
        self.mats = tuple(
            _SparseMat(
                seg_ids=data[f"mat{i}_seg"],
                cols=data[f"mat{i}_cols"],
                coeffs=data[f"mat{i}_coeffs"],
                max_row_terms=meta["max_row_terms"][i],
            )
            for i in range(3)
        )
        self._mat_buffers = tuple(
            (
                jnp.asarray(data[f"mat{i}_coeffs"]),
                jnp.asarray(data[f"mat{i}_cols"]),
                jnp.asarray(data[f"mat{i}_seg"]),
            )
            for i in range(3)
        )
        self.devices = None
        for tag in ("a", "b1", "b2", "lh"):
            pts = JacobianPoint(
                jnp.asarray(data[f"{tag}_x"]),
                jnp.asarray(data[f"{tag}_y"]),
                jnp.asarray(data[f"{tag}_z"]),
            )
            setattr(self, f"{tag}_pts" if tag != "b1" else "b1_pts", pts)
            setattr(self, f"{tag}_mask", jnp.asarray(data[f"{tag}_mask"]))
        self._buffers = (
            self._mat_buffers,
            (self.a_mask, self.b1_mask, self.b2_mask, self.lh_mask),
        )
        self._scalars_jit = jax.jit(self._prove_scalars)
        self._core = jax.jit(self._prove_core)
        return self

    def _encode_query(self, cops, query, n: int):
        import jax.numpy as jnp

        curve = cops.curve
        pts = [curve.generator if p is None else p for p in query]
        pts += [curve.generator] * (n - len(query))
        mask = np.zeros(n, dtype=np.uint32)
        for i, p in enumerate(query):
            if p is not None:
                mask[i] = 1
        return cops.encode_points(pts), jnp.asarray(mask)

    # -- device pipeline --

    def _row_eval(self, mat: _SparseMat, z_mont, bufs):
        """A/B/C evaluations over the domain: (L, ..., m) Montgomery.

        `bufs` = (coeffs, cols, seg_ids) device buffers for `mat` (from
        `self._mat_buffers`), passed as traced arguments."""
        import jax.numpy as jnp

        from manta_tpu.ops import field_ops as F

        coeffs, cols, seg_ids = bufs
        taken = jnp.take(z_mont, cols, axis=-1)
        if taken.ndim > coeffs.ndim:  # batched: broadcast coeffs over B
            coeffs = coeffs[:, None, :]
        prods = F.mont_mul(self.fr, coeffs, taken)
        return F.segment_sum_mod(
            self.fr, prods, seg_ids, self.m, mat.max_row_terms
        )

    def _h_canonical(self, z_mont, mat_bufs):
        """Witness -> canonical h(x) coefficient limbs, all on device."""
        from manta_tpu.ops import field_ops as F
        from manta_tpu.ops import ntt as NTT

        fr = self.fr
        a_ev = self._row_eval(self.mats[0], z_mont, mat_bufs[0])
        b_ev = self._row_eval(self.mats[1], z_mont, mat_bufs[1])
        c_ev = self._row_eval(self.mats[2], z_mont, mat_bufs[2])
        a_c = NTT.intt(fr, a_ev)
        b_c = NTT.intt(fr, b_ev)
        c_c = NTT.intt(fr, c_ev)
        ab = F.mont_mul(fr, NTT.coset_ntt(fr, a_c), NTT.coset_ntt(fr, b_c))
        diff = F.sub(fr, ab, NTT.coset_ntt(fr, c_c))
        z_inv = pow(
            (pow(fr.generator, self.m, fr.modulus) - 1) % fr.modulus,
            -1,
            fr.modulus,
        )
        h_ev = F.mul_const(fr, diff, F.const(fr, z_inv))
        h_c = NTT.coset_intt(fr, h_ev)
        return F.normalize(fr, F.from_mont(fr, h_c))

    def _prove_scalars(self, z_mont, z_canon, bufs):
        """Witness -> the two masked MSM scalar arrays (AB-side and merged
        L/H-side, h(x) computed on device). `bufs` is `self._buffers`
        (sparse matrices + zero-scalar masks) passed through the jit
        boundary as arguments."""
        import jax.numpy as jnp

        mat_bufs, (a_mask, b1_mask, b2_mask, lh_mask) = bufs
        h_canon = self._h_canonical(z_mont, mat_bufs)
        pad_ab = jnp.zeros(
            (z_canon.shape[0], self.n_ab - self.nv), jnp.uint32
        )
        sc_ab = jnp.concatenate([z_canon, pad_ab], axis=-1)
        n_l = len(self.pk.l_query)
        n_h = len(self.pk.h_query)
        assert n_l == self.nv - self.ni
        sc_lh = jnp.concatenate(
            [
                z_canon[:, self.ni : self.nv],
                h_canon[:, :n_h],
                jnp.zeros(
                    (z_canon.shape[0], self.n_lh - n_l - n_h), jnp.uint32
                ),
            ],
            axis=-1,
        )
        return sc_ab * a_mask[None, :], sc_ab * b1_mask[None, :], \
            sc_ab * b2_mask[None, :], sc_lh * lh_mask[None, :]

    def _run_msm(self, cops, sc, pts, n: int):
        """One MSM through the SHARED jitted kernel (`msm_jit` caches per
        (cops, shapes, statics) — reused across prover instances)."""
        from manta_tpu.ops import msm as M

        return M.msm_jit(
            cops,
            sc,
            pts,
            self.window_bits,
            False,
            min(n, self.column_steps),
            self.fr.bits,
            True,
        )

    def _msms(self, z_mont, z_canon, bufs):
        """The four MSM accumulators for one witness, single trace (used by
        the monolithic `_core`; the split path dispatches `_run_msm`)."""
        from manta_tpu.ops import msm as M

        sc_a, sc_b1, sc_b2, sc_lh = self._prove_scalars(z_mont, z_canon, bufs)

        def run(cops, sc, pts, steps):
            return M.msm(
                cops,
                sc,
                pts,
                self.window_bits,
                False,
                min(steps, self.column_steps),
                scalar_bits=self.fr.bits,
            )

        a_acc = run(self.g1, sc_a, self.a_pts, self.n_ab)
        b1_acc = run(self.g1, sc_b1, self.b1_pts, self.n_ab)
        b2_acc = run(self.g2, sc_b2, self.b2_pts, self.n_ab)
        lh_acc = run(self.g1, sc_lh, self.lh_pts, self.n_lh)
        return a_acc, b1_acc, b2_acc, lh_acc

    def _prove_core(self, z_mont, z_canon, bufs):
        return self._msms(z_mont, z_canon, bufs)

    def replicate_to(self, devices) -> None:
        """Replicate the HBM-resident query points AND the scalar-pipeline
        buffers (sparse matrices + masks) to every device so `prove_batch`
        can fan independent proofs out across them without per-proof
        host->device transfers."""
        import jax

        self.devices = list(devices)
        self._dev_pts = []
        self._dev_bufs = []
        for d in self.devices:
            put = lambda pt: type(pt)(
                jax.device_put(pt.x, d),
                jax.device_put(pt.y, d),
                jax.device_put(pt.z, d),
            )
            self._dev_pts.append(
                (
                    put(self.a_pts),
                    put(self.b1_pts),
                    put(self.b2_pts),
                    put(self.lh_pts),
                )
            )
            self._dev_bufs.append(jax.device_put(self._buffers, d))

    # -- host API --

    def _encode_witness(self, assignment: Sequence[int]):
        import jax.numpy as jnp

        from manta_tpu.ops import field_ops as F

        assert len(assignment) == self.nv
        vals = [int(x) % self.fr.modulus for x in assignment]
        z_mont = jnp.asarray(F.encode_ints(self.fr, vals))
        z_canon = jnp.asarray(F.encode_ints(self.fr, vals, montgomery=False))
        return z_mont, z_canon

    def _finish(
        self, accs, assignment, r_rand: int, s_rand: int
    ) -> G.Proof:
        """Host-side completion: decode the 4 accumulators, apply the
        constant-size randomization terms."""
        pk = self.pk
        cfg = pk.cfg
        g1c, g2c = cfg.g1, cfg.g2
        p = self.fr.modulus
        a_acc = self.g1.decode_points(accs[0])[0]
        b1_acc = self.g1.decode_points(accs[1])[0]
        b2_acc = self.g2.decode_points(accs[2])[0]
        lh_acc = self.g1.decode_points(accs[3])[0]
        a_pt = g1c.add(
            g1c.add(pk.alpha_g1, a_acc), g1c.scalar_mul(r_rand, pk.delta_g1)
        )
        b_pt = g2c.add(
            g2c.add(pk.beta_g2, b2_acc), g2c.scalar_mul(s_rand, pk.delta_g2)
        )
        b1_pt = g1c.add(
            g1c.add(pk.beta_g1, b1_acc), g1c.scalar_mul(s_rand, pk.delta_g1)
        )
        c_pt = g1c.add(lh_acc, g1c.scalar_mul(s_rand, a_pt))
        c_pt = g1c.add(c_pt, g1c.scalar_mul(r_rand, b1_pt))
        c_pt = g1c.add(
            c_pt, g1c.neg(g1c.scalar_mul(r_rand * s_rand % p, pk.delta_g1))
        )
        return G.Proof(a=a_pt, b=b_pt, c=c_pt)

    def _dispatch_proof(self, assignment, device_index: Optional[int]):
        """Enqueue the split pipeline for one witness; returns the four
        accumulator futures (XLA dispatch is async, so sequential calls on
        different devices run concurrently)."""
        import jax
        import jax.numpy as jnp

        z_mont, z_canon = self._encode_witness(assignment)
        if device_index is None:
            pts = (self.a_pts, self.b1_pts, self.b2_pts, self.lh_pts)
            bufs = self._buffers
        else:
            d = self.devices[device_index]
            z_mont = jax.device_put(z_mont, d)
            z_canon = jax.device_put(z_canon, d)
            pts = self._dev_pts[device_index]
            bufs = self._dev_bufs[device_index]
        sc_a, sc_b1, sc_b2, sc_lh = self._scalars_jit(z_mont, z_canon, bufs)
        if getattr(self, "share_g1_shapes", False) and self.n_lh > self.n_ab:
            # pad the a/b1 MSMs into the lh shape: one compiled G1 MSM
            # program instead of two (each cold remote compile of the big
            # MSM body costs minutes; padded lanes are zero scalars +
            # infinity-masked points, weight 0)
            n = self.n_lh

            def pad_sc(sc):
                return jnp.pad(sc, [(0, 0), (0, n - sc.shape[-1])])

            def pad_pts(p):
                padg = [(0, n - p.x.shape[-1])]

                def padc(a):
                    return jnp.pad(
                        a, [(0, 0)] * (a.ndim - 1) + padg
                    )

                return type(p)(padc(p.x), padc(p.y), padc(p.z))

            return (
                self._run_msm(self.g1, pad_sc(sc_a), pad_pts(pts[0]), n),
                self._run_msm(self.g1, pad_sc(sc_b1), pad_pts(pts[1]), n),
                self._run_msm(self.g2, sc_b2, pts[2], self.n_ab),
                self._run_msm(self.g1, sc_lh, pts[3], n),
            )
        return (
            self._run_msm(self.g1, sc_a, pts[0], self.n_ab),
            self._run_msm(self.g1, sc_b1, pts[1], self.n_ab),
            self._run_msm(self.g2, sc_b2, pts[2], self.n_ab),
            self._run_msm(self.g1, sc_lh, pts[3], self.n_lh),
        )

    def prove(
        self,
        assignment: Sequence[int],
        r_rand: int = 0,
        s_rand: int = 0,
        monolithic: bool = False,
    ) -> G.Proof:
        """One proof. `monolithic=True` runs the whole pipeline as a single
        compiled program (best on-chip latency; ~45 min of XLA:CPU compile),
        the default dispatches the split shared programs."""
        if monolithic:
            z_mont, z_canon = self._encode_witness(assignment)
            accs = self._core(z_mont, z_canon, self._buffers)
        else:
            accs = self._dispatch_proof(assignment, None)
        return self._finish(accs, assignment, r_rand, s_rand)

    def prove_batch(
        self,
        assignments: Sequence[Sequence[int]],
        rands: Optional[Sequence[tuple]] = None,
    ) -> List[G.Proof]:
        """Prove B independent witnesses; with `replicate_to(devices)` set,
        proofs round-robin across devices and execute concurrently (async
        dispatch queues per device) — the multi-chip proofs/sec path."""
        if rands is None:
            rands = [(0, 0)] * len(assignments)
        n_dev = len(self.devices) if self.devices else 0
        pending = []
        for i, assignment in enumerate(assignments):
            accs = self._dispatch_proof(
                assignment, i % n_dev if n_dev else None
            )
            pending.append(accs)
        return [
            self._finish(accs, assignment, r, s)
            for accs, assignment, (r, s) in zip(pending, assignments, rands)
        ]
