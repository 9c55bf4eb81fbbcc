"""Merkle forest UTXO accumulator.

Bookkeeping of the reference's `TreeArrayMerkleForest` (256 trees, height
20, identity leaf hash, Poseidon-2 inner hash, Blake2s shard index —
reference `manta-crypto/src/merkle_tree/*`, `config/utxo.rs:1282-1337`).

Tree shape (reference `tree.rs:214-232`): HEIGHT = 20 means 2^19 leaves and
a path of 1 sibling leaf + 18 inner siblings. Empty subtrees hash from the
default leaf value 0.

Two storage modes per tree:

- **full** (ledger side): every leaf and the sparse inner digests are kept,
  any membership path can be re-derived (reference `merkle_tree/full.rs`).
- **pruned** (signer side, `prune=True`): only the current frontier and the
  paths of *provable* (owned) leaves survive `prune()` — memory is
  O(provable + height), mirroring the signer's `Partial` tree + leaf-map
  pruning (reference `merkle_tree/partial.rs:60`, `leaf_map.rs`,
  `wallet/signer/functions.rs:147-209`).

Bulk insertion (`ShardTree.extend` / `MerkleForest.extend_items`) hashes
level-by-level with the batched device Poseidon kernel
(`manta_tpu.ops.poseidon`): a B-leaf append costs ~2B batched hashes in
log2(B)·height device dispatches instead of 19·B sequential host hashes —
this is the ledger-diff sync hot loop (reference `functions.rs:210`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Iterable, List, Optional, Set

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol.utxo import shard_index
from manta_tpu.utils import grain

#: batch size at which level hashing moves to the device kernel
DEVICE_HASH_THRESHOLD = 64


@functools.lru_cache(maxsize=None)
def _empty_digests(cfg: CFG.MantaPayConfig) -> List[int]:
    """empty[k] = digest of an empty depth-k subtree (k=0: default leaf 0)."""
    spec = cfg.merkle_inner
    out = [0]
    for _ in range(cfg.merkle_height - 1):
        out.append(grain.poseidon_hash(spec, [out[-1], out[-1]]))
    return out


def _hash_pairs(cfg: CFG.MantaPayConfig, lefts: List[int], rights: List[int]):
    """Poseidon-2 over pairs; device-batched beyond DEVICE_HASH_THRESHOLD."""
    spec = cfg.merkle_inner
    n = len(lefts)
    if n < DEVICE_HASH_THRESHOLD:
        return [
            grain.poseidon_hash(spec, [l, r]) for l, r in zip(lefts, rights)
        ]
    import jax.numpy as jnp

    from manta_tpu.ops import field_ops as F
    from manta_tpu.ops import poseidon as P

    pad = -(-n // 128) * 128
    enc_l = F.encode_ints(spec.field, lefts + [0] * (pad - n))
    enc_r = F.encode_ints(spec.field, rights + [0] * (pad - n))
    out = P.hash_jit(spec, jnp.stack([jnp.asarray(enc_l), jnp.asarray(enc_r)]))
    return F.decode_ints(spec.field, out)[:n]


@dataclasses.dataclass
class MembershipProof:
    """Authentication path: leaf index + sibling digests bottom-up
    (sibling leaf first, then inner siblings)."""

    shard: int
    index: int
    siblings: List[int]  # length = height - 1 (19 for height 20)


class ShardTree:
    """Incremental Merkle tree over one forest shard (full or pruned)."""

    def __init__(self, cfg: CFG.MantaPayConfig, prune: bool = False):
        self.cfg = cfg
        self.prune_mode = prune
        self.count = 0
        self.provable: Set[int] = set()
        self._leaf_values: Dict[int, int] = {}
        # sparse storage of inner digests: level k -> {index: digest}
        self._levels: List[Dict[int, int]] = [
            {} for _ in range(cfg.merkle_height)
        ]

    def __len__(self) -> int:
        return self.count

    @property
    def leaves(self) -> List[int]:
        """Dense leaf list — full-mode trees only (pruned trees no longer
        hold every leaf; use `leaf_value`)."""
        assert not self.prune_mode, "pruned tree has no dense leaf list"
        return [self._leaf_values[i] for i in range(self.count)]

    def leaf_value(self, index: int) -> Optional[int]:
        return self._leaf_values.get(index)

    def insert(self, leaf: int, provable: bool = True) -> int:
        """Insert one leaf and return its index."""
        return self.extend([leaf], provable=(0,) if provable else ())

    def extend(
        self, leaves: List[int], provable: Iterable[int] = ()
    ) -> int:
        """Bulk append; `provable` holds offsets into `leaves` whose paths
        must stay derivable after pruning. Returns the first new index."""
        if not leaves:
            return self.count
        start = self.count
        assert start + len(leaves) <= self.cfg.capacity, "shard tree full"
        for off in provable:
            self.provable.add(start + off)
        level0 = self._levels[0]
        for j, leaf in enumerate(leaves):
            level0[start + j] = leaf
            self._leaf_values[start + j] = leaf
        lo, hi = start, start + len(leaves) - 1
        for level in range(self.cfg.merkle_height - 1):
            plo, phi = lo // 2, hi // 2
            parents = range(plo, phi + 1)
            lefts = [self._node(level, 2 * i) for i in parents]
            rights = [self._node(level, 2 * i + 1) for i in parents]
            digests = _hash_pairs(self.cfg, lefts, rights)
            nxt = self._levels[level + 1]
            for i, d in zip(parents, digests):
                nxt[i] = d
            lo, hi = plo, phi
        self.count = start + len(leaves)
        return start

    def mark_provable(self, index: int) -> None:
        """Flag a leaf as owned so `prune()` keeps its path. Must be called
        before the nodes along its path are pruned (i.e. in the same sync
        round that inserted it)."""
        assert index < self.count
        assert index in self._leaf_values, "leaf already pruned"
        self.provable.add(index)

    def _node(self, level: int, index: int) -> int:
        level_map = self._levels[level]
        if index in level_map:
            return level_map[index]
        return _empty_digests(self.cfg)[level]

    def _needed_keys(self) -> List[Set[int]]:
        """Node keys that must survive pruning: the frontier path (future
        appends combine against its left siblings) and every provable
        leaf's path siblings."""
        h = self.cfg.merkle_height
        need: List[Set[int]] = [set() for _ in range(h)]
        if self.count:
            f = self.count - 1
            for level in range(h):
                need[level].update((f, f ^ 1))
                f //= 2
        for leaf in self.provable:
            i = leaf
            for level in range(h):
                need[level].update((i, i ^ 1))
                i //= 2
        return need

    def prune(self) -> None:
        """Drop every node not required for the frontier or a provable
        path. No-op for full-mode trees."""
        if not self.prune_mode:
            return
        need = self._needed_keys()
        for level, keep in enumerate(need):
            level_map = self._levels[level]
            for key in list(level_map):
                if key not in keep:
                    del level_map[key]
        keep_leaves = need[0]
        for key in list(self._leaf_values):
            if key not in keep_leaves:
                del self._leaf_values[key]

    @property
    def root(self) -> int:
        return self._node(self.cfg.merkle_height - 1, 0)

    def path(self, leaf_index: int) -> List[int]:
        assert leaf_index < self.count
        siblings = []
        idx = leaf_index
        for level in range(self.cfg.merkle_height - 1):
            siblings.append(self._node(level, idx ^ 1))
            idx //= 2
        return siblings

    def verify_path(self, leaf: int, leaf_index: int, siblings: List[int]) -> bool:
        return (
            compute_root(self.cfg, leaf, leaf_index, siblings) == self.root
        )

    # -- persistence (signer snapshots; wallet.py save/load) --

    def to_state(self) -> dict:
        return {
            "count": self.count,
            "prune": self.prune_mode,
            "provable": sorted(self.provable),
            "leaves": {str(i): hex(v) for i, v in self._leaf_values.items()},
            "levels": [
                {str(i): hex(v) for i, v in level.items()}
                for level in self._levels
            ],
        }

    @classmethod
    def from_state(cls, cfg: CFG.MantaPayConfig, state: dict) -> "ShardTree":
        tree = cls(cfg, prune=state["prune"])
        tree.count = state["count"]
        tree.provable = set(state["provable"])
        tree._leaf_values = {
            int(i): int(v, 16) for i, v in state["leaves"].items()
        }
        tree._levels = [
            {int(i): int(v, 16) for i, v in level.items()}
            for level in state["levels"]
        ]
        return tree


def compute_root(
    cfg: CFG.MantaPayConfig, leaf: int, leaf_index: int, siblings: List[int]
) -> int:
    spec = cfg.merkle_inner
    node = leaf
    idx = leaf_index
    for sib in siblings:
        node = (
            grain.poseidon_hash(spec, [sib, node])
            if idx & 1
            else grain.poseidon_hash(spec, [node, sib])
        )
        idx //= 2
    return node


class MerkleForest:
    """Forest of shard trees addressed by the Blake2s shard index."""

    def __init__(self, cfg: CFG.MantaPayConfig, prune: bool = False):
        self.cfg = cfg
        self.prune_mode = prune
        self.shards: Dict[int, ShardTree] = {}

    def shard(self, index: int) -> ShardTree:
        if index not in self.shards:
            self.shards[index] = ShardTree(self.cfg, prune=self.prune_mode)
        return self.shards[index]

    def insert_item(self, item: int) -> MembershipProof:
        s = shard_index(self.cfg, item)
        tree = self.shard(s)
        idx = tree.insert(item)
        return MembershipProof(shard=s, index=idx, siblings=tree.path(idx))

    def extend_items(self, items: List[int]) -> List[tuple]:
        """Bulk insert; returns [(shard, index)] per item in order. Groups
        by shard so each shard's append is one device-batched extend."""
        by_shard: Dict[int, List[int]] = {}
        placed = []
        for item in items:
            s = shard_index(self.cfg, item)
            by_shard.setdefault(s, []).append(item)
            placed.append((s, len(by_shard[s]) - 1))
        starts = {
            s: self.shard(s).extend(leaves) for s, leaves in by_shard.items()
        }
        return [(s, starts[s] + off) for s, off in placed]

    def current_proof(self, item: int, shard: int, index: int) -> MembershipProof:
        """Re-derive an up-to-date path after later insertions."""
        tree = self.shard(shard)
        assert tree.leaf_value(index) == item
        return MembershipProof(
            shard=shard, index=index, siblings=tree.path(index)
        )

    def root(self, shard: int) -> int:
        return self.shard(shard).root

    def verify(self, item: int, proof: MembershipProof) -> bool:
        tree = self.shard(proof.shard)
        return (
            shard_index(self.cfg, item) == proof.shard
            and compute_root(self.cfg, item, proof.index, proof.siblings)
            == tree.root
        )

    def prune(self) -> None:
        for tree in self.shards.values():
            tree.prune()


class ForkedForest:
    """Copy-on-write fork of a MerkleForest for speculative ledger state.

    The reference's fork/trunk machinery (`manta-crypto/src/merkle_tree/
    fork.rs`: `Trunk`/`Fork`/`ForkedTree`) lets actors build posts against a
    speculative view and merge or discard it. This fork records insertions
    as an overlay; `merge()` applies them to the base forest, `discard()`
    drops them. Reads see base + overlay. Forks are a ledger-side feature
    and require a full-mode (unpruned) base.
    """

    def __init__(self, base: MerkleForest):
        assert not base.prune_mode, "cannot fork a pruned forest"
        self.base = base
        self.cfg = base.cfg
        self._overlay: Dict[int, List[int]] = {}
        # cached forked trees rebuilt lazily per shard
        self._forked: Dict[int, ShardTree] = {}

    def _tree(self, shard: int) -> ShardTree:
        if shard not in self._forked:
            tree = ShardTree(self.cfg)
            tree.extend(self.base.shard(shard).leaves)
            tree.extend(self._overlay.get(shard, []))
            self._forked[shard] = tree
        return self._forked[shard]

    def insert_item(self, item: int) -> MembershipProof:
        s = shard_index(self.cfg, item)
        tree = self._tree(s)  # materialize the fork BEFORE recording overlay
        self._overlay.setdefault(s, []).append(item)
        idx = tree.insert(item)
        return MembershipProof(shard=s, index=idx, siblings=tree.path(idx))

    def root(self, shard: int) -> int:
        if shard in self._forked or shard in self._overlay:
            return self._tree(shard).root
        return self.base.root(shard)

    def merge(self) -> None:
        """Apply the speculative insertions to the trunk
        (reference `fork.rs:1022` merge_fork)."""
        for shard, leaves in self._overlay.items():
            self.base.shard(shard).extend(leaves)
        self._overlay.clear()
        self._forked.clear()

    def discard(self) -> None:
        self._overlay.clear()
        self._forked.clear()
