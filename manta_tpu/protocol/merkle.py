"""Merkle forest UTXO accumulator.

Host-side bookkeeping of the reference's `TreeArrayMerkleForest` (256 trees,
height 20, identity leaf hash, Poseidon-2 inner hash, Blake2s shard index —
reference `manta-crypto/src/merkle_tree/*`, `config/utxo.rs:1282-1337`).

Tree shape (reference `tree.rs:214-232`): HEIGHT = 20 means 2^19 leaves and
a path of 1 sibling leaf + 18 inner siblings. Empty subtrees hash from the
default leaf value 0.

Each shard is a *partial* tree: only the paths of "provable" (owned) leaves
are retained, everything else is pruned to digests — mirroring the signer's
`Partial` tree (reference `merkle_tree/partial.rs`). Bulk device hashing of
inserts is a later optimization hook (`manta_tpu.ops.poseidon`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol.utxo import shard_index
from manta_tpu.utils import grain


@functools.lru_cache(maxsize=None)
def _empty_digests(cfg: CFG.MantaPayConfig) -> List[int]:
    """empty[k] = digest of an empty depth-k subtree (k=0: default leaf 0)."""
    spec = cfg.merkle_inner
    out = [0]
    for _ in range(cfg.merkle_height - 1):
        out.append(grain.poseidon_hash(spec, [out[-1], out[-1]]))
    return out


@dataclasses.dataclass
class MembershipProof:
    """Authentication path: leaf index + sibling digests bottom-up
    (sibling leaf first, then inner siblings)."""

    shard: int
    index: int
    siblings: List[int]  # length = height - 1 (19 for height 20)


class ShardTree:
    """Incremental Merkle tree over one forest shard.

    Stores all inserted leaves plus the frontier; recomputes paths on
    demand from stored leaves (small shards) — the pruning optimization
    drops unneeded leaves for non-provable entries.
    """

    def __init__(self, cfg: CFG.MantaPayConfig):
        self.cfg = cfg
        self.leaves: List[int] = []
        # sparse storage of inner digests: level k -> {index: digest}
        self._levels: List[Dict[int, int]] = [
            {} for _ in range(cfg.merkle_height)
        ]

    def __len__(self) -> int:
        return len(self.leaves)

    @property
    def _spec(self):
        return self.cfg.merkle_inner

    def insert(self, leaf: int) -> int:
        """Insert and return the leaf index."""
        idx = len(self.leaves)
        assert idx < self.cfg.capacity, "shard tree full"
        self.leaves.append(leaf)
        self._levels[0][idx] = leaf
        self._update_path(idx)
        return idx

    def _node(self, level: int, index: int) -> int:
        level_map = self._levels[level]
        if index in level_map:
            return level_map[index]
        return _empty_digests(self.cfg)[level]

    def _update_path(self, leaf_index: int):
        spec = self._spec
        idx = leaf_index
        for level in range(self.cfg.merkle_height - 1):
            parent = idx // 2
            left = self._node(level, parent * 2)
            right = self._node(level, parent * 2 + 1)
            self._levels[level + 1][parent] = grain.poseidon_hash(
                spec, [left, right]
            )
            idx = parent

    @property
    def root(self) -> int:
        return self._node(self.cfg.merkle_height - 1, 0)

    def path(self, leaf_index: int) -> List[int]:
        assert leaf_index < len(self.leaves)
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

    def __init__(self, cfg: CFG.MantaPayConfig):
        self.cfg = cfg
        self.shards: Dict[int, ShardTree] = {}

    def shard(self, index: int) -> ShardTree:
        if index not in self.shards:
            self.shards[index] = ShardTree(self.cfg)
        return self.shards[index]

    def insert_item(self, item: int) -> MembershipProof:
        s = shard_index(self.cfg, item)
        tree = self.shard(s)
        idx = tree.insert(item)
        return MembershipProof(shard=s, index=idx, siblings=tree.path(idx))

    def current_proof(self, item: int, shard: int, index: int) -> MembershipProof:
        """Re-derive an up-to-date path after later insertions."""
        tree = self.shard(shard)
        assert tree.leaves[index] == item
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


class ForkedForest:
    """Copy-on-write fork of a MerkleForest for speculative ledger state.

    The reference's fork/trunk machinery (`manta-crypto/src/merkle_tree/
    fork.rs`: `Trunk`/`Fork`/`ForkedTree`) lets actors build posts against a
    speculative view and merge or discard it. This fork records insertions
    as an overlay; `merge()` applies them to the base forest, `discard()`
    drops them. Reads see base + overlay.
    """

    def __init__(self, base: MerkleForest):
        self.base = base
        self.cfg = base.cfg
        self._overlay: Dict[int, List[int]] = {}
        # cached forked trees rebuilt lazily per shard
        self._forked: Dict[int, ShardTree] = {}

    def _tree(self, shard: int) -> ShardTree:
        if shard not in self._forked:
            tree = ShardTree(self.cfg)
            for leaf in self.base.shard(shard).leaves:
                tree.insert(leaf)
            for leaf in self._overlay.get(shard, []):
                tree.insert(leaf)
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
            base_tree = self.base.shard(shard)
            for leaf in leaves:
                base_tree.insert(leaf)
        self._overlay.clear()
        self._forked.clear()

    def discard(self) -> None:
        self._overlay.clear()
        self._forked.clear()
