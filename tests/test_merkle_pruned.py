"""Pruned shard trees + bulk (device-batched) insertion.

The signer-side accumulator must stay O(owned coins + frontier) while
remaining path/root-identical to a full tree (reference
`merkle_tree/partial.rs:60`, `leaf_map.rs`, `functions.rs:147-209`), and
bulk `extend` (the ledger-diff sync hot loop) must agree with sequential
insertion including across the device-hash threshold.
"""

import random

import pytest

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import merkle as MK

CFG_T = CFG.test_config(merkle_height=10)  # capacity 2^9 = 512 leaves


@pytest.fixture
def items(rng):
    return [rng.randrange(CFG_T.field.modulus) for _ in range(150)]


def test_extend_matches_sequential(items):
    seq = MK.ShardTree(CFG_T)
    for x in items:
        seq.insert(x)
    # bulk in uneven chunks, crossing the device-hash threshold (>=64)
    bulk = MK.ShardTree(CFG_T)
    bulk.extend(items[:3])
    bulk.extend(items[3:100])
    bulk.extend(items[100:])
    assert bulk.root == seq.root
    for idx in (0, 7, 99, 149):
        assert bulk.path(idx) == seq.path(idx)


def test_pruned_tree_keeps_provable_paths(items):
    full = MK.ShardTree(CFG_T)
    pruned = MK.ShardTree(CFG_T, prune=True)
    provable = {5, 40, 77}
    for i, x in enumerate(items):
        full.insert(x)
    pruned.extend(items, provable=provable)
    pruned.prune()
    assert pruned.root == full.root
    for idx in provable:
        assert pruned.path(idx) == full.path(idx)
        assert pruned.leaf_value(idx) == items[idx]
        assert pruned.verify_path(items[idx], idx, pruned.path(idx))
    # non-provable leaves are gone
    assert pruned.leaf_value(10) is None
    # memory is O(provable + height), not O(n)
    stored = sum(len(level) for level in pruned._levels)
    h = CFG_T.merkle_height
    assert stored <= (len(provable) + 1) * 2 * h


def test_pruned_tree_extends_after_prune(items, rng):
    full = MK.ShardTree(CFG_T)
    pruned = MK.ShardTree(CFG_T, prune=True)
    pruned.extend(items[:90], provable={12})
    for x in items[:90]:
        full.insert(x)
    pruned.prune()
    # keep appending after pruning: roots must track the full tree
    more = items[90:]
    pruned.extend(more, provable={4})
    for x in more:
        full.insert(x)
    assert pruned.root == full.root
    assert pruned.path(12) == full.path(12)
    assert pruned.path(94) == full.path(94)
    pruned.prune()
    assert pruned.root == full.root
    assert pruned.path(12) == full.path(12)


def test_state_roundtrip(items):
    tree = MK.ShardTree(CFG_T, prune=True)
    tree.extend(items[:80], provable={3, 9})
    tree.prune()
    restored = MK.ShardTree.from_state(CFG_T, tree.to_state())
    assert restored.root == tree.root
    assert restored.path(3) == tree.path(3)
    restored.extend(items[80:])
    tree.extend(items[80:])
    assert restored.root == tree.root


def test_forest_extend_items(rng):
    cfg = CFG_T
    items = [rng.randrange(cfg.field.modulus) for _ in range(60)]
    one = MK.MerkleForest(cfg)
    for x in items:
        one.insert_item(x)
    bulk = MK.MerkleForest(cfg)
    placed = bulk.extend_items(items)
    for x, (shard, index) in zip(items, placed):
        assert bulk.verify(x, bulk.current_proof(x, shard, index))
    for shard in set(s for s, _ in placed):
        assert bulk.root(shard) == one.root(shard)
