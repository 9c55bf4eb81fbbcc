"""Asset accounting: lists, keyed maps, and coin selection.

Mirrors `manta-accounting/src/asset.rs`:

- `AssetList` (`asset.rs:371`): id-sorted value aggregation with
  deposit/withdraw/value/contains — the balance-state container.
- `AssetMap` (`asset.rs:690`): keyed asset storage (keys here are
  (shard, index) UTXO positions) with `select` -> `Selection` and
  zero-coin queries — the signer's coin-selection backend
  (`wallet/signer/functions.rs:490`).
- `Selection` (`asset.rs:942`): chosen keys + change value.

`Asset` itself lives in `manta_tpu.protocol.notes` (id, value pairs).
"""

from __future__ import annotations

import bisect
import dataclasses
from typing import Dict, Iterable, List, Tuple

from manta_tpu.protocol.notes import Asset


class AssetList:
    """Id-sorted (id, value) aggregation (reference `asset.rs:371`)."""

    def __init__(self, assets: Iterable[Asset] = ()):
        self._ids: List[int] = []
        self._values: List[int] = []
        for asset in assets:
            self.deposit(asset)

    def __len__(self) -> int:
        return len(self._ids)

    def __iter__(self):
        return (Asset(i, v) for i, v in zip(self._ids, self._values))

    def value(self, asset_id: int) -> int:
        k = bisect.bisect_left(self._ids, asset_id)
        if k < len(self._ids) and self._ids[k] == asset_id:
            return self._values[k]
        return 0

    def contains(self, asset: Asset) -> bool:
        return asset.value == 0 or self.value(asset.id) >= asset.value

    def deposit(self, asset: Asset) -> None:
        if asset.value == 0:
            return
        k = bisect.bisect_left(self._ids, asset.id)
        if k < len(self._ids) and self._ids[k] == asset.id:
            self._values[k] += asset.value
        else:
            self._ids.insert(k, asset.id)
            self._values.insert(k, asset.value)

    def withdraw(self, asset: Asset) -> bool:
        """Subtract (dropping emptied entries); False if insufficient
        (reference `asset.rs` withdraw)."""
        if asset.value == 0:
            return True
        k = bisect.bisect_left(self._ids, asset.id)
        if k >= len(self._ids) or self._ids[k] != asset.id:
            return False
        if self._values[k] < asset.value:
            return False
        self._values[k] -= asset.value
        if self._values[k] == 0:
            del self._ids[k]
            del self._values[k]
        return True

    def clear(self) -> None:
        self._ids.clear()
        self._values.clear()


@dataclasses.dataclass
class Selection:
    """Keys covering a requested spend + the change left over
    (reference `asset.rs:942`)."""

    change: int
    values: List[Tuple[object, int]]  # (key, value drawn from that key)

    @property
    def keys(self):
        return [k for k, _ in self.values]

    def is_empty(self) -> bool:
        return not self.values


class AssetMap:
    """Keyed asset storage with coin selection (reference `asset.rs:690`).

    Keys are opaque (the signer uses (shard, index) UTXO positions)."""

    def __init__(self):
        self._map: Dict[object, Asset] = {}

    def __len__(self) -> int:
        return len(self._map)

    def insert(self, key, asset: Asset) -> None:
        self._map[key] = asset

    def remove(self, key) -> bool:
        return self._map.pop(key, None) is not None

    def assets(self) -> AssetList:
        return AssetList(self._map.values())

    def zeroes(self, n: int, asset_id: int) -> List[object]:
        """At most n keys holding zero-value coins of `asset_id`."""
        out = []
        for key, asset in self._map.items():
            if asset.id == asset_id and asset.value == 0:
                out.append(key)
                if len(out) == n:
                    break
        return out

    def select(self, asset: Asset) -> Selection:
        """Choose keys totalling >= asset.value: the single smallest
        sufficient coin if one exists, else largest-first accumulation
        (the signer's strategy, `functions.rs:490`). Empty selection if
        the balance cannot cover the request."""
        if asset.value == 0:
            return Selection(change=0, values=[])
        candidates = sorted(
            (
                (key, a.value)
                for key, a in self._map.items()
                if a.id == asset.id and a.value > 0
            ),
            key=lambda kv: kv[1],
        )
        for key, value in candidates:
            if value >= asset.value:
                return Selection(change=value - asset.value, values=[(key, value)])
        chosen, total = [], 0
        for key, value in reversed(candidates):
            chosen.append((key, value))
            total += value
            if total >= asset.value:
                return Selection(change=total - asset.value, values=chosen)
        return Selection(change=0, values=[])
