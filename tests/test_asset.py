"""Asset accounting (reference `manta-accounting/src/asset.rs`)."""

from manta_tpu.protocol.asset import Asset, AssetList, AssetMap


def test_asset_list_deposit_withdraw():
    lst = AssetList()
    lst.deposit(Asset(3, 10))
    lst.deposit(Asset(1, 5))
    lst.deposit(Asset(3, 7))
    assert lst.value(3) == 17 and lst.value(1) == 5 and lst.value(9) == 0
    assert [a.id for a in lst] == [1, 3]  # id-sorted
    assert lst.contains(Asset(3, 17)) and not lst.contains(Asset(3, 18))
    assert lst.contains(Asset(99, 0))  # zero is always contained
    assert lst.withdraw(Asset(3, 17))
    assert not lst.withdraw(Asset(3, 1))
    assert lst.value(3) == 0 and len(lst) == 1


def test_asset_map_select():
    amap = AssetMap()
    amap.insert(("s", 0), Asset(7, 5))
    amap.insert(("s", 1), Asset(7, 12))
    amap.insert(("s", 2), Asset(7, 40))
    amap.insert(("s", 3), Asset(8, 100))
    amap.insert(("s", 4), Asset(7, 0))
    # single smallest sufficient coin
    sel = amap.select(Asset(7, 10))
    assert sel.keys == [("s", 1)] and sel.change == 2
    # largest-first accumulation
    sel = amap.select(Asset(7, 45))
    assert set(sel.keys) == {("s", 2), ("s", 1)} and sel.change == 7
    # insufficient -> empty
    assert amap.select(Asset(7, 100)).is_empty()
    # zero coins are queryable but never selected
    assert amap.zeroes(2, 7) == [("s", 4)]
    assert amap.select(Asset(9, 0)).is_empty()
    # totals
    assert amap.assets().value(7) == 57
    assert amap.remove(("s", 3)) and not amap.remove(("s", 3))
