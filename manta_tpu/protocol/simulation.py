"""Multi-actor randomized simulation with balance-conservation checking.

The TPU-stack port of the reference's strongest integration test
(`manta-accounting/src/wallet/test/mod.rs:776-1056` +
`manta-pay/src/simulation/`): N wallets issue randomized
ToPrivate / PrivateTransfer / ToPublic actions against a shared in-memory
ledger; at the end, for every asset id,

    initial public supply == final public balances + final private balances

and every wallet's tracked balance matches what its signer can actually
spend. Run via `python -m manta_tpu.protocol.simulation [actors] [rounds]`.
"""

from __future__ import annotations

import random
import sys
from typing import Dict, List

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import wallet as W


def run_simulation(
    num_actors: int = 2,
    num_rounds: int = 6,
    asset_ids=(1, 2),
    initial_balance: int = 1000,
    seed: int = 0,
    cfg: CFG.MantaPayConfig = None,
    shape_keys: Dict[str, TX.ShapeKeys] = None,
    verbose: bool = False,
) -> dict:
    cfg = cfg or CFG.test_config()
    rng = random.Random(seed)
    if shape_keys is None:
        shape_keys = {
            shape: TX.setup_shape(cfg, shape, seed=seed)
            for shape in ("to_private", "private_transfer", "to_public")
        }
    ledger = L.Ledger(cfg, shape_keys)
    wallets: List[W.Wallet] = []
    for i in range(num_actors):
        name = f"actor{i}"
        sk = rng.randrange(1, min(1 << cfg.scalar_bits, CFG.EMBEDDED_FR.modulus))
        signer = W.Signer(cfg, shape_keys, sk, random.Random(seed * 997 + i))
        wallets.append(W.Wallet(name, signer, ledger))
        for aid in asset_ids:
            ledger.deposit(name, aid, initial_balance)

    actions = {"to_private": 0, "private_transfer": 0, "to_public": 0, "skip": 0}
    for rnd in range(num_rounds):
        wallet = rng.choice(wallets)
        aid = rng.choice(list(asset_ids))
        wallet.sync()
        choice = rng.choice(["to_private", "private_transfer", "to_public"])
        if choice != "to_private" and wallet.signer.balance(aid) == 0:
            # nothing private to spend yet — shield funds instead (the
            # reference's ActionDistribution biases the same way)
            choice = "to_private"
        try:
            if choice == "to_private":
                pub = wallet.public_balance(aid)
                if pub == 0:
                    actions["skip"] += 1
                    continue
                value = rng.randrange(1, pub + 1)
                wallet.to_private(N.Asset(aid, value))
            elif choice == "private_transfer":
                priv = wallet.signer.balance(aid)
                if priv == 0:
                    actions["skip"] += 1
                    continue
                value = rng.randrange(1, priv + 1)
                target = rng.choice(wallets)
                wallet.private_transfer(target.address, N.Asset(aid, value))
                target.sync()
            else:
                priv = wallet.signer.balance(aid)
                if priv == 0:
                    actions["skip"] += 1
                    continue
                value = rng.randrange(1, priv + 1)
                wallet.to_public(N.Asset(aid, value))
        except ValueError:
            actions["skip"] += 1
            continue
        actions[choice] += 1
        if verbose:
            print(f"round {rnd}: {wallet.name} {choice} asset {aid}", flush=True)

    # final conservation check
    for wallet in wallets:
        wallet.sync()
    report = {"actions": actions, "conserved": True}
    for aid in asset_ids:
        public_total = sum(w.public_balance(aid) for w in wallets)
        private_total = sum(w.signer.balance(aid) for w in wallets)
        expected = initial_balance * num_actors
        ok = public_total + private_total == expected
        report[f"asset_{aid}"] = {
            "public": public_total,
            "private": private_total,
            "expected": expected,
            "ok": ok,
        }
        report["conserved"] = report["conserved"] and ok
        # wallet-tracked balances agree with signer state
        for w in wallets:
            assert w.balance(aid) == w.signer.balance(aid)
    return report


def run_simulation_wire(
    num_actors: int = 2,
    num_rounds: int = 6,
    asset_ids=(1, 2),
    initial_balance: int = 1000,
    seed: int = 0,
    cfg: CFG.MantaPayConfig = None,
    shape_keys: Dict[str, TX.ShapeKeys] = None,
    verbose: bool = False,
) -> dict:
    """The same randomized property simulation, but over the WIRE STACK:
    every wallet talks to its signer daemon over HTTP, every signer and
    wallet reaches the ledger through the ledger HTTP service — the
    reference's deployment topology (`manta-pay/src/bin/simulation.rs:29-54`
    spawns the tide ledger server and HTTP signer connections)."""
    from manta_tpu.protocol import rpc as RPC
    from manta_tpu.protocol import signer_rpc as SR

    cfg = cfg or CFG.test_config()
    rng = random.Random(seed)
    if shape_keys is None:
        shape_keys = {
            shape: TX.setup_shape(cfg, shape, seed=seed)
            for shape in ("to_private", "private_transfer", "to_public")
        }
    ledger = L.Ledger(cfg, shape_keys)
    ledger_srv = RPC.LedgerServer(ledger).start()
    ledger_url = f"http://127.0.0.1:{ledger_srv.port}"
    signer_srvs = []
    actors = []  # (name, signer_client, ledger_client, balances)
    try:
        for i in range(num_actors):
            name = f"actor{i}"
            sk = rng.randrange(
                1, min(1 << cfg.scalar_bits, CFG.EMBEDDED_FR.modulus)
            )
            signer = W.Signer(cfg, shape_keys, sk, random.Random(seed * 997 + i))
            srv = SR.SignerServer(signer, ledger_url).start()
            signer_srvs.append(srv)
            actors.append(
                {
                    "name": name,
                    "client": SR.SignerClient(f"http://127.0.0.1:{srv.port}"),
                    "ledger": RPC.LedgerClient(ledger_url),
                    "balances": {},
                }
            )
            for aid in asset_ids:
                ledger.deposit(name, aid, initial_balance)

        def sync(actor):
            for aid, delta in actor["client"].sync().items():
                actor["balances"][aid] = actor["balances"].get(aid, 0) + delta

        actions = {
            "to_private": 0, "private_transfer": 0, "to_public": 0, "skip": 0
        }
        for rnd in range(num_rounds):
            actor = rng.choice(actors)
            aid = rng.choice(list(asset_ids))
            sync(actor)
            choice = rng.choice(["to_private", "private_transfer", "to_public"])
            if choice != "to_private" and actor["balances"].get(aid, 0) == 0:
                choice = "to_private"
            try:
                if choice == "to_private":
                    pub = ledger.balance(actor["name"], aid)
                    if pub == 0:
                        actions["skip"] += 1
                        continue
                    value = rng.randrange(1, pub + 1)
                    (post,) = actor["client"].sign(
                        "to_private", N.Asset(aid, value)
                    )
                    actor["ledger"].push(post, sources=[actor["name"]])
                elif choice == "private_transfer":
                    priv = actor["balances"].get(aid, 0)
                    value = rng.randrange(1, priv + 1)
                    target = rng.choice(actors)
                    addr = target["client"].address()
                    posts = actor["client"].sign(
                        "private_transfer", N.Asset(aid, value), address=addr
                    )
                    for post in posts:
                        actor["ledger"].push(post)
                    sync(target)
                else:
                    priv = actor["balances"].get(aid, 0)
                    value = rng.randrange(1, priv + 1)
                    posts = actor["client"].sign("to_public", N.Asset(aid, value))
                    for post in posts:
                        actor["ledger"].push(
                            post,
                            sinks=[actor["name"]]
                            if post.shape == "to_public"
                            else None,
                        )
            except ValueError:
                actions["skip"] += 1
                continue
            actions[choice] += 1
            if verbose:
                print(
                    f"round {rnd}: {actor['name']} {choice} asset {aid}",
                    flush=True,
                )

        for actor in actors:
            sync(actor)
        report = {"actions": actions, "conserved": True, "wire": True}
        for aid in asset_ids:
            public_total = sum(
                ledger.balance(a["name"], aid) for a in actors
            )
            private_total = sum(
                a["client"].balance(aid) for a in actors
            )
            expected = initial_balance * num_actors
            ok = public_total + private_total == expected
            report[f"asset_{aid}"] = {
                "public": public_total,
                "private": private_total,
                "expected": expected,
                "ok": ok,
            }
            report["conserved"] = report["conserved"] and ok
            for a in actors:
                assert a["balances"].get(aid, 0) == a["client"].balance(aid)
        return report
    finally:
        for srv in signer_srvs:
            srv.stop()
        ledger_srv.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--wire"]
    wire = "--wire" in sys.argv[1:]
    actors = int(args[0]) if len(args) > 0 else 2
    rounds = int(args[1]) if len(args) > 1 else 6
    runner = run_simulation_wire if wire else run_simulation
    result = runner(actors, rounds, verbose=True)
    print(result)
    assert result["conserved"], "BALANCE CONSERVATION VIOLATED"
    print("balance conservation holds")
