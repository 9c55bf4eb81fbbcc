"""Networked multi-circuit ceremony (reference `groth16/ceremony/server.rs`,
`client.rs`, `mpc.rs:287` Parallel rounds).

End-to-end: two contributors over HTTP rescale TWO circuits atomically per
round; extracted keys prove+verify; the server recovers over a restart and
the recovered transcript re-verifies; forged/stale requests are rejected.
"""

import copy
import random

import pytest

from manta_tpu import fields
from manta_tpu.ceremony import coordinator as CO
from manta_tpu.ceremony import kzg as KZG
from manta_tpu.ceremony import phase2 as P2
from manta_tpu.ceremony import server as CS
from manta_tpu.models import circuit as CC
from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR

CFG = PR.BN254_PAIRING
SIZE = 8


def _circuit(constant: int):
    """x * y == z, plus a tweakable constant so the two circuits differ."""
    fr = fields.BN254_FR

    def build(com, known_xy=None):
        x = com.secret_witness(known_xy and known_xy[0])
        y = com.secret_witness(known_xy and known_xy[1])
        z = com.public_input(
            known_xy and known_xy[0] * known_xy[1] * constant % fr.modulus
        )
        cx = com.mul(x, com.constant(constant))
        com.assert_eq(com.mul(cx, y), z)

    com = CC.R1CS(fr, mode="setup")
    build(com)
    matrices, _ = com.finalize()
    return matrices, build


@pytest.fixture(scope="module")
def networked_ceremony(tmp_path_factory):
    recovery = str(tmp_path_factory.mktemp("ceremony"))
    acc = KZG.Accumulator.default(CFG, SIZE)
    KZG.contribute(acc, 11, 13, 17, nonce=31)

    circuits = {"mul2": _circuit(2), "mul3": _circuit(3)}
    initial = {
        name: P2.initialize(acc, mats) for name, (mats, _) in circuits.items()
    }

    registry = CO.Registry()
    keys = {}
    for ident in ("alice", "bob", "mallory"):
        sk, pk = CO.generate_keypair()
        keys[ident] = sk
        registry.register(ident, pk, priority=1 if ident == "alice" else 0)

    coordinator = CS.ParallelCoordinator(
        copy.deepcopy(initial), registry, recovery_dir=recovery
    )
    server = CS.CeremonyServer(coordinator).start()
    url = f"http://127.0.0.1:{server.port}"
    return {
        "initial": initial,
        "circuits": circuits,
        "registry": registry,
        "keys": keys,
        "coordinator": coordinator,
        "server": server,
        "url": url,
        "recovery": recovery,
    }


def test_two_contributors_over_http(networked_ceremony):
    env = networked_ceremony
    for ident, deltas in (("alice", {"mul2": 101, "mul3": 103}),
                          ("bob", {"mul2": 107, "mul3": 109})):
        client = CS.CeremonyClient(env["url"], ident, env["keys"][ident])
        assert client.status()["circuits"] == ["mul2", "mul3"]
        client.enqueue()
        for _ in range(4):  # poll until our turn
            reply = client.try_contribute(CFG, deltas, nonce=11)
            if reply.get("ok"):
                break
        assert reply["ok"], reply
    assert env["coordinator"].round == 2

    # extracted keys prove + verify on both circuits
    rng = random.Random(5)
    for name, (matrices, build) in env["circuits"].items():
        pk, vk = P2.extract_keys(env["coordinator"].states[name])
        xy = (rng.randrange(1, 2**30), rng.randrange(1, 2**30))
        com = CC.R1CS(fields.BN254_FR, mode="prove")
        build(com, xy)
        _, assignment = com.finalize()
        proof = G.prove(pk, matrices, assignment, backend="host")
        public = assignment[1 : matrices.num_instance]
        assert G.verify(vk, proof, public)
        assert not G.verify(vk, proof, [(public[0] + 1)])


def test_server_rejects_bad_requests(networked_ceremony):
    env = networked_ceremony
    import json
    import urllib.error
    import urllib.request

    def post(path, payload):
        req = urllib.request.Request(
            env["url"] + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    # unknown participant
    code, _ = post("/enqueue", {"id": "eve", "nonce": 99, "sig": "00"})
    assert code == 403
    # bad signature (mallory signs with someone else's key semantics)
    sig = CO.sign_message(env["keys"]["alice"], 999, b"/enqueue").hex()
    code, _ = post("/enqueue", {"id": "mallory", "nonce": 999, "sig": sig})
    assert code == 403
    # replayed nonce
    client = CS.CeremonyClient(
        env["url"], "mallory", env["keys"]["mallory"], start_nonce=5000
    )
    client.enqueue()
    sig = CO.sign_message(
        env["keys"]["mallory"], client.nonce, b"/enqueue"
    ).hex()
    code, _ = post(
        "/enqueue", {"id": "mallory", "nonce": client.nonce, "sig": sig}
    )
    assert code == 403


def test_recovery_over_restart_and_transcript(networked_ceremony):
    env = networked_ceremony
    env["server"].stop()
    recovered = CS.ParallelCoordinator.recover(env["recovery"], env["registry"])
    assert recovered.round == env["coordinator"].round
    # the full per-round transcript re-verifies from the initial states
    assert recovered.verify_full_transcript(env["initial"])
    # a recovered server keeps serving rounds
    server = CS.CeremonyServer(recovered).start()
    url = f"http://127.0.0.1:{server.port}"
    client = CS.CeremonyClient(
        url, "mallory", env["keys"]["mallory"], start_nonce=6000
    )
    client.enqueue()
    reply = client.try_contribute(CFG, {"mul2": 113, "mul3": 127}, nonce=13)
    assert reply.get("ok"), reply
    assert recovered.round == env["coordinator"].round + 1
    server.stop()


def test_wire_roundtrip(networked_ceremony):
    env = networked_ceremony
    for state in env["initial"].values():
        data = CS.state_to_bytes(state)
        back = CS.state_from_bytes(CFG, data)
        assert CS.state_to_bytes(back) == data
        assert back.a_query == state.a_query
        assert back.delta_g2 == state.delta_g2
