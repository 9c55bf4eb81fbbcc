"""Transfer validity circuits: ToPrivate, PrivateTransfer, ToPublic.

The COM-generic in-circuit twin of `manta_tpu.protocol.utxo`/`notes`/`keys`,
mirroring the reference's validity circuit
(`manta-accounting/src/transfer/mod.rs:889-983` build_validity_constraints +
`transfer/utxo/protocol.rs` well_formed_asset):

- embedded-curve (Baby Jubjub) gadgets: complete Edwards addition (7
  constraints), fixed-base scalar mul with precomputed native doublings
  (~5/bit), variable-base scalar mul (~16/bit);
- Poseidon gadgets (from `manta_tpu.models.circuit`);
- duplex note-encryption gadget (verifiable encryption of incoming notes);
- Merkle membership with value-zero escape hatch;
- the shape-level sum/asset-id equalities.

Circuit shapes (reference `transfer/canonical.rs:98-206`):
    ToPrivate        ⟨1 source, 0 senders, 1 receiver, 0 sinks⟩
    PrivateTransfer  ⟨0, 2, 2, 0⟩
    ToPublic         ⟨0, 2, 1, 1⟩

Public input allocation order is fixed per shape and reproduced by the
`*_public_inputs` helpers used by ledger-side verification.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from manta_tpu.models import circuit as CC
from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import merkle as MK
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import utxo as U

VALUE_BITS = 128


import contextlib


@contextlib.contextmanager
def _null():
    yield


# ---------------------------------------------------------------------------
# Edwards curve gadgets (a = 1 twisted Edwards over the constraint field)
# ---------------------------------------------------------------------------


def edwards_add(com, cfg: CFG.MantaPayConfig, p1, p2):
    """Complete Edwards addition; points are (x, y) wire pairs."""
    d = cfg.embedded.d
    x1, y1 = p1
    x2, y2 = p2
    m_xy = com.mul(x1, y2)
    m_yx = com.mul(y1, x2)
    m_xx = com.mul(x1, x2)
    m_yy = com.mul(y1, y2)
    t = com.mul(m_xx, m_yy)  # x1 x2 y1 y2
    dt = com.scale(t, d)
    one = com.constant(1)
    if isinstance(com, CC.Native):
        p = cfg.field.modulus
        x3 = (m_xy + m_yx) * pow(1 + dt, -1, p) % p
        y3 = (m_yy - m_xx) * pow(1 - dt, -1, p) % p
        return (x3, y3)
    # witnesses + division constraints
    pmod = cfg.field.modulus
    if com.mode == "prove":
        dt_v = com.eval_lc(dt)
        x3_v = (
            (com.eval_lc(m_xy) + com.eval_lc(m_yx))
            * pow(1 + dt_v, -1, pmod)
            % pmod
        )
        y3_v = (
            (com.eval_lc(m_yy) - com.eval_lc(m_xx))
            * pow(1 - dt_v, -1, pmod)
            % pmod
        )
    else:
        x3_v = y3_v = None
    x3 = com.secret_witness(x3_v)
    y3 = com.secret_witness(y3_v)
    com._enforce(com.add(one, dt), x3, com.add(m_xy, m_yx))
    com._enforce(com.sub(one, dt), y3, com.sub(m_yy, m_xx))
    return (x3, y3)


def edwards_add_const(com, cfg: CFG.MantaPayConfig, p_var, q_const):
    """Addition with a native constant point (3 constraints)."""
    if isinstance(com, CC.Native):
        return cfg.embedded.add(p_var, q_const)
    d = cfg.embedded.d
    x2, y2 = q_const
    x1, y1 = p_var
    # x1*y2, y1*x2, x1*x2, y1*y2 are scalings (free)
    m_xy = com.scale(x1, y2)
    m_yx = com.scale(y1, x2)
    m_xx = com.scale(x1, x2)
    m_yy = com.scale(y1, y2)
    t = com.mul(x1, y1)  # then scale by x2*y2
    p = cfg.field.modulus
    dt = com.scale(t, d * x2 % p * y2 % p)
    one = com.constant(1)
    if com.mode == "prove":
        dt_v = com.eval_lc(dt)
        x3_v = (
            (com.eval_lc(m_xy) + com.eval_lc(m_yx)) * pow(1 + dt_v, -1, p) % p
        )
        y3_v = (
            (com.eval_lc(m_yy) - com.eval_lc(m_xx)) * pow(1 - dt_v, -1, p) % p
        )
    else:
        x3_v = y3_v = None
    x3 = com.secret_witness(x3_v)
    y3 = com.secret_witness(y3_v)
    com._enforce(com.add(one, dt), x3, com.add(m_xy, m_yx))
    com._enforce(com.sub(one, dt), y3, com.sub(m_yy, m_xx))
    return (x3, y3)


def edwards_select(com, cond, p_true, p_false):
    return (
        CC.conditional_select(com, cond, p_true[0], p_false[0]),
        CC.conditional_select(com, cond, p_true[1], p_false[1]),
    )


def edwards_assert_on_curve(com, cfg: CFG.MantaPayConfig, pt):
    """a x^2 + y^2 = 1 + d x^2 y^2 (a = 1)."""
    x, y = pt
    x2 = com.mul(x, x)
    y2 = com.mul(y, y)
    x2y2 = com.mul(x2, y2)
    lhs = com.add(x2, y2)
    rhs = com.add(com.constant(1), com.scale(x2y2, cfg.embedded.d))
    com.assert_eq(lhs, rhs)


def scalar_bits(com, cfg: CFG.MantaPayConfig, scalar, value: Optional[int]):
    """Decompose a scalar wire into cfg.scalar_bits little-endian booleans."""
    return CC.to_bits_le(com, scalar, cfg.scalar_bits, value)


def edwards_scalar_mul_fixed(com, cfg: CFG.MantaPayConfig, bits, base):
    """[k]base with `base` a native constant point; doublings precomputed."""
    if isinstance(com, CC.Native):
        k = sum(b << i for i, b in enumerate(bits))
        return cfg.embedded.scalar_mul(k, base)
    acc = (com.constant(0), com.constant(1))  # identity
    addend = base
    for bit in bits:
        added = edwards_add_const(com, cfg, acc, addend)
        acc = edwards_select(com, bit, added, acc)
        addend = cfg.embedded.add(addend, addend)
    return acc


def edwards_scalar_mul_var(com, cfg: CFG.MantaPayConfig, bits, base):
    """[k]base with `base` a wire point (complete, branchless)."""
    if isinstance(com, CC.Native):
        k = sum(b << i for i, b in enumerate(bits))
        return cfg.embedded.scalar_mul(k, base)
    acc = (com.constant(0), com.constant(1))
    addend = base
    for i, bit in enumerate(bits):
        added = edwards_add(com, cfg, acc, addend)
        acc = edwards_select(com, bit, added, acc)
        if i + 1 < len(bits):
            addend = edwards_add(com, cfg, addend, addend)
    return acc


def is_zero_gadget(com, x, p: int):
    """Boolean wire b = (x == 0): b*x = 0 and b + x*inv = 1."""
    if isinstance(com, CC.Native):
        return 1 if com.value(x) == 0 else 0
    if com.mode == "prove":
        xv = com.eval_lc(x)
        b_v = 1 if xv == 0 else 0
        inv_v = 0 if xv == 0 else pow(xv, -1, p)
    else:
        b_v = inv_v = None
    b = com.secret_witness(b_v)
    inv = com.secret_witness(inv_v)
    com._enforce(b, x, com.constant(0))
    com._enforce(x, inv, com.sub(com.constant(1), b))
    return b


def bool_and(com, a, b):
    return com.mul(a, b)


def bool_or(com, a, b):
    # a + b - a*b
    return com.sub(com.add(a, b), com.mul(a, b))


def cond_select(com, b, t, f):
    """b ? t : f  =  f + b*(t - f) (1 constraint)."""
    if isinstance(com, CC.Native):
        return t if com.value(b) else f
    return com.add(f, com.mul(b, com.sub(t, f)))


# ---------------------------------------------------------------------------
# Scheme gadgets
# ---------------------------------------------------------------------------


def viewing_key_gadget(com, cfg: CFG.MantaPayConfig, pak):
    """VKDF: Poseidon2(pak.x, pak.y) — in-circuit the hash output is used as
    the scalar directly (unreduced), matching the reference's ScalarVar
    (`config/utxo.rs:552-561`); soundness holds because [x]G = [x mod r]G."""
    return CC.poseidon_hash(com, cfg.viewing_key_derivation, [pak[0], pak[1]])


def utxo_commitment_gadget(com, cfg, randomness, asset_id, asset_value, rk):
    return CC.poseidon_hash(
        com, cfg.utxo_commitment, [randomness, asset_id, asset_value, rk[0], rk[1]]
    )


def item_hash_gadget(com, cfg, is_transparent, public_id, public_value, commitment):
    return CC.poseidon_hash(
        com, cfg.item_hash, [is_transparent, public_id, public_value, commitment]
    )


def nullifier_gadget(com, cfg, pak, item):
    return CC.poseidon_hash(com, cfg.nullifier_commitment, [pak[0], pak[1], item])


def duplex_encrypt_gadget(com, cfg: CFG.MantaPayConfig, shared, block):
    """One-block Poseidon duplex (reference `poseidon/encryption.rs`):
    returns (tag, ciphertext_block[3])."""
    spec = cfg.incoming_permutation
    state = [com.constant(c) for c in cfg.incoming_initial_state]
    key_block = [shared[0], shared[1], com.constant(0)]
    for i in range(3):
        state[1 + i] = com.add(state[1 + i], key_block[i])
    state = CC.poseidon_permutation(com, spec, state)
    for i in range(3):
        state[1 + i] = com.add(state[1 + i], block[i])
    ciphertext = list(state[1:4])
    state = CC.poseidon_permutation(com, spec, state)
    return state[1], ciphertext


def merkle_membership_gadget(
    com, cfg: CFG.MantaPayConfig, item, index_bits, siblings, root
):
    """Computed root from item + path equals `root`? Returns equality bit."""
    node = item
    for bit, sib in zip(index_bits, siblings):
        left, right = CC.conditional_swap(com, bit, node, sib)
        node = CC.poseidon_hash(com, cfg.merkle_inner, [left, right])
    diff = com.sub(node, root)
    return is_zero_gadget(com, diff, cfg.field.modulus)


# ---------------------------------------------------------------------------
# Native-side bundles (the data the prover holds)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReceiverBundle:
    secret: U.MintSecret
    utxo: U.Utxo
    note: N.IncomingNote


@dataclasses.dataclass
class SenderBundle:
    secret: U.SpendSecret
    utxo: U.Utxo
    nullifier: int
    proof: MK.MembershipProof
    root: int
    # Spender-readable spent-asset record, posted next to the nullifier
    # (reference FullNullifier, `protocol.rs:2762`, `protocol.rs:1330`).
    outgoing_note: object = None


def make_receiver(
    cfg: CFG.MantaPayConfig, address, esk: int, randomness: int, asset: N.Asset
) -> ReceiverBundle:
    secret = U.MintSecret(
        receiving_key=address,
        ephemeral_secret_key=esk,
        plaintext=N.IncomingPlaintext(
            utxo_commitment_randomness=randomness, asset=asset
        ),
    )
    return ReceiverBundle(
        secret=secret, utxo=secret.utxo(cfg), note=secret.incoming_note(cfg)
    )


# ---------------------------------------------------------------------------
# Circuit pieces shared between shapes
# ---------------------------------------------------------------------------


def _alloc_value(com, value: Optional[int], bits: int, public: bool):
    v = com.public_input(value) if public else com.secret_witness(value)
    if not public:
        CC.to_bits_le(com, v, bits, value)
    return v


def _receiver_circuit(com, cfg: CFG.MantaPayConfig, b: Optional[ReceiverBundle]):
    """Mint well-formedness (reference `protocol.rs:2073-2098`
    MintSecret::well_formed_asset).

    Public: full utxo (is_transparent, public asset id/value, commitment)
    + note (epk.x, epk.y, tag, ct[0..3]) — reference Input order
    (`protocol.rs:1933-1937`). Secret: rk point, esk, randomness, asset
    (id, value). Asserts is_transparent == plaintext.asset.is_empty() and
    returns the representative asset wires
    select(is_transparent, public_asset, plaintext.asset).
    """
    # public utxo block: is_transparent, public asset, commitment
    transparent_pub = com.public_input(
        None if b is None else int(b.utxo.is_transparent)
    )
    if not isinstance(com, CC.Native):
        # booleanity: b*b = b
        com._enforce(transparent_pub, transparent_pub, transparent_pub)
    pub_id = com.public_input(None if b is None else b.utxo.public_asset.id)
    pub_value = _alloc_value(
        com,
        None if b is None else b.utxo.public_asset.value,
        VALUE_BITS if cfg.scalar_bits >= 128 else cfg.scalar_bits,
        public=True,
    )
    commitment_pub = com.public_input(None if b is None else b.utxo.commitment)
    epk_pub = (
        com.public_input(None if b is None else b.note.ephemeral_public_key[0]),
        com.public_input(None if b is None else b.note.ephemeral_public_key[1]),
    )
    tag_pub = com.public_input(None if b is None else b.note.tag)
    ct_pub = [
        com.public_input(None if b is None else b.note.ciphertext[i])
        for i in range(3)
    ]
    # secret
    rk = (
        com.secret_witness(None if b is None else b.secret.receiving_key[0]),
        com.secret_witness(None if b is None else b.secret.receiving_key[1]),
    )
    edwards_assert_on_curve(com, cfg, rk)
    esk = com.secret_witness(
        None if b is None else b.secret.ephemeral_secret_key
    )
    randomness = com.secret_witness(
        None
        if b is None
        else b.secret.plaintext.utxo_commitment_randomness
    )
    asset_id = com.secret_witness(
        None if b is None else b.secret.plaintext.asset.id
    )
    asset_value = _alloc_value(
        com,
        None if b is None else b.secret.plaintext.asset.value,
        VALUE_BITS if cfg.scalar_bits >= 128 else cfg.scalar_bits,
        public=False,
    )
    # commitment
    com.assert_eq(
        utxo_commitment_gadget(com, cfg, randomness, asset_id, asset_value, rk),
        commitment_pub,
    )
    # note: epk = [esk]G; shared = [esk]rk; duplex
    esk_bits = scalar_bits(
        com, cfg, esk, None if b is None else b.secret.ephemeral_secret_key
    )
    epk = edwards_scalar_mul_fixed(com, cfg, esk_bits, cfg.group_generator)
    com.assert_eq(epk[0], epk_pub[0])
    com.assert_eq(epk[1], epk_pub[1])
    shared = edwards_scalar_mul_var(com, cfg, esk_bits, rk)
    tag, ct = duplex_encrypt_gadget(
        com, cfg, shared, [randomness, asset_id, asset_value]
    )
    com.assert_eq(tag, tag_pub)
    for i in range(3):
        com.assert_eq(ct[i], ct_pub[i])
    # transparency: is_transparent == plaintext.asset.is_empty(); the
    # representative asset is select(is_transparent, public, secret)
    id_zero = is_zero_gadget(com, asset_id, cfg.field.modulus)
    value_zero = is_zero_gadget(com, asset_value, cfg.field.modulus)
    com.assert_eq(bool_and(com, id_zero, value_zero), transparent_pub)
    sel_id = cond_select(com, transparent_pub, pub_id, asset_id)
    sel_value = cond_select(com, transparent_pub, pub_value, asset_value)
    return sel_id, sel_value


def _sender_circuit(
    com, cfg: CFG.MantaPayConfig, pak, b: Optional[SenderBundle]
):
    """Spend well-formedness. Public: root, nullifier. Secret: plaintext,
    membership path. `pak` is the (secret) proof authorization key wires.
    Returns (asset_id, asset_value) wires."""
    root_pub = com.public_input(None if b is None else b.root)
    nullifier_pub = com.public_input(None if b is None else b.nullifier)
    randomness = com.secret_witness(
        None if b is None else b.secret.plaintext.utxo_commitment_randomness
    )
    asset_id = com.secret_witness(
        None if b is None else b.secret.plaintext.asset.id
    )
    asset_value = _alloc_value(
        com,
        None if b is None else b.secret.plaintext.asset.value,
        VALUE_BITS if cfg.scalar_bits >= 128 else cfg.scalar_bits,
        public=False,
    )
    # derive rk from pak: vk = VKDF(pak); rk = [vk]G. The viewing key is a
    # full-width hash output, so its decomposition always uses the full field
    # bit width regardless of cfg.scalar_bits. Full-width decompositions are
    # enforced canonical (< p) by `models/circuit.py` `to_bits_le`, matching
    # ark-r1cs-std FpVar::to_bits_le.
    vk = viewing_key_gadget(com, cfg, pak)
    vk_bits = CC.to_bits_le(com, vk, cfg.field.bits)
    rk = edwards_scalar_mul_fixed(com, cfg, vk_bits, cfg.group_generator)
    commitment = utxo_commitment_gadget(
        com, cfg, randomness, asset_id, asset_value, rk
    )
    # spent utxo transparency (secret wires; reference
    # `protocol.rs:2578-2618` SpendSecret::well_formed_asset):
    # is_transparent == plaintext.asset.is_empty(), representative asset =
    # select(is_transparent, public_asset, plaintext.asset)
    transparent = com.secret_witness(
        None if b is None else int(b.utxo.is_transparent)
    )
    com._enforce(transparent, transparent, transparent)  # booleanity
    pub_id = com.secret_witness(
        None if b is None else b.utxo.public_asset.id
    )
    pub_value = _alloc_value(
        com,
        None if b is None else b.utxo.public_asset.value,
        VALUE_BITS if cfg.scalar_bits >= 128 else cfg.scalar_bits,
        public=False,
    )
    id_zero = is_zero_gadget(com, asset_id, cfg.field.modulus)
    plain_value_zero = is_zero_gadget(com, asset_value, cfg.field.modulus)
    com.assert_eq(bool_and(com, id_zero, plain_value_zero), transparent)
    sel_id = cond_select(com, transparent, pub_id, asset_id)
    sel_value = cond_select(com, transparent, pub_value, asset_value)
    item = item_hash_gadget(com, cfg, transparent, pub_id, pub_value, commitment)
    # membership OR zero value
    path_len = cfg.merkle_height - 1
    index_bits = [
        CC.boolean(
            com,
            None if b is None else (b.proof.index >> level) & 1,
        )
        for level in range(path_len)
    ]
    siblings = [
        com.secret_witness(None if b is None else b.proof.siblings[level])
        for level in range(path_len)
    ]
    member = merkle_membership_gadget(
        com, cfg, item, index_bits, siblings, root_pub
    )
    value_zero = is_zero_gadget(com, sel_value, cfg.field.modulus)
    ok = bool_or(com, value_zero, member)
    com.assert_eq(ok, com.constant(1))
    # nullifier
    com.assert_eq(nullifier_gadget(com, cfg, pak, item), nullifier_pub)
    return sel_id, sel_value


def _authorization_circuit(com, cfg: CFG.MantaPayConfig, auth: Optional[K.Authorization]):
    """Allocate pak (secret), rho (secret), rpak (public); assert
    [rho]pak == rpak. Returns pak wires."""
    rpak_pub = (
        com.public_input(
            None if auth is None else auth.proof.randomized_proof_authorization_key[0]
        ),
        com.public_input(
            None if auth is None else auth.proof.randomized_proof_authorization_key[1]
        ),
    )
    pak = (
        com.secret_witness(
            None if auth is None else auth.context.proof_authorization_key[0]
        ),
        com.secret_witness(
            None if auth is None else auth.context.proof_authorization_key[1]
        ),
    )
    edwards_assert_on_curve(com, cfg, pak)
    rho = com.secret_witness(None if auth is None else auth.proof.randomness)
    rho_bits = scalar_bits(
        com, cfg, rho, None if auth is None else auth.proof.randomness
    )
    rpak = edwards_scalar_mul_var(com, cfg, rho_bits, pak)
    com.assert_eq(rpak[0], rpak_pub[0])
    com.assert_eq(rpak[1], rpak_pub[1])
    return pak


# ---------------------------------------------------------------------------
# Shape circuits
# ---------------------------------------------------------------------------


def to_private_circuit(com, cfg: CFG.MantaPayConfig, data: Optional[dict] = None):
    """⟨1,0,1,0⟩: public asset id + source value fund one private UTXO.

    Public input order: [asset_id, source_value, receiver public block].
    """
    d = data or {}
    asset_id_pub = com.public_input(d.get("asset_id"))
    source_value_pub = com.public_input(d.get("source_value"))
    r_id, r_value = _receiver_circuit(com, cfg, d.get("receiver"))
    com.assert_eq(r_id, asset_id_pub)
    com.assert_eq(r_value, source_value_pub)


def private_transfer_circuit(
    com, cfg: CFG.MantaPayConfig, data: Optional[dict] = None
):
    """⟨0,2,2,0⟩: 2 private inputs -> 2 private outputs.

    Public input order: [rpak, sender0(root, nullifier), sender1(...),
    receiver0 block, receiver1 block].
    """
    d = data or {}
    with com.instrument("authorization") if hasattr(com, "instrument") else _null():
        pak = _authorization_circuit(com, cfg, d.get("authorization"))
    senders = d.get("senders", [None, None])
    receivers = d.get("receivers", [None, None])
    s_assets = []
    for i, s in enumerate(senders):
        with com.instrument(f"sender{i}") if hasattr(com, "instrument") else _null():
            s_assets.append(_sender_circuit(com, cfg, pak, s))
    r_assets = []
    for i, r in enumerate(receivers):
        with com.instrument(f"receiver{i}") if hasattr(com, "instrument") else _null():
            r_assets.append(_receiver_circuit(com, cfg, r))
    # all asset ids equal
    CC.assert_all_eq(
        com, [s_assets[0][0], s_assets[1][0], r_assets[0][0], r_assets[1][0]]
    )
    # value conservation
    lhs = com.add(s_assets[0][1], s_assets[1][1])
    rhs = com.add(r_assets[0][1], r_assets[1][1])
    com.assert_eq(lhs, rhs)


def to_public_circuit(com, cfg: CFG.MantaPayConfig, data: Optional[dict] = None):
    """⟨0,2,1,1⟩: 2 private inputs -> 1 private output + public sink.

    Public input order: [asset_id, sink_value, rpak, senders, receiver].
    """
    d = data or {}
    asset_id_pub = com.public_input(d.get("asset_id"))
    sink_value_pub = com.public_input(d.get("sink_value"))
    pak = _authorization_circuit(com, cfg, d.get("authorization"))
    senders = d.get("senders", [None, None])
    s_assets = [_sender_circuit(com, cfg, pak, s) for s in senders]
    r_id, r_value = _receiver_circuit(com, cfg, d.get("receiver"))
    CC.assert_all_eq(com, [s_assets[0][0], s_assets[1][0], r_id, asset_id_pub])
    lhs = com.add(s_assets[0][1], s_assets[1][1])
    rhs = com.add(r_value, sink_value_pub)
    com.assert_eq(lhs, rhs)


SHAPES = {
    "to_private": to_private_circuit,
    "private_transfer": private_transfer_circuit,
    "to_public": to_public_circuit,
}


def receiver_public_inputs(b: ReceiverBundle) -> List[int]:
    """Receiver public block in circuit order: full utxo then note
    (reference Input order, `protocol.rs:1933-1937`)."""
    return [
        int(b.utxo.is_transparent),
        b.utxo.public_asset.id,
        b.utxo.public_asset.value,
        b.utxo.commitment,
        b.note.ephemeral_public_key[0],
        b.note.ephemeral_public_key[1],
        b.note.tag,
        *b.note.ciphertext,
    ]


def sender_public_inputs(b: SenderBundle) -> List[int]:
    return [b.root, b.nullifier]


def public_inputs(shape: str, data: dict) -> List[int]:
    """The public-input vector in circuit allocation order."""
    if shape == "to_private":
        return [
            data["asset_id"],
            data["source_value"],
            *receiver_public_inputs(data["receiver"]),
        ]
    if shape == "private_transfer":
        auth = data["authorization"]
        out = list(auth.proof.randomized_proof_authorization_key)
        for s in data["senders"]:
            out += sender_public_inputs(s)
        for r in data["receivers"]:
            out += receiver_public_inputs(r)
        return out
    if shape == "to_public":
        auth = data["authorization"]
        out = [data["asset_id"], data["sink_value"]]
        out += list(auth.proof.randomized_proof_authorization_key)
        for s in data["senders"]:
            out += sender_public_inputs(s)
        out += receiver_public_inputs(data["receiver"])
        return out
    raise ValueError(shape)
