"""Port of the reference's integration spec test `tests/plonk_api.rs`
(/root/reference/halo2_proofs/tests/plonk_api.rs:1-514 — the file is
block-commented upstream but remains the most complete e2e specification of
the intended API: standard PLONK with a combined add-mult gate, a public
input gate, a lookup, copy constraints, batch proving over two circuit
instances, single + batch verification, and vk serialization round-trip).

The circuit, column allocation ORDER, gate expressions, witness layout and
flow are ported 1:1; the resulting vk pinned-string hash and the proof
length are pinned as fixtures below so any change to the CS/transcript
encoding trips this test (VERDICT r2 "Next round" #4).
"""

import hashlib

import pytest

from halo2_tpu.fields.bn254 import FR_ZETA, Fr
from halo2_tpu.plonk import Circuit
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof_multi
from halo2_tpu.plonk.verifier import verify_proof_multi
from halo2_tpu.poly.commitment import Params

P = Fr.p
K = 5
PUBLIC_INPUTS_SIZE = 1

# fixtures: SHA-256 of the pinned vk debug string, and the GWC proof length
# for the 2-circuit batch proof.  Regenerate CONSCIOUSLY (they pin the
# consensus-critical CS/vk encoding): set UPDATE_PLONK_API_FIXTURES=1 and
# copy the printed values.
PINNED_VK_SHA256 = "6df47d7cb6ef4554acc9c7c0a1488e2182e692198f31df32b565a57cc22bb94f"
PROOF_LEN_GWC = 3520


class PlonkConfig:
    def __init__(self, a, b, c, d, e, sa, sb, sc, sm, sp, sl):
        self.a, self.b, self.c, self.d, self.e = a, b, c, d, e
        self.sa, self.sb, self.sc, self.sm, self.sp = sa, sb, sc, sm, sp
        self.sl = sl


class StandardPlonk:
    """The StandardCs helper chip (plonk_api.rs:56-253)."""

    def __init__(self, config):
        self.config = config

    def raw_multiply(self, layouter, a, b, c):
        cfg = self.config

        def fn(region):
            lhs = region.assign_advice("lhs", cfg.a, 0, a)
            region.assign_advice("lhs^4", cfg.d, 0,
                                 None if a is None else pow(a, 4, P))
            rhs = region.assign_advice("rhs", cfg.b, 0, b)
            region.assign_advice("rhs^4", cfg.e, 0,
                                 None if b is None else pow(b, 4, P))
            out = region.assign_advice("out", cfg.c, 0, c)
            region.assign_fixed("a", cfg.sa, 0, 0)
            region.assign_fixed("b", cfg.sb, 0, 0)
            region.assign_fixed("c", cfg.sc, 0, 1)
            region.assign_fixed("a * b", cfg.sm, 0, 1)
            return lhs.cell, rhs.cell, out.cell
        return layouter.assign_region("raw_multiply", fn)

    def raw_add(self, layouter, a, b, c):
        cfg = self.config

        def fn(region):
            lhs = region.assign_advice("lhs", cfg.a, 0, a)
            region.assign_advice("lhs^4", cfg.d, 0,
                                 None if a is None else pow(a, 4, P))
            rhs = region.assign_advice("rhs", cfg.b, 0, b)
            region.assign_advice("rhs^4", cfg.e, 0,
                                 None if b is None else pow(b, 4, P))
            out = region.assign_advice("out", cfg.c, 0, c)
            region.assign_fixed("a", cfg.sa, 0, 1)
            region.assign_fixed("b", cfg.sb, 0, 1)
            region.assign_fixed("c", cfg.sc, 0, 1)
            region.assign_fixed("a * b", cfg.sm, 0, 0)
            return lhs.cell, rhs.cell, out.cell
        return layouter.assign_region("raw_add", fn)

    def copy(self, layouter, left, right):
        def fn(region):
            region.constrain_equal(left, right)
            region.constrain_equal(left, right)
        layouter.assign_region("copy", fn)

    def public_input(self, layouter, value):
        cfg = self.config

        def fn(region):
            cell = region.assign_advice("value", cfg.a, 0, value)
            region.assign_fixed("public", cfg.sp, 0, 1)
            return cell.cell
        return layouter.assign_region("public_input", fn)

    def lookup_table(self, layouter, values):
        cfg = self.config

        def fn(region):
            for index, value in enumerate(values):
                region.assign_fixed("table col", cfg.sl.inner, index, value)
        layouter.assign_table("", fn)


class MyCircuit(Circuit):
    def __init__(self, a, lookup_table):
        self.a = a
        self.lookup_table = lookup_table

    def without_witnesses(self):
        return MyCircuit(None, list(self.lookup_table))

    def configure(self, meta):
        # column allocation order is consensus-critical (it shapes the
        # pinned vk): e, a, b advice; sf fixed; c, d advice; p instance
        # (plonk_api.rs:467-480)
        e = meta.advice_column()
        a = meta.advice_column()
        b = meta.advice_column()
        sf = meta.fixed_column()
        c = meta.advice_column()
        d = meta.advice_column()
        p = meta.instance_column()

        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(c)

        sm = meta.fixed_column()
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()
        sp = meta.fixed_column()
        sl = meta.table_column()

        meta.lookup("lookup", lambda m: [(m.query_advice(a, 0), sl)])

        def combined_gate(m):
            d_n = m.query_advice(d, 1)      # Rotation::next
            a_c = m.query_advice(a, 0)
            sf_c = m.query_fixed(sf, 0)
            e_p = m.query_advice(e, -1)     # Rotation::prev
            b_c = m.query_advice(b, 0)
            c_c = m.query_advice(c, 0)
            sa_c = m.query_fixed(sa, 0)
            sb_c = m.query_fixed(sb, 0)
            sc_c = m.query_fixed(sc, 0)
            sm_c = m.query_fixed(sm, 0)
            return [("", a_c * sa_c + b_c * sb_c + a_c * b_c * sm_c
                     - (c_c * sc_c) + sf_c * (d_n * e_p))]

        meta.create_gate("Combined add-mult", combined_gate)

        def public_gate(m):
            a_c = m.query_advice(a, 0)
            p_c = m.query_instance(p, 0)
            sp_c = m.query_fixed(sp, 0)
            return [("", sp_c * (a_c - p_c))]

        meta.create_gate("Public input", public_gate)

        for col in (sf, e, d, p, sm, sa, sb, sc, sp):
            meta.enable_equality(col)

        return PlonkConfig(a, b, c, d, e, sa, sb, sc, sm, sp, sl)

    def synthesize(self, config, layouter):
        cs = StandardPlonk(config)
        a = self.a

        cs.public_input(layouter, 2)

        a_sq = None if a is None else a * a % P
        fin = None if a is None else (a + a_sq) % P
        for _ in range(10):
            a0, _, c0 = cs.raw_multiply(layouter, a, a, a_sq)
            a1, b1, _ = cs.raw_add(layouter, a, a_sq, fin)
            cs.copy(layouter, a0, a1)
            cs.copy(layouter, b1, c0)

        cs.lookup_table(layouter, self.lookup_table)


A_VALUE = 2834758237 * FR_ZETA % P
INSTANCE = 2
LOOKUP_TABLE = [INSTANCE, A_VALUE, A_VALUE, 0]


@pytest.fixture(scope="module")
def setup():
    params = Params.unsafe_setup(K, seed=42)
    empty = MyCircuit(None, LOOKUP_TABLE)
    vk, pk = keygen(params, empty)
    return params, vk, pk


def test_not_enough_rows(setup):
    """keygen with too-small k fails (plonk_api.rs:407-427
    NotEnoughRowsAvailable; here a ValueError)."""
    empty = MyCircuit(None, LOOKUP_TABLE)
    for small_k in (1, K - 1):
        small_params = Params.unsafe_setup(small_k, seed=42)
        with pytest.raises(ValueError):
            keygen(small_params, empty)


def test_mock_satisfied():
    from halo2_tpu.dev import MockProver
    MockProver.run(K, MyCircuit(A_VALUE, LOOKUP_TABLE),
                   [[INSTANCE]]).assert_satisfied()


def test_pinned_vk_fixture(setup):
    """The pinned vk string is stable — any CS/encoding change trips this
    (the analogue of checking proof bytes against the Rust side; the Rust
    toolchain is absent from this image, so the fixture pins OUR rendering
    of the reference format — format-mirrored, unverified vs Rust)."""
    _, vk, _ = setup
    pinned = vk.pinned()
    digest = hashlib.sha256(pinned.encode()).hexdigest()
    import os
    if os.environ.get("UPDATE_PLONK_API_FIXTURES"):
        print(f"\nPINNED_VK_SHA256 = \"{digest}\"")
    assert digest == PINNED_VK_SHA256, (
        f"pinned vk changed: sha256 {digest}\n--- first 2000 chars ---\n"
        f"{pinned[:2000]}")


def _prove(params, pk, use_gwc, seed=0):
    circuits = [MyCircuit(A_VALUE, LOOKUP_TABLE),
                MyCircuit(A_VALUE, LOOKUP_TABLE)]
    instances = [[[INSTANCE]], [[INSTANCE]]]
    return create_proof_multi(params, pk, circuits, instances, seed=seed,
                              use_gwc=use_gwc), instances


def test_proof_gwc_single_and_batch(setup):
    """create_proof over TWO circuit instances; single- and batch-verifier
    strategies; vk serialization round-trip between the two batch proofs
    (plonk_api.rs:437-512)."""
    import os
    import tempfile

    from halo2_tpu.io.serialization import load_vk, save_vk
    from halo2_tpu.multiopen import BatchVerifier

    params, vk, pk = setup
    proof, instances = _prove(params, pk, use_gwc=True)
    if os.environ.get("UPDATE_PLONK_API_FIXTURES"):
        print(f"\nPROOF_LEN_GWC = {len(proof)}")
    assert len(proof) == PROOF_LEN_GWC, f"GWC proof length {len(proof)}"
    pv = params.verifier(PUBLIC_INPUTS_SIZE)

    # single-verifier strategy
    assert verify_proof_multi(pv, vk, instances, proof)

    # batch-verifier strategy, with a vk write/read round-trip in between
    batch = BatchVerifier(seed=5)
    verify_proof_multi(pv, vk, instances, proof, strategy=batch)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "vk.bin")
        save_vk(vk, path)
        vk2 = load_vk(params, MyCircuit(None, LOOKUP_TABLE), path)
    verify_proof_multi(pv, vk2, instances, proof, strategy=batch)
    assert batch.finalize(pv)

    # wrong public input must fail
    bad = [[[INSTANCE + 1]], [[INSTANCE]]]
    assert not verify_proof_multi(pv, vk, bad, proof)


def test_proof_shplonk(setup):
    """The same batch proof under the SHPLONK multiopen."""
    params, vk, pk = setup
    proof, instances = _prove(params, pk, use_gwc=False)
    pv = params.verifier(PUBLIC_INPUTS_SIZE)
    assert verify_proof_multi(pv, vk, instances, proof, use_gwc=False)
    bad = [[[INSTANCE]], [[INSTANCE + 1]]]
    assert not verify_proof_multi(pv, vk, bad, proof, use_gwc=False)


def test_proof_determinism(setup):
    """Seeded blinding makes proofs reproducible (the reference's 10x loop
    re-proves with OsRng; with an injectable rng we can assert bytes)."""
    params, vk, pk = setup
    p1, _ = _prove(params, pk, use_gwc=True, seed=3)
    p2, _ = _prove(params, pk, use_gwc=True, seed=3)
    assert p1 == p2
