"""Known-answer tests for the consensus-critical vk pinning and the Params
wire format (VERDICT r3 "Next round" #3).

Pattern as in test_transcript.test_known_answer_challenge_sequence: each
check re-derives the byte/string format from FIRST PRINCIPLES — an
independent in-test implementation written line-by-line from the reference
Rust source — and diffs it against the repo's production renderer, so any
drift in either implementation trips the test without the two sharing code.

Covered here:
  * PinnedVerificationKey Debug string (plonk.rs:111-133, 210-216 struct
    order; plonk/circuit.rs:1136-1245 PinnedConstraintSystem custom
    to_string + PinnedGates/PinnedLookups/PinnedShuffles; Rust std
    derive(Debug) non-alternate formatting for every nested type)
  * vk hash_into (plonk.rs:91-109: blake2b-512 personal "Halo2-Verify-Key"
    over u64-le(len) || pinned string, reduced from 64 LE bytes)
  * Params::write byte stream (poly/commitment.rs:241-252: u32-le k,
    compressed g points, compressed g_lagrange points, u32-le extra len,
    s_g2 bytes) with an independent point compressor.

The external pairing_bn256 Debug impls (field elements as 0x + 64 lowercase
hex of the canonical value; affine points as "(x, y)"; identity as
"Infinity") cannot be machine-diffed here (no Rust toolchain in the image);
they are pinned as documented assumptions shared by both implementations.
"""

import hashlib
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

from halo2_tpu.curves import host
from halo2_tpu.fields.bn254 import Fq, Fr
from halo2_tpu.plonk import circuit as cir
from halo2_tpu.plonk.keygen import VerifyingKey, rebuild_cs
from halo2_tpu.poly.domain import EvaluationDomain

P = Fr.p


# --------------------------------------------------------------------------
# Independent Rust Debug renderer: std fmt non-alternate semantics
# (struct -> `Name { f: v, g: w }`, tuple struct -> `Name(a, b)`,
#  tuple -> `(a, b)`, Vec/slice -> `[a, b]`, Option -> None/Some(v),
#  bool -> true/false, &str/String -> quoted)
# --------------------------------------------------------------------------

def R_struct(name, *fields):
    if not fields:
        return name
    return name + " { " + ", ".join(f"{f}: {v}" for f, v in fields) + " }"


def R_tuplestruct(name, *items):
    return name + "(" + ", ".join(items) + ")"


def R_tuple(*items):
    return "(" + ", ".join(items) + ")"


def R_vec(items):
    return "[" + ", ".join(items) + "]"


def R_opt(v):
    return "None" if v is None else f"Some({v})"


def R_bool(b):
    return "true" if b else "false"


def R_str(s):
    return '"' + s + '"'      # pinned strings contain no escapes


def R_fel(v):                 # pairing_bn256 field Debug (assumption above)
    return f"0x{v:064x}"


def R_point(pt):              # pairing_bn256 affine Debug (assumption above)
    return "Infinity" if pt is None else R_tuple(R_fel(pt[0]), R_fel(pt[1]))


# -- type-specific renderers, one per reference declaration ---------------

def R_column(col):
    # Column<C> { index: usize, column_type: C } (circuit.rs:47-57);
    # Any/Advice/Fixed/Instance are fieldless structs/variants -> bare name
    return R_struct("Column", ("index", str(col.index)),
                    ("column_type", col.ctype.capitalize()))


def R_rotation(r):
    return R_tuplestruct("Rotation", str(int(r)))   # poly.rs Rotation(i32)


def R_expr(e):
    # Expression<F> enum, circuit.rs:453-494 — derived Debug: struct
    # variants for the three queries, tuple variants for the rest
    if isinstance(e, cir.Constant):
        return R_tuplestruct("Constant", R_fel(e.value))
    if isinstance(e, cir.SelectorExpr):
        # Selector(usize, bool) tuple struct inside tuple variant
        s = e.selector
        return R_tuplestruct("Selector", R_tuplestruct(
            "Selector", str(s.index), R_bool(s.is_simple)))
    for klass, name in ((cir.FixedQuery, "Fixed"), (cir.AdviceQuery, "Advice"),
                        (cir.InstanceQuery, "Instance")):
        if isinstance(e, klass):
            return R_struct(name, ("query_index", str(e.query_index)),
                            ("column_index", str(e.column_index)),
                            ("rotation", R_rotation(e.rotation)))
    if isinstance(e, cir.Negated):
        return R_tuplestruct("Negated", R_expr(e.expr))
    if isinstance(e, cir.Sum):
        return R_tuplestruct("Sum", R_expr(e.a), R_expr(e.b))
    if isinstance(e, cir.Product):
        return R_tuplestruct("Product", R_expr(e.a), R_expr(e.b))
    if isinstance(e, cir.Scaled):
        return R_tuplestruct("Scaled", R_expr(e.expr), R_fel(e.scalar))
    raise TypeError(type(e))


def R_queries(qs):
    return R_vec(R_tuple(R_column(c), R_rotation(r)) for c, r in qs)


def independent_pinned_cs(cs):
    """PinnedConstraintSystem::to_string, circuit.rs:1155-1181: `write!`
    with `field:{value},` — NO spaces, trailing comma after every field
    except minimum_degree; gates/lookups/shuffles via the Pinned* wrappers
    (circuit.rs:1185-1245) which emit `entry,` with trailing commas."""
    parts = ["PinnedConstraintSystem{"]
    parts.append(f"num_fixed_columns:{cs.num_fixed_columns},")
    parts.append(f"num_advice_columns:{cs.num_advice_columns},")
    parts.append(f"num_instance_columns:{cs.num_instance_columns},")
    parts.append(f"num_selectors:{cs.num_selectors},")
    parts.append("selector_map:"
                 + R_vec(R_column(c) for c in cs.selector_map) + ",")
    # PinnedGates (circuit.rs:1230-1245): every gate polynomial, `{:?},`
    gates = "[" + "".join(R_expr(p) + "," for g in cs.gates
                          for p in g.polys) + "]"
    parts.append(f"gates:{gates},")
    parts.append("advice_queries:" + R_queries(cs.advice_queries) + ",")
    parts.append("instance_queries:" + R_queries(cs.instance_queries) + ",")
    parts.append("fixed_queries:" + R_queries(cs.fixed_queries) + ",")
    # permutation::Argument { columns: Vec<Column<Any>> } derived Debug
    parts.append("permutation:" + R_struct(
        "Argument", ("columns",
                     R_vec(R_column(c) for c in cs.permutation.columns)))
        + ",")
    # PinnedLookups (circuit.rs:1185-1204): `(lookup{i},{sets:?},{tables:?}),`
    lk = "["
    for i, arg in enumerate(cs.lookups):
        sets = R_vec(
            R_tuplestruct("InputExpressionSet", R_vec(
                R_vec(R_expr(e) for e in input_exprs)
                for input_exprs in s))
            for s in arg.input_expressions_sets)
        tables = R_vec(R_expr(e) for e in arg.table_expressions)
        lk += f"(lookup{i},{sets},{tables}),"
    lk += "]"
    parts.append(f"lookups:{lk},")
    # PinnedShuffles (circuit.rs:1207-1227): `(shuffle{i}-{j},{ins:?},{shs:?}),`
    sh = "["
    for i, group in enumerate(cs.shuffles):
        for j, unit in enumerate(group.units):
            ins = R_vec(R_expr(e) for e in unit.input_expressions)
            shs = R_vec(R_expr(e) for e in unit.shuffle_expressions)
            sh += f"(shuffle{i}-{j},{ins},{shs}),"
    sh += "]"
    parts.append(f"shuffles:{sh},")
    parts.append("constants:" + R_vec(R_column(c) for c in cs.constants)
                 + ",")
    md = cs.minimum_degree
    parts.append("minimum_degree:" + R_opt(None if md is None else str(md)))
    parts.append("}")
    return "".join(parts)


def independent_pinned_vk(vk):
    """format!("{:?}", vk.pinned()): derived Debug of PinnedVerificationKey
    in declaration order (plonk.rs:210-216), with cs as a quoted String
    (plonk.rs:121 builds it via to_string) and MODULUS constants rendered
    as the crate's 0x-hex string constants."""
    return R_struct(
        "PinnedVerificationKey",
        ("base_modulus", R_str(R_fel(Fq.p))),
        ("scalar_modulus", R_str(R_fel(Fr.p))),
        ("domain", R_struct("PinnedEvaluationDomain",
                            ("k", str(vk.domain.k)),
                            ("extended_k", str(vk.domain.extended_k)),
                            ("omega", R_fel(vk.domain.omega)))),
        ("cs", R_str(independent_pinned_cs(vk.cs))),
        ("fixed_commitments", R_vec(R_point(p)
                                    for p in vk.fixed_commitments)),
        ("permutation", R_struct("VerifyingKey", (
            "commitments",
            R_vec(R_point(p) for p in vk.permutation.commitments)))),
    )


# --------------------------------------------------------------------------
# vk construction WITHOUT device keygen: the pinned string depends only on
# the CS structure and the commitment point values, so deterministic fake
# host points stand in for the real MSM outputs (pure-host, milliseconds)
# --------------------------------------------------------------------------

class _FakePermVk:
    def __init__(self, commitments):
        self.commitments = commitments


def _fake_points(count, start=1):
    pts, p = [], host.G1_GEN
    out = []
    for i in range(count + start - 1):
        if i >= start - 1:
            out.append(p)
        p = host.add(p, host.G1_GEN)
    return out[:count]


def _vk_for(circuit_cls, k, floor_planner=None, identity_at=None):
    cs, _, degree = rebuild_cs(circuit_cls, 1 << k,
                               floor_planner=floor_planner)
    dom = EvaluationDomain(degree, k)
    fixed = _fake_points(cs.num_fixed_columns)
    if identity_at is not None and fixed:
        fixed[identity_at] = None           # exercise the Infinity branch
    perm = _FakePermVk(_fake_points(len(cs.permutation.columns), start=50))
    return VerifyingKey(dom, cs, fixed, perm, k)


@pytest.fixture(scope="module")
def allargs_vk():
    from bench_all_args import AllArgsCircuit
    from halo2_tpu.circuit import FlatFloorPlanner
    from halo2_tpu.plonk.circuit import ConstraintSystem
    k = 9
    probe = ConstraintSystem()
    AllArgsCircuit(1).configure(probe)
    rows = probe.usable_rows(1 << k)
    return _vk_for(AllArgsCircuit(rows), k, floor_planner=FlatFloorPlanner)


@pytest.fixture(scope="module")
def plonkapi_vk():
    from tests.test_plonk_api import LOOKUP_TABLE, MyCircuit
    return _vk_for(MyCircuit(None, LOOKUP_TABLE), 5, identity_at=0)


def test_pinned_vk_kat_all_args(allargs_vk):
    assert independent_pinned_vk(allargs_vk) == allargs_vk.pinned()


def test_pinned_vk_kat_plonk_api(plonkapi_vk):
    assert independent_pinned_vk(plonkapi_vk) == plonkapi_vk.pinned()


def test_vk_hash_into_kat(allargs_vk):
    """plonk.rs:91-109 re-derived: blake2b-512 personal Halo2-Verify-Key
    over u64le(len)||pinned, 64-byte digest reduced LE mod r, absorbed as a
    common scalar (prefix 0x02 per transcript.rs:15-21)."""
    from halo2_tpu.transcript import Blake2bWrite

    s = independent_pinned_vk(allargs_vk).encode()
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
    h.update(len(s).to_bytes(8, "little"))
    h.update(s)
    expected_scalar = int.from_bytes(h.digest(), "little") % P

    t1 = Blake2bWrite()
    allargs_vk.hash_into(t1)
    t2 = Blake2bWrite()
    t2.common_scalar(expected_scalar)
    assert t1.squeeze_challenge() == t2.squeeze_challenge()


# --------------------------------------------------------------------------
# Params::write wire format (poly/commitment.rs:241-252)
# --------------------------------------------------------------------------

def _compress_point_independent(pt):
    """pairing_bn256 compressed to_bytes: 32-byte LE x with the y parity
    bit in the top bit of byte 31; identity encodes as 32 zero bytes
    (matches the proof point codec pinned by test_transcript)."""
    if pt is None:
        return bytes(32)
    x, y = pt
    b = bytearray(x.to_bytes(32, "little"))
    b[31] |= (y & 1) << 7
    return bytes(b)


def test_params_write_kat():
    from halo2_tpu.curves import g1
    from halo2_tpu.poly.commitment import Params, g2_to_bytes

    k = 3
    params = Params.unsafe_setup(k, seed=7)

    # independent serialization straight from commitment.rs:241-252
    expect = bytearray()
    expect += (k).to_bytes(4, "little")
    for base in (params.g, params.g_lagrange):
        for pt in g1.decode_points(base):
            expect += _compress_point_independent(pt)
    extra = g2_to_bytes(params.s_g2)
    expect += len(extra).to_bytes(4, "little")
    expect += extra

    buf = io.BytesIO()
    params.write(buf)
    got = buf.getvalue()
    assert got == bytes(expect)
    # structural invariant: 4 + 2n*32 + 4 + extra
    assert len(got) == 4 + 2 * (1 << k) * 32 + 4 + len(extra)
