"""Key generation: vk/pk assembly.

TPU re-design of /root/reference/halo2_proofs/src/plonk/keygen.rs:
  * `KeygenAssembly` collects fixed values / selector enables / copies on
    host (the analogue of AssemblyAssigner, keygen.rs:69-231; no mutexes —
    synthesis here is single-threaded host code feeding vectorized device
    encodes)
  * fixed polys batched iNTT; permutation build via
    halo2_tpu.plonk.permutation.build_keys (keygen.rs:379-432)
  * l0 / l_last / l_blind / l_active_row as extended cosets
  * vk hash (plonk.rs:91-109): Blake2b-512, personalization
    "Halo2-Verify-Key" over a canonical pinned string + commitments.
    NOTE: the pinned string is canonical for THIS implementation, not
    byte-identical to the Rust Debug format (cross-stack transcript
    compatibility requires seeding both sides identically anyway).
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from halo2_tpu.circuit import Assignment, Cell, FlatFloorPlanner, SimpleFloorPlanner
from halo2_tpu.curves import g1
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.plonk import permutation as perm_mod
from halo2_tpu.plonk.circuit import Column, ConstraintSystem
from halo2_tpu.plonk.evaluator import Evaluator
from halo2_tpu.poly.domain import EvaluationDomain
from halo2_tpu.transcript.blake2b import point_to_bytes

P = Fr.p


class KeygenAssembly(Assignment):
    """Collects fixed column values, selector enables, and copies."""

    def __init__(self, cs: ConstraintSystem, n: int, usable_rows: int):
        self.cs = cs
        self.n = n
        self.usable_rows = usable_rows
        self.fixed = [[0] * n for _ in range(cs.num_fixed_columns)]
        self.perm = perm_mod.Assembly(cs.permutation.columns, n)

    def enable_selector(self, selector, row):
        if row >= self.usable_rows:
            raise ValueError("not enough rows available")
        self.fixed[selector.column.index][row] = 1

    def assign_advice(self, column, row, value):
        if row >= self.usable_rows:
            raise ValueError("not enough rows available")
        # advice ignored during keygen

    def assign_advice_bulk(self, column, from_row, values):
        if from_row + len(values) > self.usable_rows:
            raise ValueError("not enough rows available")
        # advice ignored during keygen

    def assign_fixed(self, column, row, value):
        if row >= self.usable_rows:
            raise ValueError("not enough rows available")
        if value is not None:
            self.fixed[column.index][row] = value % P

    def copy(self, left: Cell, right: Cell):
        self.perm.copy(left.column, left.row, right.column, right.row)

    def query_instance(self, column, row):
        if row >= self.usable_rows:
            raise ValueError("not enough rows available")
        return None  # instance values unknown at keygen

    def fill_from_row(self, column, from_row, value):
        if value is None:
            return
        for r in range(from_row, self.usable_rows):
            self.fixed[column.index][r] = value % P

    def is_in_prove_mode(self):
        return False


class VerifyingKey:
    def __init__(self, domain, cs, fixed_commitments, permutation_vk, k):
        self.domain = domain
        self.cs = cs
        self.fixed_commitments = fixed_commitments  # host points
        self.permutation = permutation_vk
        self.k = k

    def hash_into(self, transcript):
        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        s = self.pinned()
        h.update(len(s).to_bytes(8, "little"))
        h.update(s)
        transcript.common_scalar(int.from_bytes(h.digest(), "little") % P)

    def pinned(self) -> bytes:
        parts = [
            f"k={self.k};ext_k={self.domain.extended_k};omega={self.domain.omega}",
            self.cs.pinned(),
        ]
        blob = ";".join(parts).encode()
        for c in self.fixed_commitments:
            blob += point_to_bytes(c)
        for c in self.permutation.commitments:
            blob += point_to_bytes(c)
        return blob


class ProvingKey:
    def __init__(self, vk, fixed_lagrange, fixed_coeff, fixed_extended,
                 permutation_pk, l0_extended, l_last_extended,
                 l_active_extended):
        self.vk = vk
        self.fixed_lagrange = fixed_lagrange
        self.fixed_coeff = fixed_coeff
        self.fixed_extended = fixed_extended
        self.permutation_pk = permutation_pk
        self.l0_extended = l0_extended
        self.l_last_extended = l_last_extended
        self.l_active_extended = l_active_extended
        self.ev = Evaluator(self)
        self._sharded_evs = {}

    def sharded_ev(self, mesh, axis: str = "x"):
        """Cached multi-chip h-evaluator (plonk/evaluator_sharded.py) for a
        mesh; the prover selects it automatically when params.use_mesh is
        set."""
        key = (id(mesh), axis)
        if key not in self._sharded_evs:
            from halo2_tpu.plonk.evaluator_sharded import ShardedEvaluator
            self._sharded_evs[key] = ShardedEvaluator(self, mesh, axis)
        return self._sharded_evs[key]


def _commit_columns_affine(params, cols_lagrange):
    """Commit each (16, n) lagrange column; returns host points."""
    out = []
    for i in range(cols_lagrange.shape[1]):
        proj = params.commit_lagrange(cols_lagrange[:, i, :])
        aff = g1.to_affine(tuple(c[:, None] for c in proj))
        out.append(g1.decode_points(jnp.stack(aff))[0])
    return out


def keygen(params, circuit, floor_planner=None):
    """keygen_vk + keygen_pk in one pass (keygen.rs:233-455)."""
    cs = ConstraintSystem()
    config = circuit.configure(cs)
    # chunk lookups and shuffles by degree (circuit_configure,
    # plonk/circuit.rs:1316-1324)
    cs.chunk_lookups()
    cs.chunk_shuffles()
    degree = cs.degree()
    k = params.k
    n = params.n
    if n < cs.minimum_rows():
        raise ValueError(f"k={k} too small for this circuit")
    domain = EvaluationDomain(degree, k)
    usable_rows = cs.usable_rows(n)

    assembly = KeygenAssembly(cs, n, usable_rows)
    planner = floor_planner or SimpleFloorPlanner
    planner.synthesize(assembly, circuit.without_witnesses(), config, cs.constants)

    # fixed polys
    if cs.num_fixed_columns:
        fixed_lagrange = jnp.stack(
            [jnp.asarray(Fr.encode(col)) for col in assembly.fixed], axis=1)
    else:
        fixed_lagrange = jnp.zeros((N_LIMBS, 0, n), jnp.uint32)
    fixed_coeff = domain.ntt.inverse(fixed_lagrange) \
        if cs.num_fixed_columns else fixed_lagrange
    fixed_commitments = _commit_columns_affine(params, fixed_lagrange)

    perm_vk, perm_pk = perm_mod.build_keys(params, domain, assembly.perm)

    vk = VerifyingKey(domain, cs, fixed_commitments, perm_vk, k)

    # fixed extended cosets
    if cs.num_fixed_columns:
        fixed_extended = jnp.stack(
            [domain.coeff_to_extended_traced(fixed_coeff[:, i, :])
             for i in range(cs.num_fixed_columns)], axis=1)
    else:
        fixed_extended = jnp.zeros((N_LIMBS, 0, domain.extended_n), jnp.uint32)

    # lagrange-basis helper polys (keygen.rs:397-432)
    bf = cs.blinding_factors()

    def lag_ext(one_rows):
        vals = [0] * n
        for r in one_rows:
            vals[r] = 1
        lag = jnp.asarray(Fr.encode(vals))
        coeff = domain.ntt.inverse(lag)
        return domain.coeff_to_extended_traced(coeff)

    l0 = lag_ext([0])
    l_last = lag_ext([n - (bf + 1)])
    l_blind = lag_ext(range(n - bf, n))
    one = Fr.broadcast_scalar(Fr.r_np, (domain.extended_n,))
    l_active = Fr.sub(one, Fr.add(l_last, l_blind))

    pk = ProvingKey(vk, fixed_lagrange, fixed_coeff, fixed_extended, perm_pk,
                    l0, l_last, l_active)
    return vk, pk
