"""Key generation: vk/pk assembly.

TPU re-design of /root/reference/halo2_proofs/src/plonk/keygen.rs:
  * `KeygenAssembly` collects fixed values / selector enables / copies on
    host (the analogue of AssemblyAssigner, keygen.rs:69-231; no mutexes —
    synthesis here is single-threaded host code feeding vectorized device
    encodes)
  * fixed polys batched iNTT; permutation build via
    halo2_tpu.plonk.permutation.build_keys (keygen.rs:379-432)
  * l0 / l_last / l_blind kept COEFF-form; every extended coset (fixed,
    sigma, l-polys) is produced transiently inside the h-evaluation
    program — the reference cuda path's "coeff resident, extended
    transient" memory discipline (plonk.rs:226-243,
    evaluation_gpu.rs:863-911), mandatory for k>=20 HBM budgets
  * vk hash (plonk.rs:91-109): Blake2b-512, personalization
    "Halo2-Verify-Key" over the Rust Debug rendering of
    PinnedVerificationKey (plonk/pinned.py; KAT-verified against an
    independent in-test renderer derived line-by-line from the reference
    source — tests/test_pinned_kat.py; a true Rust differential run is
    pending a toolchain, absent from this image)
  * selector compression (circuit.rs:1603-1734) runs between synthesis and
    the fixed-column commits, exactly as keygen_vk does (keygen.rs:258-263)
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
from halo2_tpu.plonk.error import NotEnoughRowsAvailable

P = Fr.p


class KeygenAssembly(Assignment):
    """Collects fixed column values, selector enables, and copies."""

    def __init__(self, cs: ConstraintSystem, n: int, usable_rows: int):
        self.cs = cs
        self.n = n
        self.usable_rows = usable_rows
        self.fixed = [[0] * n for _ in range(cs.num_fixed_columns)]
        self.selectors = [[False] * n for _ in range(cs.num_selectors)]
        self.perm = perm_mod.Assembly(cs.permutation.columns, n)
        # deferred Assigned rationals: (col, row, num, den), resolved with
        # one batch inversion before the fixed columns are consumed
        # (keygen.rs:258 batch_invert_assigned)
        self.deferred = []

    def enable_selector(self, selector, row):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.n.bit_length() - 1)
        self.selectors[selector.index][row] = True

    def assign_advice(self, column, row, value):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.n.bit_length() - 1)
        # advice ignored during keygen

    def assign_advice_bulk(self, column, from_row, values):
        if from_row + len(values) > self.usable_rows:
            raise NotEnoughRowsAvailable(self.n.bit_length() - 1)
        # advice ignored during keygen

    def assign_fixed(self, column, row, value):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.n.bit_length() - 1)
        if value is None:
            return
        from halo2_tpu.plonk.assigned import Assigned
        if isinstance(value, Assigned):
            if value.is_trivial() or value.is_zero():
                self.fixed[column.index][row] = value.num if value.den else 0
            else:
                self.deferred.append((column.index, row,
                                      value.num, value.den))
            return
        self.fixed[column.index][row] = value % P

    def resolve_deferred(self):
        """batch_invert_assigned analogue: one inversion for every deferred
        rational fixed value (poly.rs:148-173)."""
        from halo2_tpu.plonk.assigned import resolve_deferred

        def write(ci, row, v):
            self.fixed[ci][row] = v
        resolve_deferred(self.deferred, write)
        self.deferred = []

    def copy(self, left: Cell, right: Cell):
        self.perm.copy(left.column, left.row, right.column, right.row)

    def query_instance(self, column, row):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.n.bit_length() - 1)
        return None  # instance values unknown at keygen

    def fill_from_row(self, column, from_row, value):
        if value is None:
            return
        for r in range(from_row, self.usable_rows):
            self.fixed[column.index][r] = value % P

    def is_in_prove_mode(self):
        return False


class _SelectorOnlyAssembly(Assignment):
    """Synthesis backend that records ONLY selector activations — used to
    rebuild a compressed ConstraintSystem without re-deriving fixed values
    (vk/circuit-data loaders need the post-compression CS structure, which
    depends on which rows each selector enables)."""

    def __init__(self, num_selectors: int, n: int):
        self.selectors = [[False] * n for _ in range(num_selectors)]

    def enable_selector(self, selector, row):
        self.selectors[selector.index][row] = True

    def assign_advice(self, column, row, value):
        pass

    def assign_advice_bulk(self, column, from_row, values):
        pass

    def assign_fixed(self, column, row, value):
        pass

    def copy(self, left, right):
        pass

    def query_instance(self, column, row):
        return None

    def fill_from_row(self, column, from_row, value):
        pass


def rebuild_cs(circuit, n: int, floor_planner=None):
    """configure + chunk + selector compression for a circuit, without
    assigning any values.  Returns (cs, config, degree) where degree is the
    PRE-compression constraint degree (what keygen sized the domain with —
    create_domain runs before compression, keygen.rs:34-52).  This is what
    vk / circuit-data loaders use so the rebuilt CS structure (fixed column
    count, queries, substituted gates, selector_map) matches keygen's."""
    cs = ConstraintSystem()
    config = circuit.configure(cs)
    cs.chunk_lookups()
    cs.chunk_shuffles()
    degree = cs.degree()
    if cs.num_selectors:
        assembly = _SelectorOnlyAssembly(cs.num_selectors, n)
        planner = floor_planner or SimpleFloorPlanner
        planner.synthesize(assembly, circuit.without_witnesses(), config,
                           cs.constants)
        cs.compress_selectors(assembly.selectors)
    return cs, config, degree


class VerifyingKey:
    def __init__(self, domain, cs, fixed_commitments, permutation_vk, k):
        self.domain = domain
        self.cs = cs
        self.fixed_commitments = fixed_commitments  # host points
        self.permutation = permutation_vk
        self.k = k

    def hash_into(self, transcript):
        """Blake2b-512("Halo2-Verify-Key", len || pinned-debug-string) ->
        common scalar, byte-identical to VerifyingKey::hash_into
        (plonk.rs:91-109)."""
        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        s = self.pinned().encode()
        h.update(len(s).to_bytes(8, "little"))
        h.update(s)
        transcript.common_scalar(int.from_bytes(h.digest(), "little") % P)

    def pinned(self) -> str:
        """format!("{:?}", vk.pinned()) — the exact Rust Debug rendering of
        PinnedVerificationKey (plonk.rs:111-133), see plonk/pinned.py."""
        from halo2_tpu.fields.bn254 import Fq
        from halo2_tpu.plonk.pinned import pinned_vk_str
        return pinned_vk_str(self, base_modulus=Fq.p, scalar_modulus=Fr.p,
                             omega=self.domain.omega)


class ProvingKey:
    def offload_lagrange_forms(self):
        """Move the Lagrange-basis pk forms (fixed columns, sigma tables)
        to host RAM — they are dead after the prover's z-commit phases,
        and at k=22 the ~1 GiB they pin was part of the construct-phase
        OOM.  The device->host copies run on a BACKGROUND thread (the
        ~1.5 GiB at tunnel bandwidth is seconds of otherwise dead time —
        the reference overlaps its phases the same way,
        prover.rs:411-626); join_offloads() completes them before the
        HBM headroom is actually needed.  Restored lazily by
        onload_lagrange_forms."""
        import threading
        devs = [self.fixed_lagrange, self.permutation_pk.sigmas_lagrange]

        def copy_out():
            self.fixed_lagrange = np.asarray(devs[0])
            self.permutation_pk.sigmas_lagrange = np.asarray(devs[1])
            devs.clear()      # release the device buffers
        t = threading.Thread(target=copy_out, daemon=True)
        t.start()
        self._offload_thread = t

    def join_offloads(self):
        """Wait for a pending offload's copies to finish (the device HBM
        is only freed once the copy completes and the reference drops)."""
        t = getattr(self, "_offload_thread", None)
        if t is not None:
            t.join()
            self._offload_thread = None

    def onload_lagrange_forms(self):
        self.join_offloads()
        if isinstance(self.fixed_lagrange, np.ndarray):
            self.fixed_lagrange = jnp.asarray(self.fixed_lagrange)
        if isinstance(self.permutation_pk.sigmas_lagrange, np.ndarray):
            self.permutation_pk.sigmas_lagrange = jnp.asarray(
                self.permutation_pk.sigmas_lagrange)

    def __init__(self, vk, fixed_lagrange, fixed_coeff, permutation_pk,
                 l0_coeff, l_last_coeff, l_blind_coeff, config=None):
        self.vk = vk
        # the config object produced by the ONE configure() run at keygen
        # time; the prover reuses it for witness synthesis instead of
        # re-running configure() on a throwaway CS (which silently desyncs
        # columns if configure() has any statefulness). None only for pks
        # rebuilt from serialized circuit-data, where no Circuit instance
        # exists (io/serialization.py).
        self.config = config
        self.fixed_lagrange = fixed_lagrange
        self.fixed_coeff = fixed_coeff
        self.permutation_pk = permutation_pk
        self.l0_coeff = l0_coeff
        self.l_last_coeff = l_last_coeff
        self.l_blind_coeff = l_blind_coeff
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
    """Commit each (16, n) lagrange column; returns host points.  All MSMs
    dispatch async, ONE batched to_affine + host decode at the end."""
    C = cols_lagrange.shape[1]
    if C == 0:
        return []
    projs = [params.commit_lagrange(cols_lagrange[:, i, :]) for i in range(C)]
    stacked = tuple(jnp.stack([p[i] for p in projs], axis=1)
                    for i in range(3))
    aff = g1.to_affine(stacked)
    return g1.decode_points(jnp.stack(aff))


def keygen(params, circuit, floor_planner=None):
    """keygen_vk + keygen_pk in one pass (keygen.rs:233-455)."""
    from halo2_tpu.utils.profiling import phase_marker
    _pm = phase_marker()
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
        raise NotEnoughRowsAvailable(k)
    domain = EvaluationDomain(degree, k)
    usable_rows = cs.usable_rows(n)

    _pm("keygen configure")
    assembly = KeygenAssembly(cs, n, usable_rows)
    planner = floor_planner or SimpleFloorPlanner
    planner.synthesize(assembly, circuit.without_witnesses(), config, cs.constants)
    assembly.resolve_deferred()   # batch_invert_assigned (keygen.rs:258)
    _pm("keygen synthesize")

    # pack selectors into combination fixed columns and substitute their
    # expressions (keygen.rs:258-263 -> circuit.rs:1603-1734)
    if cs.num_selectors:
        combos = cs.compress_selectors(assembly.selectors)
        assembly.fixed.extend(combos)
    _pm("keygen compress_selectors")

    # fixed polys
    if cs.num_fixed_columns:
        fixed_lagrange = jnp.stack(
            [jnp.asarray(Fr.encode(col)) for col in assembly.fixed], axis=1)
    else:
        fixed_lagrange = jnp.zeros((N_LIMBS, 0, n), jnp.uint32)
    _pm("keygen fixed encode")
    fixed_coeff = domain.ntt.inverse(fixed_lagrange) \
        if cs.num_fixed_columns else fixed_lagrange
    fixed_commitments = _commit_columns_affine(params, fixed_lagrange)
    _pm("keygen fixed commit+iNTT")

    perm_vk, perm_pk = perm_mod.build_keys(params, domain, assembly.perm)
    _pm("keygen permutation build")

    vk = VerifyingKey(domain, cs, fixed_commitments, perm_vk, k)

    # lagrange-basis helper polys, coeff-form (keygen.rs:397-432; the
    # extended cosets are produced inside the h program)
    bf = cs.blinding_factors()

    def lag_coeff_closed(one_rows):
        """Coeff form of sum of Lagrange one-hots WITHOUT an iNTT: the
        inverse transform of a one-hot at row i is coeffs[j] =
        omega^{-ij}/n, so each row contributes one device powers table
        (PointPowers — the same log-doubling program the prover already
        compiles) scaled by 1/n; the iNTT program this replaces was a
        keygen-only compile (~45 s of the k=22 keygen through the tunnel).
        """
        from halo2_tpu.poly.arith import _powers_dev_jit
        n_inv = pow(n, P - 2, P)
        acc = None
        omega_inv = domain.omega_inv
        build = _powers_dev_jit(n)      # compiled program shared w/ prover
        for r in one_rows:
            z_l = jnp.asarray(Fr.encode_scalar(pow(omega_inv, r, P)))
            tab = build(z_l)            # NOT PointPowers.get: results of
            acc = tab if acc is None else Fr.add(acc, tab)  # blind rows
            tab = None                  # must not pin n-sized cache slots
        scale = jnp.asarray(Fr.encode_scalar(n_inv))
        return Fr.mul(acc, scale[:, None])


    l0 = lag_coeff_closed([0])
    l_last = lag_coeff_closed([n - (bf + 1)])
    l_blind = lag_coeff_closed(range(n - bf, n))
    _pm("keygen l-polys")

    pk = ProvingKey(vk, fixed_lagrange, fixed_coeff, perm_pk,
                    l0, l_last, l_blind, config=config)
    return vk, pk
