"""The prover pipeline — create_proof.

TPU re-design of /root/reference/halo2_proofs/src/plonk/prover.rs:206-850
(create_proof_ext), same transcript order, device-first data flow:

  1. vk hash + instance commit/absorb (prover.rs:85-162)
  2. witness synthesis into host column buffers -> device lagrange arrays;
     u16-random blinding rows; bounded-bit advice commitments
     (prover.rs:256-315)
  3. theta (lookups compress — M2)
  4. (shuffles — M3) -> beta, gamma
  5. permutation z commits (grand products on device)
  6. vanishing random poly commit -> y
  7. advice iNTT to coeff
  8. evaluate_h (the Evaluator program)
  9. vanishing.construct: divide by t, extended_to_coeff, split, commit -> x
 10. all query evals written in order (instance, advice, fixed, vanishing
     random, permutation common, permutation sets)
 11. GWC multiopen

Randomness is injectable (`seed`) so proofs are reproducible in tests —
the reference uses OsRng (prover.rs:286); byte-level determinism here is a
feature for differential testing.
"""

from __future__ import annotations

import os
import random

import jax.numpy as jnp
import numpy as np

from halo2_tpu.circuit import Assignment, Cell, SimpleFloorPlanner
from halo2_tpu.curves import g1
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.multiopen import ProverQuery
from halo2_tpu.multiopen import gwc
from halo2_tpu.plonk import logup_prover, permutation as perm_mod, shuffle_prover
from halo2_tpu.plonk.expr_eval import ExprCtx
from halo2_tpu.plonk.vanishing import VanishingProver
from halo2_tpu.poly.arith import eval_poly, eval_poly_batch
from halo2_tpu.transcript import Blake2bWrite
from halo2_tpu.utils.profiling import phase_marker
from halo2_tpu.plonk.error import (InstanceTooLarge, InvalidInstancesError, NotEnoughRowsAvailable, SynthesisError)

P = Fr.p


class WitnessCollection(Assignment):
    """Witness synthesis backend (prover.rs:1525-1781): advice values into
    host column buffers; copies/fixed are keygen artifacts and ignored.

    Columnar representation: each column starts as a numpy uint64 buffer
    (the common case — real witness values are machine ints), so bulk
    assignment and the canonical->Montgomery encode are loop-free all the
    way to the device (native/encoder.cpp consumes the buffer directly).
    The first full-width (>= 2^64) value DEGRADES that column to a Python
    int list — exact bigint semantics are kept, only the fast path is
    lost."""

    def __init__(self, cs, n, usable_rows, instances):
        self.cs = cs
        self.n = n
        self.usable_rows = usable_rows
        self.instances = instances
        self.advice = [np.zeros(n, np.uint64)
                       for _ in range(cs.num_advice_columns)]
        self.max_assigned = [-1] * cs.num_advice_columns
        # running max VALUE per column — avoids a full O(n) bit_length pass
        # per column after synthesis (the bounded-window commit needs only
        # the max; prover.rs:237-254)
        self.max_value = [0] * cs.num_advice_columns
        # deferred Assigned rationals (col, row, num, den): resolved with
        # ONE batch inversion after synthesis (poly.rs:148-173
        # batch_invert_assigned) — no per-cell `pow` during synthesis
        self.deferred = []

    def enable_selector(self, selector, row):
        pass  # packed into fixed columns at keygen

    def _degrade(self, ci):
        """numpy column -> Python int list (first big value)."""
        if isinstance(self.advice[ci], np.ndarray):
            self.advice[ci] = [int(v) for v in self.advice[ci]]
        return self.advice[ci]

    def assign_advice(self, column, row, value):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.n.bit_length() - 1)
        if value is None:
            raise SynthesisError("advice value not assigned (synthesis)")
        from halo2_tpu.plonk.assigned import Assigned
        if isinstance(value, Assigned) and not (value.is_trivial()
                                                or value.is_zero()):
            # deferred division: placeholder now, batch-inverted later
            self.deferred.append((column.index, row, value.num, value.den))
            ci = column.index
            if row > self.max_assigned[ci]:
                self.max_assigned[ci] = row
            return
        v = int(value) % P
        ci = column.index
        col = self.advice[ci]
        if isinstance(col, np.ndarray) and v >> 64:
            col = self._degrade(ci)
        col[row] = v
        if row > self.max_assigned[ci]:
            self.max_assigned[ci] = row
        if v > self.max_value[ci]:
            self.max_value[ci] = v

    def assign_fixed(self, column, row, value):
        pass

    def copy(self, left: Cell, right: Cell):
        pass

    def query_instance(self, column, row):
        return self.instances[column.index][row]

    def assign_advice_bulk(self, column, from_row, values):
        """Vectorized fast path (prover.rs:1525-1781's raw-buffer writes):
        accepts a list of ints or a numpy integer array; one slice store +
        one max, no per-cell Python dispatch."""
        count = len(values)
        if from_row + count > self.usable_rows:
            raise NotEnoughRowsAvailable(self.n.bit_length() - 1)
        ci = column.index
        col = self.advice[ci]
        arr = None
        if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
            # signed arrays containing negatives must NOT wrap via astype
            # (uint64(-1) != -1 mod p) — route them to the exact bigint path
            if values.dtype.kind == "i" and count and int(values.min()) < 0:
                arr = None
                values = [int(v) % P for v in values]
            else:
                arr = values.astype(np.uint64, copy=False)
        if arr is None:
            try:
                arr = np.asarray(values, dtype=np.uint64)
            except (OverflowError, TypeError, ValueError):
                arr = None
        if arr is not None and isinstance(col, np.ndarray):
            # columnar path: one slice store, no Python per-cell work
            col[from_row: from_row + count] = arr
            vmax = int(arr.max()) if count else 0
        else:
            if isinstance(col, np.ndarray):
                col = self._degrade(ci)
            vals = [int(v) % P for v in values] if arr is None \
                else [int(v) for v in arr]
            col[from_row: from_row + count] = vals
            vmax = max(vals, default=0)
        last = from_row + count - 1
        if last > self.max_assigned[ci]:
            self.max_assigned[ci] = last
        if vmax > self.max_value[ci]:
            self.max_value[ci] = vmax

    def assign_advice_big(self, ci, row, v):
        """Exact write of an already-reduced value that may exceed u64
        (parallel-synthesis overflow merge path)."""
        col = self.advice[ci]
        if isinstance(col, np.ndarray) and v >> 64:
            col = self._degrade(ci)
        col[row] = v
        if row > self.max_assigned[ci]:
            self.max_assigned[ci] = row
        if v > self.max_value[ci]:
            self.max_value[ci] = v

    def supports_parallel_regions(self):
        # A column already degraded to the bigint path would force every
        # worker write to it through the per-cell overflow pickle (losing
        # all parallelism and shipping the values over a pipe) — run
        # sequentially instead.
        return all(isinstance(c, np.ndarray) for c in self.advice)

    def share_columns(self):
        """Move u64 advice columns into anonymous POSIX shared memory so
        forked synthesis workers write directly into them (the *mut [F]
        analogue of prover.rs:1548-1626).  Returns the per-column shared
        views (None for degraded bigint columns, whose worker writes route
        through the overflow merge).  Pair with unshare_columns() after
        the join — shm lifetime is hazardous past the fan-out (GC of the
        SharedMemory object unmaps the buffer under any surviving view)."""
        from multiprocessing import shared_memory
        self._shms, self._shm_cols = [], set()
        for ci, col in enumerate(self.advice):
            if not isinstance(col, np.ndarray):
                continue
            shm = shared_memory.SharedMemory(create=True, size=col.nbytes)
            arr = np.ndarray(col.shape, np.uint64, buffer=shm.buf)
            arr[:] = col
            self.advice[ci] = arr
            self._shms.append(shm)
            self._shm_cols.add(ci)
            try:  # memory lives while mapped; no leak even on crash
                shm.unlink()
            except FileNotFoundError:
                pass
        return [self.advice[ci] if ci in self._shm_cols else None
                for ci in range(len(self.advice))]

    def unshare_columns(self):
        """Copy columns back out of shared memory and release the
        mappings (one memcpy per column — noise next to synthesis)."""
        for ci in self._shm_cols:
            if isinstance(self.advice[ci], np.ndarray):
                self.advice[ci] = np.array(self.advice[ci], copy=True)
        self._shm_cols = set()
        for shm in self._shms:
            try:
                shm.close()
            except BufferError:  # a stray view still holds the mapping
                pass
        self._shms = []

    def resolve_deferred(self):
        """Resolve rational cells with ONE batch inversion
        (batch_invert_assigned, poly.rs:148-173)."""
        from halo2_tpu.plonk.assigned import resolve_deferred

        def write(ci, row, v):
            col = self.advice[ci]
            if isinstance(col, np.ndarray) and v >> 64:
                col = self._degrade(ci)
            col[row] = v
            if v > self.max_value[ci]:
                self.max_value[ci] = v
        resolve_deferred(self.deferred, write)
        self.deferred = []

    def is_in_prove_mode(self):
        return True


def _quantize_max_bits(bits: int) -> int:
    """Snap a per-column scalar bound to the signed-window grid: the MSM
    program is keyed by its WINDOW COUNT, so quantizing to the largest bit
    bound with the same SIGNED_C_BITS window count gives exact per-column
    window counts (prover.rs:237-254 uses the exact bound) while keeping
    the compile cache small — a 20-bit column pays 2 windows, not the 5 a
    64-bit tier forced."""
    from halo2_tpu.msm.sorted import SIGNED_C_BITS, num_windows_for
    w = num_windows_for(bits)
    return min(SIGNED_C_BITS * w - 2, 254)


def _commit_affine(params, values, max_bits=256, base="lagrange"):
    # routes through Params._msm: mesh-sharded when params.use_mesh is set
    if base == "lagrange":
        proj = params.commit_lagrange(values, max_bits=max_bits)
    else:
        proj = params.commit(values)
    aff = g1.to_affine(tuple(c[:, None] for c in proj))
    return g1.decode_points(jnp.stack(aff))[0]


def _commit_affine_many(params, cols_and_bits, base="lagrange"):
    """Commit many columns with ONE host sync: all MSMs dispatch async,
    then a single batched to_affine (one batch inversion) + one device->
    host transfer decodes every point.  The reference gets this overlap
    from its GPU pool + rayon (prover.rs:411-626); here XLA async dispatch
    provides the overlap and this function removes the per-column decode
    sync that would otherwise serialize it."""
    if not cols_and_bits:
        return []
    projs = []
    for values, max_bits in cols_and_bits:
        if base == "lagrange":
            projs.append(params.commit_lagrange(values, max_bits=max_bits))
        else:
            projs.append(params.commit(values))
    stacked = tuple(jnp.stack([p[i] for p in projs], axis=1)
                    for i in range(3))
    aff = g1.to_affine(stacked)
    return g1.decode_points(jnp.stack(aff))


def synthesize_witness(pk, circuit, instances, floor_planner=None):
    """Run witness synthesis + range-check fill only; returns (advice host
    int columns, padded instance columns).  Backs the create_witness /
    create_proof_from_witness split flow (prover.rs:895-1523)."""
    cs = pk.vk.cs
    n = 1 << pk.vk.k
    usable_rows = cs.usable_rows(n)
    instance_cols = []
    for col in instances:
        if len(col) > usable_rows:
            raise InstanceTooLarge()
        instance_cols.append(list(col) + [0] * (n - len(col)))
    if len(instance_cols) != cs.num_instance_columns:
        raise InvalidInstancesError()
    witness = WitnessCollection(cs, n, usable_rows, instance_cols)
    planner = floor_planner or SimpleFloorPlanner
    planner.synthesize(witness, circuit, witness_config(pk, circuit),
                       cs.constants)
    witness.resolve_deferred()    # batch_invert_assigned (poly.rs:148-173)
    from halo2_tpu.plonk.range_check import fill_and_sort
    for rel in cs.range_check:
        fill_and_sort(witness.advice, rel, usable_rows,
                      witness.max_assigned[rel.origin.index])
    return witness.advice, instance_cols


def create_witness(pk, circuit, instances, path: str, floor_planner=None):
    """Synthesize and persist the witness (create_witness analogue)."""
    from halo2_tpu.io.serialization import save_witness
    advice, _ = synthesize_witness(pk, circuit, instances, floor_planner)
    save_witness(advice, path)


def create_proof_from_witness(params, pk, instances, path: str,
                              seed: int | None = None,
                              use_gwc: bool = True) -> bytes:
    """Prove from a stored witness, skipping synthesis
    (create_proof_from_witness analogue)."""
    from halo2_tpu.io.serialization import load_witness
    advice_arr, max_bits = load_witness(path)
    return create_proof(params, pk, None, instances, seed=seed,
                        use_gwc=use_gwc,
                        witness_advice=(advice_arr, max_bits))


def create_proof(params, pk, circuit, instances, seed: int | None = None,
                 floor_planner=None, use_gwc: bool = True,
                 witness_advice=None) -> bytes:
    """Prove one circuit instance. instances: list of instance columns
    (each a list of ints, length <= usable rows). Returns proof bytes.
    witness_advice: optional ((16, C, n) Montgomery lagrange array,
    per-column max_bits) to skip synthesis."""
    return create_proof_multi(
        params, pk, [circuit], [instances], seed=seed,
        floor_planner=floor_planner, use_gwc=use_gwc,
        witness_advice=[witness_advice] if witness_advice is not None else None)


def create_proof_multi(params, pk, circuits, instances_list,
                       seed: int | None = None, floor_planner=None,
                       use_gwc: bool = True, witness_advice=None) -> bytes:
    """Prove SEVERAL instances of one circuit family in a single proof
    (the reference's create_proof over &[ConcreteCircuit],
    prover.rs:206-850).  All per-proof commitments/evals interleave in the
    reference transcript order; the h fold chains across proofs."""
    vk = pk.vk
    cs = vk.cs
    domain = vk.domain
    n = params.n
    bf = cs.blinding_factors()
    usable_rows = cs.usable_rows(n)
    rng = random.Random(seed)
    transcript = Blake2bWrite()
    num_proofs = len(circuits)
    m = len(cs.permutation.columns)

    _pm = phase_marker()
    pk.onload_lagrange_forms()   # restore forms a prior proof offloaded
    # kick the Lagrange-SRS onload NOW (device_put is async): the ~1 GiB
    # upload at k=22 then overlaps the host-side witness synthesis below
    # instead of stalling the first advice commit (VERDICT r4 #3)
    params._lagrange_dev()
    # 1. vk hash + instance commitments (absorbed as common points)
    vk.hash_into(transcript)
    instance_cols_list = []
    instance_lagranges = []
    for instances in instances_list:
        cols = []
        for col in instances:
            if len(col) > usable_rows:
                raise InstanceTooLarge()
            cols.append(list(col) + [0] * (n - len(col)))
        if len(cols) != cs.num_instance_columns:
            raise InvalidInstancesError()
        instance_cols_list.append(cols)
        lag = (jnp.stack([jnp.asarray(Fr.encode(c)) for c in cols], axis=1)
               if cols else jnp.zeros((N_LIMBS, 0, n), jnp.uint32))
        instance_lagranges.append(lag)
    inst_pts = _commit_affine_many(params, [
        (instance_lagranges[p_i][:, i, :], 256)
        for p_i in range(num_proofs)
        for i in range(cs.num_instance_columns)])
    for pt in inst_pts:
        transcript.common_point(pt)

    _pm("instances")
    # 2. witness synthesis + advice commitments (per proof)
    advice_lagranges = []
    for p_i in range(num_proofs):
        wa = witness_advice[p_i] if witness_advice is not None else None
        if wa is None:
            witness = WitnessCollection(cs, n, usable_rows,
                                        instance_cols_list[p_i])
            planner = floor_planner or SimpleFloorPlanner
            planner.synthesize(witness, circuits[p_i],
                               witness_config(pk, circuits[p_i]), cs.constants)
            # batch_invert_assigned: ONE inversion for every deferred
            # rational cell (poly.rs:148-173)
            witness.resolve_deferred()
            # range-check fill + counting sort (prover.rs:1699-1779)
            from halo2_tpu.plonk.range_check import fill_and_sort
            for rel in cs.range_check:
                fill_and_sort(witness.advice, rel, usable_rows,
                              witness.max_assigned[rel.origin.index])
                for c in (rel.origin, rel.sort):
                    witness.max_value[c.index] = max(
                        witness.max_value[c.index], rel.max)
            # u16 blinding rows (prover.rs:283-290); named advice exempt
            for ci, col in enumerate(witness.advice):
                if ci in cs.named_advices:
                    continue
                for r in range(usable_rows, n):
                    col[r] = rng.randrange(1 << 16)
                witness.max_value[ci] = max(witness.max_value[ci],
                                            (1 << 16) - 1)
            # columnar staging: u64 columns upload RAW (8 B/value, 8x less
            # axon-tunnel traffic than limb planes), degraded bigint
            # columns upload 32-byte canonical rows (2x less); both convert
            # canonical->Montgomery ON DEVICE (one mul by R^2)
            def col_to_dev(c):
                if isinstance(c, np.ndarray):
                    return Fr.encode_u64_dev(c[None])[:, 0, :]
                from halo2_tpu import native
                blob = native.longs_to_blob(c)
                if blob is None:
                    blob = b"".join(int(v).to_bytes(32, "little") for v in c)
                return Fr.encode_le_bytes_dev(blob, n)

            if witness.advice and all(isinstance(c, np.ndarray)
                                      for c in witness.advice):
                advice_lagrange = Fr.encode_u64_dev(np.stack(witness.advice))
            elif witness.advice:
                advice_lagrange = jnp.stack(
                    [col_to_dev(c) for c in witness.advice], axis=1)
            else:
                advice_lagrange = jnp.zeros((N_LIMBS, 0, n), jnp.uint32)
            # bounded-window commit bound from the running max (no O(n)
            # host bit-length pass; prover.rs:237-254)
            col_bits = [max(witness.max_value[i].bit_length(), 1)
                        for i in range(cs.num_advice_columns)]
        else:
            advice_lagrange, col_bits = wa
            blinds = np.stack(
                [np.asarray(Fr.encode([rng.randrange(1 << 16)
                                       for _ in range(n - usable_rows)]))
                 for _ in range(cs.num_advice_columns)], axis=1) \
                if cs.num_advice_columns else np.zeros((N_LIMBS, 0, 0), np.uint32)
            advice_lagrange = advice_lagrange.at[:, :, usable_rows:].set(
                jnp.asarray(blinds))
            col_bits = [max(b, 16) for b in col_bits]
        for pt in _commit_affine_many(params, [
                (advice_lagrange[:, i, :], _quantize_max_bits(col_bits[i]))
                for i in range(cs.num_advice_columns)]):
            transcript.write_point(pt)
        advice_lagranges.append(advice_lagrange)

    _pm("advice synth+commit")
    # 3. theta; per proof: lookup compression + m(X) commitments
    theta = transcript.squeeze_challenge()
    theta_l = jnp.asarray(Fr.encode_scalar(theta))
    lag_ctxs = [ExprCtx(advice_lagranges[p_i], pk.fixed_lagrange,
                        instance_lagranges[p_i], rot_scale=1, length=n)
                for p_i in range(num_proofs)]
    lookup_data = [[] for _ in range(num_proofs)]
    for p_i in range(num_proofs):
        for lookup in cs.lookups:
            table, input_sets = logup_prover.compress(
                lookup, lag_ctxs[p_i], theta_l)
            flat_inputs = [c for s in input_sets for c in s]
            m_lag, m_bits = logup_prover.multiplicities(
                table, flat_inputs, usable_rows, rng, bf)
            transcript.write_point(
                _commit_affine(params, m_lag, max_bits=_quantize_max_bits(m_bits)))
            lookup_data[p_i].append((table, input_sets, m_lag))

    _pm("lookup compress+m")
    # 4. per proof shuffle compression; beta, gamma
    shuffle_data = [[shuffle_prover.compress(group, lag_ctxs[p_i], theta_l)
                     for group in cs.shuffles] for p_i in range(num_proofs)]
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    _pm("shuffle compress")
    # 5. permutation z commits (per proof), then lookup zs, then shuffle zs
    perm_zs_list = []
    for p_i in range(num_proofs):
        def value_col(column, p_i=p_i):
            if column.ctype == "advice":
                return advice_lagranges[p_i][:, column.index, :]
            if column.ctype == "fixed":
                return pk.fixed_lagrange[:, column.index, :]
            return instance_lagranges[p_i][:, column.index, :]

        zs, z_commitments = perm_mod.commit_z_polys(
            params, domain, cs, pk.permutation_pk, value_col, beta, gamma, rng)
        for com in z_commitments:
            transcript.write_point(com)
        perm_zs_list.append(zs)

    lookup_zs_list = [[] for _ in range(num_proofs)]
    for p_i in range(num_proofs):
        for table, input_sets, m_lag in lookup_data[p_i]:
            zset = logup_prover.commit_zs(domain, cs, table, input_sets,
                                          m_lag, beta, rng)
            for z in zset:
                transcript.write_point(_commit_affine(params, z))
            lookup_zs_list[p_i].append(zset)

    shuffle_zs_list = [[] for _ in range(num_proofs)]
    for p_i in range(num_proofs):
        for input_cols, shuffle_cols in shuffle_data[p_i]:
            z = shuffle_prover.commit_product(domain, cs, input_cols,
                                              shuffle_cols, beta, rng)
            transcript.write_point(_commit_affine(params, z))
            shuffle_zs_list[p_i].append(z)

    _pm("grand products/sums")
    import os as _os0
    if _os0.environ.get("HALO2_TPU_OFFLOAD_SRS") == "1" and n >= (1 << 22):
        # Lagrange-basis pk forms are dead from here on (~1 GiB at k=22)
        pk.offload_lagrange_forms()
    # 6. vanishing random poly -> y
    vanishing = VanishingProver(params, domain, rng)
    transcript.write_point(vanishing.random_commitment)
    y = transcript.squeeze_challenge()

    _pm("vanishing commit")
    # every Lagrange-basis commitment is done — at k>=22 the Lagrange SRS
    # (1 GiB) can leave HBM before the extended-domain phases
    # (HALO2_TPU_OFFLOAD_SRS=1; restored lazily on the next proof)
    import os as _os
    if _os.environ.get("HALO2_TPU_OFFLOAD_SRS") == "1":
        params.offload_lagrange()
    # 7. coeff forms (per proof) — distributed iNTTs under use_mesh (the
    # multi-GPU lagrange_to_coeff_st split of prover.rs:639-661; byte-
    # identical to the single-chip transform), gated by the same size
    # threshold as the sharded MSMs (tiny domains pay more in collective
    # fixed costs than they save)
    mesh = getattr(params, "mesh", None)
    mesh_axis = getattr(params, "mesh_axis", "x")
    # n >= 2^10 structural floor: below it the four-step split over 8
    # devices degenerates to 1-element all_to_all tiles — and compiling
    # those degenerate shard_map programs corrupts this image's XLA-CPU
    # compiler state (a LATER unrelated compile then segfaults;
    # reproduced 6/6 with the K=6 byte-identity test, 0/1 without —
    # BASELINE.md r5).  HALO2_TPU_NO_DIST_NTT=1 forces the single-chip
    # transforms under a mesh (debug escape hatch).
    use_dist_ntt = (mesh is not None and isinstance(mesh_axis, str)
                    and n >= max(params.MESH_MSM_MIN, 1 << 10)
                    and os.environ.get("HALO2_TPU_NO_DIST_NTT") != "1")

    # Release the Lagrange expression contexts FIRST so the big Lagrange
    # stacks can be DONATED into their inverse transforms: the (16, C, n)
    # buffers (512 MiB at k=22) feed the iNTT in place instead of
    # doubling the working set (VERDICT r4 #3 "use donation where the
    # working sets provably don't overlap").
    lag_ctxs = None
    if use_dist_ntt:
        ntt_inverse = ntt_inverse_d = domain.dist_ntt(mesh,
                                                      mesh_axis).inverse
    else:
        ntt_inverse = domain.ntt.inverse
        ntt_inverse_d = domain.ntt.inverse_donated

    def take_stack(lst, p_i, count):
        a, lst[p_i] = lst[p_i], None      # drop the last live reference
        return ntt_inverse_d(a) if count else a

    advice_coeffs = [take_stack(advice_lagranges, p_i, cs.num_advice_columns)
                     for p_i in range(num_proofs)]
    instance_coeffs = [
        take_stack(instance_lagranges, p_i, cs.num_instance_columns)
        for p_i in range(num_proofs)]
    advice_lagranges = None
    instance_lagranges = None

    def take_z(zs, i):
        z, zs[i] = zs[i], None
        return ntt_inverse_d(z)

    perm_z_coeffs = [[take_z(zs, i) for i in range(len(zs))]
                     for zs in perm_zs_list]
    perm_zs_list = None
    lookup_m_coeffs = [[ntt_inverse(ml) for _, _, ml in lookup_data[p_i]]
                       for p_i in range(num_proofs)]
    lookup_data = None                    # compressed Lagrange forms die
    lookup_z_coeffs = [[[take_z(zset, i) for i in range(len(zset))]
                        for zset in lookup_zs_list[p_i]]
                       for p_i in range(num_proofs)]
    lookup_zs_list = None
    shuffle_z_coeffs = [[take_z(shuffle_zs_list[p_i], i)
                         for i in range(len(shuffle_zs_list[p_i]))]
                        for p_i in range(num_proofs)]
    shuffle_zs_list = None

    def stack_or_empty(lst):
        return (jnp.stack(lst, axis=1) if lst
                else jnp.zeros((N_LIMBS, 0, n), jnp.uint32))

    shuffle_data = None           # compressed shuffle Lagrange forms die

    _pm("iNTTs")
    # 8. h evaluation — fold chains across proofs (evaluation.rs:900-1000);
    # sharded over the mesh when params.use_mesh is set.  The background
    # offload copies (pk forms, Lagrange SRS) must COMPLETE before the
    # evaluator's extended-domain working set needs their HBM.
    if n >= (1 << 22):
        pk.join_offloads()
        params.join_offload()
    ev = (pk.sharded_ev(params.mesh, params.mesh_axis)
          if getattr(params, "mesh", None) is not None else pk.ev)
    h_ext = None
    for p_i in range(num_proofs):
        flat_lz = [z for zset in lookup_z_coeffs[p_i] for z in zset]
        h_ext = ev.evaluate_h(
            advice_coeffs[p_i], instance_coeffs[p_i],
            stack_or_empty(perm_z_coeffs[p_i]),
            stack_or_empty(lookup_m_coeffs[p_i]),
            stack_or_empty(flat_lz),
            stack_or_empty(shuffle_z_coeffs[p_i]),
            theta, beta, gamma, y, value_init=h_ext)

    _pm("evaluate_h")
    if domain.extended_n >= (1 << 23):
        # drain the h program before the streamed iNTT + piece MSMs start:
        # async dispatch otherwise overlaps the evaluator's transient
        # extended columns with the construct phase's working set and the
        # warm k=22 re-prove OOMed (cold runs are saved by compile gaps);
        # the FORWARD extended twiddles (512 MiB mid table) are also dead
        # until the next proof's coset extensions — re-uploaded lazily
        np.asarray(h_ext[0, :1])
        domain.ntt_ext.drop_dev_tables(inverse=False)
    # 9. vanishing construct -> x (distributed extended iNTT under
    # use_mesh — evaluation_gpu.rs:863-911's per-GPU extended iFFTs)
    h_pieces, h_commitments = vanishing.construct(
        h_ext, mesh=mesh if use_dist_ntt else None, axis=mesh_axis)
    h_ext = None          # free the (16, ext_n) h values (512 MiB at k=22)
    for com in h_commitments:
        transcript.write_point(com)
    x = transcript.squeeze_challenge()
    xn = pow(x, n, P)

    _pm("h split+commit")
    # 10. evals (verifier read order, verifier.rs:246-290), batched:
    # all polys sharing an evaluation point go through ONE device dot
    x_next_pt = domain.rotate_omega(x, 1)
    x_last_pt = domain.rotate_omega(x, -(bf + 1))
    plan = []  # (poly, point) in exact transcript write order
    for p_i in range(num_proofs):
        for column, rot in cs.instance_queries:
            plan.append((instance_coeffs[p_i][:, column.index, :],
                         domain.rotate_omega(x, rot)))
    for p_i in range(num_proofs):
        for column, rot in cs.advice_queries:
            plan.append((advice_coeffs[p_i][:, column.index, :],
                         domain.rotate_omega(x, rot)))
    for column, rot in cs.fixed_queries:
        plan.append((pk.fixed_coeff[:, column.index, :],
                     domain.rotate_omega(x, rot)))
    h_poly = vanishing.fold_h(h_pieces, xn)
    plan.append((vanishing.random_poly, x))
    for i in range(m):
        plan.append((pk.permutation_pk.sigmas_coeff[:, i, :], x))
    for p_i in range(num_proofs):
        zc_list = perm_z_coeffs[p_i]
        for i, zc in enumerate(zc_list):
            plan.append((zc, x))
            plan.append((zc, x_next_pt))
            if i + 1 < len(zc_list):
                plan.append((zc, x_last_pt))
    for p_i in range(num_proofs):
        for li in range(len(cs.lookups)):
            plan.append((lookup_m_coeffs[p_i][li], x))
            zcs = lookup_z_coeffs[p_i][li]
            for i, zc in enumerate(zcs):
                plan.append((zc, x))
                plan.append((zc, x_next_pt))
                if i + 1 < len(zcs):
                    plan.append((zc, x_last_pt))
    for p_i in range(num_proofs):
        for zc in shuffle_z_coeffs[p_i]:
            plan.append((zc, x))
            plan.append((zc, x_next_pt))
    by_point = {}
    for i, (_, pt) in enumerate(plan):
        by_point.setdefault(pt, []).append(i)
    results = [None] * len(plan)
    for pt, idxs in by_point.items():
        vals = eval_poly_batch([plan[i][0] for i in idxs], pt)
        for i, v in zip(idxs, vals):
            results[i] = v
    for v in results:
        transcript.write_scalar(v)

    _pm("evals")
    # 11. multiopen queries (prover.rs:792-846: per-proof sections, then
    # shared fixed / permutation-common / vanishing). Pre-sliced so each
    # logical commitment is ONE array object (shplonk identity grouping).
    fixed_polys = [pk.fixed_coeff[:, i, :]
                   for i in range(cs.num_fixed_columns)]
    sigma_polys = [pk.permutation_pk.sigmas_coeff[:, i, :] for i in range(m)]
    x_next = domain.rotate_omega(x, 1)
    x_last = domain.rotate_omega(x, -(bf + 1))
    queries = []
    for p_i in range(num_proofs):
        instance_polys = [instance_coeffs[p_i][:, i, :]
                          for i in range(cs.num_instance_columns)]
        advice_polys = [advice_coeffs[p_i][:, i, :]
                        for i in range(cs.num_advice_columns)]
        for column, rot in cs.instance_queries:
            queries.append(ProverQuery(domain.rotate_omega(x, rot), rot,
                                       instance_polys[column.index]))
        for column, rot in cs.advice_queries:
            queries.append(ProverQuery(domain.rotate_omega(x, rot), rot,
                                       advice_polys[column.index]))
        zs_c = perm_z_coeffs[p_i]
        for zc in zs_c:
            queries.append(ProverQuery(x, 0, zc))
            queries.append(ProverQuery(x_next, 1, zc))
        for zc in reversed(zs_c[:-1]):
            queries.append(ProverQuery(x_last, -(bf + 1), zc))
        for li in range(len(cs.lookups)):
            queries.append(ProverQuery(x, 0, lookup_m_coeffs[p_i][li]))
            for zc in lookup_z_coeffs[p_i][li]:
                queries.append(ProverQuery(x, 0, zc))
                queries.append(ProverQuery(x_next, 1, zc))
            for zc in reversed(lookup_z_coeffs[p_i][li][:-1]):
                queries.append(ProverQuery(x_last, -(bf + 1), zc))
        for zc in shuffle_z_coeffs[p_i]:
            queries.append(ProverQuery(x, 0, zc))
            queries.append(ProverQuery(x_next, 1, zc))
    for column, rot in cs.fixed_queries:
        queries.append(ProverQuery(domain.rotate_omega(x, rot), rot,
                                   fixed_polys[column.index]))
    for i in range(m):
        queries.append(ProverQuery(x, 0, sigma_polys[i]))
    queries.append(ProverQuery(x, 0, h_poly))
    queries.append(ProverQuery(x, 0, vanishing.random_poly))

    if use_gwc:
        gwc.create_proof(params, transcript, queries)
    else:
        from halo2_tpu.multiopen import shplonk
        shplonk.create_proof(params, transcript, queries)
    _pm("multiopen")
    return transcript.finalize()


def witness_config(pk, circuit):
    """The config object for witness synthesis.

    Primary path: the pk stores the config produced by the single
    configure() run at keygen time (ProvingKey.config) — guaranteed in
    sync with the keygen CS even if configure() is stateful.  Fallback
    (pk rebuilt from serialized circuit-data, where no Circuit instance
    existed at load time): re-run configure on a throwaway CS and rely on
    allocation determinism."""
    if pk.config is not None:
        return pk.config
    from halo2_tpu.plonk.circuit import ConstraintSystem
    probe = ConstraintSystem()
    return circuit.configure(probe)
