"""Empirical proof-cost model — the TPU analogue of the reference's
`examples/cost-model.rs` (/root/reference/halo2_proofs/examples/cost-model.rs:27-60).

Where the reference *measures* `best_multiexp` durations at runtime and
extrapolates verification cost from them, this measures the repo's own MSM
and NTT primitives on the active JAX backend (TPU when available) and
extrapolates BOTH prover and verifier wall-clock from the circuit's
MSM/NTT/extended-domain op counts (dev/cost.py::CircuitCost supplies the
counts; this file supplies the measured throughputs).

Usage:
    python examples/cost_model.py --k 14 \
        --advice 0,1 --advice 0 --fixed 0 --gate-degree 3 \
        --lookup 2,1,1 --permutation 3

Each --advice/--instance/--fixed flag is a column with the given comma-
separated rotations (mirrors the reference CLI).  Timing uses the slope
method (chained iterations inside one jit, difference of two chain
lengths) so axon-tunnel dispatch latency cancels; see bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"
                  if any(d.platform != "cpu" for d in jax.devices())
                  else ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


class Estimator:
    """Measures MSM and NTT durations at size 2^k on the active backend
    (reference Estimator: cost-model.rs:13-44 measures best_multiexp only;
    the prover extrapolation needs the NTT rate too)."""

    def __init__(self, k: int, sample_k: int | None = None):
        # measure at a bounded sample size and scale linearly (MSM) /
        # n·log n (NTT) — cold-compiling a 2^22 MSM program just to
        # estimate cost defeats the purpose
        self.k = k
        self.sample_k = min(k, sample_k if sample_k is not None else 14)

    def _slope(self, make_chain, n_short=1, n_long=3):
        # minima of short and long timings are taken INDEPENDENTLY across
        # repetitions before the slope is formed: a single noisy repetition
        # where the short chain times long would otherwise clamp the whole
        # estimate to ~0 (ADVICE r2)
        f_s, f_l = make_chain(n_short), make_chain(n_long)
        sync = lambda x: np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]
        sync(f_s()); sync(f_l())  # compile
        best_s = best_l = 1e18
        for _ in range(3):
            t0 = time.time(); sync(f_s()); best_s = min(best_s, time.time() - t0)
            t0 = time.time(); sync(f_l()); best_l = min(best_l, time.time() - t0)
        diff = best_l - best_s
        if diff <= 0:
            raise RuntimeError(
                f"non-positive slope ({best_l:.4f}s long vs {best_s:.4f}s "
                "short) — timing noise exceeded the measured work; rerun "
                "with a larger --sample-k")
        return diff / (n_long - n_short)

    def msm_seconds(self, size: int) -> float:
        """Measured seconds for one size-`size` full-width MSM."""
        from halo2_tpu.curves import g1
        from halo2_tpu.fields.bn254 import Fr
        from halo2_tpu.msm.sorted import msm_sorted
        import random
        n = 1 << self.sample_k
        rng = random.Random(0)
        gx, gy = g1.generator()
        px = jnp.broadcast_to(gx[:, None], gx.shape + (n,))
        py = jnp.broadcast_to(gy[:, None], gy.shape + (n,))
        # uniform in [1, r): the digit distribution matches real proving
        # (62-bit scalars would leave every window above bit 62 empty)
        scal = jnp.asarray(Fr.encode(
            [rng.randrange(1, Fr.p) for _ in range(n)]))

        def make_chain(iters):
            def run():
                def body(s, _):
                    tot = msm_sorted((px, py), s)
                    # fold the output back so iterations chain
                    return s.at[:, 0].add(tot[0] & 1), None
                out, _ = jax.lax.scan(body, scal, None, length=iters)
                return out
            return jax.jit(run)

        per = self._slope(make_chain)
        return per * (size / n)

    def ntt_seconds(self, size: int) -> float:
        from halo2_tpu.ntt.ntt import get_ntt
        k = self.sample_k
        n = 1 << k
        ntt = get_ntt(k)
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randint(0, 1 << 16, (16, n)).astype(np.uint32))

        def make_chain(iters):
            def run():
                def body(v, _):
                    return ntt.forward_traced(v), None
                out, _ = jax.lax.scan(body, x, None, length=iters)
                return out
            return jax.jit(run)

        per = self._slope(make_chain)
        k_t = size.bit_length() - 1
        return per * (size / n) * (k_t / k)


def synthetic_circuit(args):
    """Build a ConstraintSystem from CLI column/rotation/lookup specs
    (mirrors cost-model.rs CostOptions -> Circuit)."""
    from halo2_tpu.plonk.circuit import ConstraintSystem

    cs = ConstraintSystem()
    advice = [cs.advice_column() for _ in args.advice]
    instance = [cs.instance_column() for _ in args.instance]
    fixed = [cs.fixed_column() for _ in args.fixed]

    def gate(m):
        polys = []
        for col, spec in zip(advice, args.advice):
            for r in spec:
                polys.append(m.query_advice(col, r))
        for col, spec in zip(instance, args.instance):
            for r in spec:
                polys.append(m.query_instance(col, r))
        for col, spec in zip(fixed, args.fixed):
            for r in spec:
                polys.append(m.query_fixed(col, r))
        expr = polys[0]
        for p in polys[1:min(len(polys), max(args.gate_degree, 1))]:
            expr = expr * p
        for p in polys:
            expr = expr + p
        return [("cost", expr)]

    cs.create_gate("cost", gate)

    for spec in args.lookup:
        ncols, _ideg, _tdeg = spec
        ins = advice[:max(1, min(ncols, len(advice)))]
        tabs = fixed[:len(ins)] or ins
        cs.lookup_any("cost-lookup", lambda m, i=ins, t=tabs: list(
            zip([m.query_advice(c, 0) for c in i],
                [m.query_fixed(c, 0) if c.ctype == "fixed"
                 else m.query_advice(c, 0) for c in t])))
    for ncols in args.permutation:
        for col in (advice + fixed + instance)[:ncols]:
            cs.enable_equality(col)
    cs.chunk_lookups()
    cs.chunk_shuffles()
    return cs


def _rotation_set(cs):
    """Distinct multiopen rotations for a built CS (mirrors
    CircuitCost.measure, dev/cost.py)."""
    rotations = {r for _, r in (cs.advice_queries + cs.fixed_queries
                                + cs.instance_queries)}
    rotations |= {0, 1}
    chunk = max(cs.degree() - 2, 1)
    perm_sets = -(-len(cs.permutation.columns) // chunk) \
        if cs.permutation.columns else 0
    chained = (perm_sets > 1
               or any(len(lk.input_expressions_sets) > 1
                      for lk in cs.lookups))
    if chained:
        rotations.add(-(cs.blinding_factors() + 1))
    return rotations


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    rot = lambda s: [int(r) for r in s.split(",")]
    tri = lambda s: tuple(int(r) for r in s.split(","))
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--advice", type=rot, action="append", default=[])
    ap.add_argument("--instance", type=rot, action="append", default=[])
    ap.add_argument("--fixed", type=rot, action="append", default=[])
    ap.add_argument("--gate-degree", type=int, default=2)
    ap.add_argument("--lookup", type=tri, action="append", default=[],
                    metavar="N,I,T")
    ap.add_argument("--permutation", type=int, action="append", default=[])
    ap.add_argument("--sample-k", type=int, default=None,
                    help="measure primitives at this size (default min(k,14))")
    args = ap.parse_args()
    if not args.advice:
        args.advice = [[0]]

    from halo2_tpu.dev.cost import CircuitCost

    cs = synthetic_circuit(args)
    n = 1 << args.k
    degree = cs.degree()
    cost = CircuitCost(
        k=args.k, max_degree=degree,
        extended_k=max(args.k, (n * max(degree - 1, 1) - 1).bit_length()),
        advice_columns=cs.num_advice_columns,
        fixed_columns=cs.num_fixed_columns,
        instance_columns=cs.num_instance_columns,
        gates=len(cs.gates),
        gate_constraints=sum(len(g.polys) for g in cs.gates),
        permutation_columns=len(cs.permutation.columns),
        permutation_sets=(-(-len(cs.permutation.columns) // max(degree - 2, 1))
                          if cs.permutation.columns else 0),
        lookups=len(cs.lookups),
        lookup_sets=sum(len(lk.input_expressions_sets) for lk in cs.lookups),
        lookup_set_counts=[len(lk.input_expressions_sets)
                           for lk in cs.lookups],
        shuffle_groups=len(cs.shuffles),
        usable_rows=cs.usable_rows(n),
        blinding_factors=cs.blinding_factors(),
        # distinct multiopen rotations, derived from the actual query set
        # exactly as CircuitCost.measure does (dev/cost.py): every query
        # rotation, plus cur/next for the z polynomials, plus the
        # chained-set "last" rotation when z chaining is in play
        num_rotations=len(_rotation_set(cs)),
    )

    est = Estimator(args.k, args.sample_k)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    msm_s = est.msm_seconds(n)
    ntt_s = est.ntt_seconds(n)
    ext_ntt_s = est.ntt_seconds(1 << cost.extended_k)

    n_msm = cost.prover_msms()
    n_ntt = cost.prover_ntts()
    # extended-domain work: one coset NTT per referenced column + the
    # constraint fold (~1 extended-NTT-equivalent per gate constraint)
    n_ext = (cost.advice_columns + cost.fixed_columns +
             cost.instance_columns + cost.permutation_columns +
             cost.permutation_sets + 3 * cost.lookups + cost.shuffle_groups)
    prover_s = n_msm * msm_s + n_ntt * ntt_s + n_ext * ext_ntt_s
    # verifier: transcript replay + 2 MSMs of ~proof_points size + pairing.
    # The MSMs are ~30 points — fixed dispatch/window overhead dominates at
    # that size, so linearly downscaling the 2^k measurement is meaningless;
    # treat them as part of the constant overhead term (ADVICE r2).
    verify_s = 0.05

    print(f"circuit: k={args.k} degree={degree} "
          f"advice={cost.advice_columns} fixed={cost.fixed_columns} "
          f"lookups={cost.lookups} perm_cols={cost.permutation_columns}")
    print(f"measured: MSM(2^{args.k}) = {msm_s*1e3:.1f} ms, "
          f"NTT(2^{args.k}) = {ntt_s*1e3:.1f} ms, "
          f"extNTT(2^{cost.extended_k}) = {ext_ntt_s*1e3:.1f} ms")
    print(f"proof size (GWC): {cost.proof_size_gwc()} bytes")
    print(f"prover estimate: {prover_s:.2f} s "
          f"({n_msm} MSMs + {n_ntt} NTTs + {n_ext} ext-NTT-equivalents)")
    print(f"verification estimate: at least {verify_s*1e3:.1f} ms")


if __name__ == "__main__":
    main()
