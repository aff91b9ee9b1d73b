"""Port of the reference's `tests/lookup_any.rs` spec test
(/root/reference/halo2_proofs/tests/lookup_any.rs:1-212 — block-commented
upstream but, with plonk_api.rs, the e2e specification of the lookup_any
API): two lookup_any arguments against NON-fixed table columns — an even
table in an ADVICE column and an odd table in an INSTANCE column — gated by
complex selectors, verified positively and negatively through MockProver.
"""

from halo2_tpu.dev import MockProver
from halo2_tpu.plonk import Circuit


class MyConfig:
    def __init__(self, input_col, q_even, table_even, q_odd, table_odd):
        self.input = input_col
        self.q_even = q_even
        self.table_even = table_even
        self.q_odd = q_odd
        self.table_odd = table_odd

    @classmethod
    def configure(cls, meta):
        config = cls(
            input_col=meta.advice_column(),
            q_even=meta.complex_selector(),
            table_even=meta.advice_column(),
            q_odd=meta.complex_selector(),
            table_odd=meta.instance_column(),
        )

        # Lookup on even numbers (q_even * input) in the advice table
        meta.lookup_any("even number", lambda m: [
            (m.query_selector(config.q_even)
             * m.query_advice(config.input, 0),
             m.query_advice(config.table_even, 0)),
        ])

        # Lookup on odd numbers (q_odd * input) in the instance table
        meta.lookup_any("odd number", lambda m: [
            (m.query_selector(config.q_odd)
             * m.query_advice(config.input, 0),
             m.query_instance(config.table_odd, 0)),
        ])
        return config

    def witness_even(self, layouter, value):
        def fn(region):
            region.enable_selector("q_even", self.q_even, 0)
            region.assign_advice("even input", self.input, 0, value)
        layouter.namespace("witness even numbers").assign_region(
            "witness even number", fn)

    def witness_odd(self, layouter, value):
        def fn(region):
            region.enable_selector("q_odd", self.q_odd, 0)
            region.assign_advice("odd input", self.input, 0, value)
        layouter.namespace("witness odd numbers").assign_region(
            "witness odd number", fn)

    def load_even_lookup(self, layouter, values):
        def fn(region):
            for offset, value in enumerate(values):
                region.assign_advice("even table value", self.table_even,
                                     offset, value)
        layouter.namespace("witness even numbers").assign_region(
            "load values for even lookup table", fn)


class MyCircuit(Circuit):
    def __init__(self, even_lookup=(), even_witnesses=(), odd_witnesses=()):
        self.even_lookup = list(even_lookup)
        self.even_witnesses = list(even_witnesses)
        self.odd_witnesses = list(odd_witnesses)

    def without_witnesses(self):
        return MyCircuit()

    def configure(self, meta):
        return MyConfig.configure(meta)

    def synthesize(self, config, layouter):
        config.load_even_lookup(layouter, self.even_lookup)
        for even in self.even_witnesses:
            config.witness_even(layouter, even)
        for odd in self.odd_witnesses:
            config.witness_odd(layouter, odd)


# the reference writes k=4, but 11 region rows do not fit 16-5-1=10
# usable rows under the blinding budget (the upstream file is dead code and
# was never run); k=5 preserves the structure with room for the regions
K = 5
EVEN_LOOKUP = [0, 2, 4, 6, 8]
ODD_LOOKUP = [1, 3, 5, 7, 9]


def _circuit():
    return MyCircuit(even_lookup=EVEN_LOOKUP,
                     even_witnesses=[0, 2, 4],
                     odd_witnesses=[1, 3, 5])


def test_lookup_any_accepts_correct_instance():
    prover = MockProver.run(K, _circuit(), [ODD_LOOKUP])
    prover.assert_satisfied()


def test_lookup_any_rejects_even_instance():
    # a public input of even numbers makes the odd lookup fail
    prover = MockProver.run(K, _circuit(), [EVEN_LOOKUP])
    assert prover.verify() != []


def test_lookup_any_rejects_nonmember_witness():
    bad = MyCircuit(even_lookup=EVEN_LOOKUP,
                    even_witnesses=[0, 2, 10],   # 10 not in the even table
                    odd_witnesses=[1, 3, 5])
    prover = MockProver.run(K, bad, [ODD_LOOKUP])
    assert prover.verify() != []
