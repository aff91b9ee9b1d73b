"""Circuit layout rendering (dev-graph analogue)."""

from halo2_tpu.dev.graph import CircuitLayout, LayoutTracker

from tests.test_e2e import SimpleCircuit


def test_layout_svg_renders():
    svg = CircuitLayout().render(SimpleCircuit(), k=4)
    assert svg.startswith("<svg")
    assert svg.rstrip().endswith("</svg>")
    # three regions (m1/m2/m3) + the equality constraint dashes
    assert svg.count("m1") >= 1 and svg.count("m3") >= 1
    assert "stroke-dasharray" in svg
    # advice/fixed/instance lanes labelled
    assert ">a0<" in svg and ">f0<" in svg and ">i0<" in svg


def test_layout_tracker_regions():
    import halo2_tpu.plonk.circuit as pc
    from halo2_tpu.circuit import SimpleFloorPlanner

    cs = pc.ConstraintSystem()
    circuit = SimpleCircuit()
    config = circuit.configure(cs)
    tracker = LayoutTracker(cs, 16)
    SimpleFloorPlanner.synthesize(tracker, circuit.without_witnesses(),
                                  config, cs.constants)
    names = [r.name for r in tracker.regions]
    assert names == ["m1", "m2", "m3"]
    # sequential placement: m1 at rows 0-1; every region spans >= 2 rows
    assert tracker.regions[0].rows == [0, 1]
    for info in tracker.regions:
        assert info.rows[1] - info.rows[0] >= 1
    assert tracker.equality  # constrain_equal calls recorded
