"""Render a circuit layout to SVG — the `circuit-layout.rs` example
(/root/reference/halo2_proofs/examples/circuit-layout.rs) on the
dependency-free SVG renderer (halo2_tpu/dev/graph.py, the `dev-graph`
feature analogue).

Usage: python examples/circuit_layout.py [out.svg]
"""

import sys

sys.path.insert(0, ".")

from examples.two_chip_example import FieldCircuit  # noqa: E402
from halo2_tpu.dev.graph import CircuitLayout       # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "layout.svg"
    svg = CircuitLayout().render(FieldCircuit(), k=5, path=path)
    print(f"wrote {path} ({len(svg)} bytes)")


if __name__ == "__main__":
    main()
