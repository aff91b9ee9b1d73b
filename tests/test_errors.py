"""Typed error parity (plonk/error.rs analogue, halo2_tpu/plonk/error.py)."""

import pytest

from halo2_tpu.plonk.error import (Halo2Error, InstanceTooLarge,
                                   InvalidInstancesError,
                                   NotEnoughRowsAvailable, SynthesisError)
from halo2_tpu.poly.commitment import Params
from halo2_tpu.plonk.keygen import keygen
from tests.test_e2e import SimpleCircuit


def test_not_enough_rows_typed():
    params = Params.unsafe_setup(2, seed=1)
    with pytest.raises(NotEnoughRowsAvailable) as ei:
        keygen(params, SimpleCircuit())
    assert ei.value.current_k == 2
    # still a ValueError (backwards compatible)
    assert isinstance(ei.value, ValueError)
    assert isinstance(ei.value, Halo2Error)


def test_invalid_instances_typed():
    from halo2_tpu.dev import MockProver
    with pytest.raises(InvalidInstancesError):
        MockProver.run(4, SimpleCircuit(3, 5), [])  # missing instance column


def test_synthesis_error_message():
    e = SynthesisError()
    assert "synthesis" in str(e).lower()


def test_instance_too_large_message():
    assert "larger than the circuit" in str(InstanceTooLarge())
