"""Serialization round-trips: proof -> bytes -> proof -> verify.

Mirrors the reference's serde+bincode coverage (every proof type is
Serialize/Deserialize; sizes via bincode, lib.rs:380-381,409-410)."""

import pytest

from spartan_tpu import serialize as ser
from spartan_tpu.api import (
    NIZK,
    NIZKGens,
    SNARK,
    SNARKGens,
    Instance,
)
from spartan_tpu.core.merlin import Transcript


@pytest.fixture(scope="module")
def small_instance():
    num_cons, num_vars, num_inputs = 16, 16, 2
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        num_cons, num_vars, num_inputs, seed=7)
    return inst, vars_a, inputs_a, num_cons, num_vars, num_inputs


def test_nizk_roundtrip(small_instance):
    inst, vars_a, inputs_a, num_cons, num_vars, num_inputs = small_instance
    gens = NIZKGens(num_cons, num_vars, num_inputs)
    proof = NIZK.prove(inst, vars_a, inputs_a, gens,
                       Transcript(b"nizk_ser"), _tape_seed=11)

    blob = ser.nizk_to_bytes(proof)
    assert ser.compressed_size(blob) <= len(blob)
    proof2 = ser.nizk_from_bytes(blob)
    # bytes round-trip exactly
    assert ser.nizk_to_bytes(proof2) == blob
    # deserialized proof verifies
    proof2.verify(inst, inputs_a, Transcript(b"nizk_ser"), gens)


def test_snark_roundtrip(small_instance):
    inst, vars_a, inputs_a, num_cons, num_vars, num_inputs = small_instance
    nnz = max(inst.inst.A.get_num_nz_entries(),
              inst.inst.B.get_num_nz_entries(),
              inst.inst.C.get_num_nz_entries())
    gens = SNARKGens(num_cons, num_vars, num_inputs, nnz)
    comm, decomm = SNARK.encode(inst, gens)
    proof = SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                        Transcript(b"snark_ser"), _tape_seed=13)

    blob = ser.snark_to_bytes(proof)
    proof2 = ser.snark_from_bytes(blob)
    assert ser.snark_to_bytes(proof2) == blob
    proof2.verify(comm, inputs_a, Transcript(b"snark_ser"), gens)

    # the preprocessing commitment round-trips too
    cblob = ser.commitment_to_bytes(comm)
    comm2 = ser.commitment_from_bytes(cblob)
    assert ser.commitment_to_bytes(comm2) == cblob
    proof2.verify(comm2, inputs_a, Transcript(b"snark_ser"), gens)


def test_reader_rejects_garbage():
    with pytest.raises(ValueError):
        ser.nizk_from_bytes(b"\x01" * 7)
    with pytest.raises(ValueError):
        ser.nizk_from_bytes(b"")
    # non-canonical scalar
    w = ser.Writer()
    w.u64(1)  # one commitment point
    data = w.getvalue()
    with pytest.raises(ValueError):
        ser.nizk_from_bytes(data)
