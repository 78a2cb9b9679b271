"""Prove knowledge of x satisfying x^3 + x + 5 = y (reference
examples/cubic.rs), end to end through the public API.

R1CS (4 constraints, 4 vars, 1 input):
  Z0 * Z0 - Z1 = 0
  Z1 * Z0 - Z2 = 0
  (Z2 + Z0) * 1 - Z3 = 0
  (Z3 + 5) * 1 - I0 = 0
"""

import os
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# This example is a 4-constraint toy: every millisecond of it is XLA
# compile time, not proving.  On boxes where the axon TPU plugin is
# armed (PALLAS_AXON_POOL_IPS), EVERY compile — CPU included — queues
# through a serial remote relay (~1-2 s/module; tests/conftest.py has
# the measurements), so by default re-exec once with the plugin
# disarmed and run on local CPU.  Set SPARTAN_TPU_EXAMPLE_TPU=1 to pay
# the chip grant and run on the accelerator instead.
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("SPARTAN_TPU_EXAMPLE_TPU") != "1"
        and not os.environ.get("SPARTAN_TPU_EXAMPLE_REEXEC")):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS")
    env["SPARTAN_TPU_EXAMPLE_REEXEC"] = "1"  # loop guard
    env["JAX_PLATFORMS"] = "cpu"
    sys.stdout.flush()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.stdout.reconfigure(line_buffering=True)

from spartan_tpu.api import Assignment, Instance, NIZK, NIZKGens
from spartan_tpu.core.field import Q
from spartan_tpu.core.merlin import Transcript
from spartan_tpu.utils.errors import ProofVerifyError


def produce_r1cs():
    num_cons, num_vars, num_inputs = 4, 4, 1
    one = 1
    A, B, C = [], [], []
    # Z0 * Z0 - Z1 = 0
    A.append((0, 0, one)); B.append((0, 0, one)); C.append((0, 1, one))
    # Z1 * Z0 - Z2 = 0
    A.append((1, 1, one)); B.append((1, 0, one)); C.append((1, 2, one))
    # (Z2 + Z0) * 1 - Z3 = 0
    A.append((2, 2, one)); A.append((2, 0, one))
    B.append((2, num_vars, one)); C.append((2, 3, one))
    # (Z3 + 5) * 1 - I0 = 0
    A.append((3, 3, one)); A.append((3, num_vars, 5))
    B.append((3, num_vars, one)); C.append((3, num_vars + 1, one))

    inst = Instance.new(num_cons, num_vars, num_inputs, A, B, C)

    z0 = random.randrange(Q)
    z1 = z0 * z0 % Q
    z2 = z1 * z0 % Q
    z3 = (z2 + z0) % Q
    i0 = (z3 + 5) % Q
    vars_a = Assignment([z0, z1, z2, z3])
    inputs_a = Assignment([i0])
    assert inst.is_sat(vars_a, inputs_a), "instance must be satisfiable"
    return inst, vars_a, inputs_a


def main():
    import jax

    print(f"cubic example: x^3 + x + 5 = y "
          f"(backend={jax.default_backend()})")
    inst, vars_a, inputs_a = produce_r1cs()
    print("R1CS built and satisfiability checked (4 cons, 4 vars, 1 input)")
    gens = NIZKGens(4, 4, 1)
    print("generators derived; proving (first run pays XLA compiles)...")

    t0 = time.time()
    proof = NIZK.prove(inst, vars_a, inputs_a, gens, Transcript(b"nizk_example"))
    print(f"NIZK::prove      {time.time() - t0:.3f}s")

    t0 = time.time()
    proof.verify(inst, inputs_a, Transcript(b"nizk_example"), gens)
    print(f"NIZK::verify     {time.time() - t0:.3f}s")
    print("proof verification successful!")

    # negative check: verification must reject a wrong public input
    bad = Assignment([(inputs_a.assignment[0] + 1) % Q])
    try:
        proof.verify(inst, bad, Transcript(b"nizk_example"), gens)
        raise SystemExit("BUG: tampered input verified")
    except ProofVerifyError:
        print("tampered input correctly rejected")


if __name__ == "__main__":
    main()
