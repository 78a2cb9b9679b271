"""Sumcheck round-evaluation combs, factored so the single-device
kernels (protocols/sumcheck.py) and the mesh-sharded kernels
(parallel/mesh.py) share one set of formulas.

Per round the prover needs the round polynomial's evaluations at
{0,2,3} (the value at 1 is recovered from the claim): the table is
split into (lo, hi) halves pairing index i with i + n/2, the comb is
evaluated at extrapolated points p_t = lo + t*(hi - lo), and the lane
results are summed.  ``sum_fn`` abstracts the reduction: fq.sum_mod on
one device, local-sum + mod-q psum across a mesh
(reference sumcheck.rs:199-228 — a pure reduction, trivially
all-reducible; SURVEY §2 P2).

Imports only ff/poly — safe for both protocols/ and parallel/.
"""

from __future__ import annotations

from ..ff import fq

NTABLES = {"quad": 2, "cubic": 4, "cubic_prod": 3}
NEVALS = {"quad": 2, "cubic": 3, "cubic_prod": 3}


def evals(which: str, tables, sum_fn):
    """Round evals of the ``which`` comb over ``tables``.

    quad:       sum_i A*B            -> (e0, e2)      (sumcheck.rs:428)
    cubic:      sum_i A*(B*C - D)    -> (e0, e2, e3)  (r1csproof.rs:85-89)
    cubic_prod: sum_i A*B*C          -> (e0, e2, e3)  (product_tree.rs)
    """
    n = tables[0].shape[0] // 2
    lo = [T[:n] for T in tables]
    hi = [T[n:] for T in tables]

    if which == "quad":
        def comb(a, b):
            return fq.mul(a, b)
    elif which == "cubic":
        def comb(a, b, c, d):
            return fq.mul(a, fq.sub(fq.mul(b, c), d))
    elif which == "cubic_prod":
        def comb(a, b, c):
            return fq.mul(fq.mul(a, b), c)
    else:  # pragma: no cover
        raise ValueError(which)

    e0 = sum_fn(comb(*lo))
    p2 = [fq.sub(fq.add(h, h), l) for h, l in zip(hi, lo)]
    e2 = sum_fn(comb(*p2))
    if which == "quad":
        return e0, e2
    p3 = [fq.add(x2, fq.sub(h, l)) for x2, h, l in zip(p2, hi, lo)]
    e3 = sum_fn(comb(*p3))
    return e0, e2, e3
