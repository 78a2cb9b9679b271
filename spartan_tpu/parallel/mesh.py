"""Multi-chip sharding for the Spartan prover (SURVEY.md §2 item list:
the collective layer the single-process reference never had).

Design (scaling-book style): pick a mesh, annotate shardings, let XLA
insert collectives.

* Sumcheck tables are sharded by *trailing* hypercube index bits
  ("sequence parallelism" over the 2^ell table): bound_poly_var_top
  pairs element i with i + n/2, which differ only in the LEADING bit,
  so with trailing-bit sharding every fold round is local — zero
  communication until the table fits on one chip.  Round evaluations
  are local partial sums + one integer psum (mod-q reduction happens
  after the psum, since XLA collectives don't know modular arithmetic).

* MSM is data-parallel over points: each chip runs the full Pippenger
  window pipeline on its shard, then the per-chip partial results
  (group elements) are combined by an all_gather + log-depth local
  point tree (point addition is not a psum).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curve import edwards as ed
from ..curve import msm as msm_mod
from ..curve.edwards import PointArray
from ..ff import fq, limb


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def psum_mod_q(partials: jnp.ndarray, axis: str) -> jnp.ndarray:
    """All-reduce of canonical Fq limb values across a mesh axis:
    integer psum of limbs (< 2^16 each; safe for <= 2^16 chips), then a
    replicated wide reduction mod q."""
    s = jax.lax.psum(partials, axis)
    w = limb.carry_prop(limb.pad_limbs(s, limb.NLIMBS + 2))
    return fq.reduce_wide(w)


def shard_table(table: jnp.ndarray, mesh: Mesh, axis: str = "shard") -> jnp.ndarray:
    """Lay a (n, 16) hypercube table out shard-major by trailing index
    bits: logical index i lives on chip i mod D, at local slot i // D.
    Returned array is (D * local, 16) device-sharded on dim 0."""
    d = mesh.shape[axis]
    n = table.shape[0]
    assert n % d == 0
    # i -> (i mod d) * (n//d) + i//d  == transpose of (n//d, d)
    resh = table.reshape(n // d, d, 16).transpose(1, 0, 2).reshape(n, 16)
    return jax.device_put(resh, NamedSharding(mesh, P(axis)))


def unshard_table(table: jnp.ndarray, d: int) -> jnp.ndarray:
    n = table.shape[0]
    return table.reshape(d, n // d, 16).transpose(1, 0, 2).reshape(n, 16)


def sharded_quad_round(mesh: Mesh, axis: str = "shard"):
    """Returns a jitted function (A, B, r_m) -> (e0, e2, A', B') running
    one full phase-2-style sumcheck round on a sharded table: local
    evals at {0,2}, cross-chip mod-q psum, local fold.

    A, B are trailing-bit-sharded tables (see shard_table); because the
    shards hold strided slices, the (lo, hi) split inside each shard is
    exactly the global split — the round is communication-free except
    for the two scalar psums.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(None)),
        out_specs=(P(None), P(None), P(axis), P(axis)),
        check_rep=False,
    )
    def round_fn(A, B, r_m):
        n = A.shape[0] // 2
        alo, ahi = A[:n], A[n:]
        blo, bhi = B[:n], B[n:]
        e0 = psum_mod_q(fq.sum_mod(fq.mul(alo, blo)), axis)
        a2 = fq.sub(fq.add(ahi, ahi), alo)
        b2 = fq.sub(fq.add(bhi, bhi), blo)
        e2 = psum_mod_q(fq.sum_mod(fq.mul(a2, b2)), axis)
        A_new = fq.add(alo, fq.mul(r_m, fq.sub(ahi, alo)))
        B_new = fq.add(blo, fq.mul(r_m, fq.sub(bhi, blo)))
        return e0[None], e2[None], A_new, B_new

    def wrapper(A_sharded, B_sharded, r_m):
        # shards are strided slices: local (lo, hi) IS global (lo, hi)
        # under trailing-bit layout, but shard_map splits dim 0 in
        # blocks — so feed tables reshaped (D, local, 16) -> flat is
        # already shard-major from shard_table.
        return round_fn(A_sharded, B_sharded, r_m)

    return jax.jit(wrapper)


def sharded_msm(mesh: Mesh, c: int = 8, axis: str = "shard"):
    """Returns fn(scalars, points) computing an MSM with points/scalars
    block-sharded across the mesh; per-chip Pippenger + all_gather of
    the D partial group elements + local tree-sum."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), PointArray(P(axis), P(axis), P(axis), P(axis))),
        out_specs=PointArray(P(None), P(None), P(None), P(None)),
        check_rep=False,
    )
    def msm_fn(scalars, points):
        local = msm_mod._msm_windows(scalars, points, c, 1)  # (1,)
        gathered = jax.lax.all_gather(local, axis, axis=0, tiled=True)  # (D,)
        return _tree_sum(gathered, mesh.shape[axis])

    return jax.jit(msm_fn)


def _tree_sum(pts: PointArray, n: int) -> PointArray:
    while n > 1:
        half = n // 2
        pts = ed.add(
            PointArray(*(x[:half] for x in pts)),
            PointArray(*(x[half : 2 * half] for x in pts)),
        )
        n = half
    return pts
