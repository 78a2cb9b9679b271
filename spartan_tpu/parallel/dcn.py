"""Two-tier (DCN x ICI) collectives for multi-host Spartan proving.

The reference is a single-process library (its one parallel site is a
rayon thread pool, dense_mlpoly.rs:148-162); scaling beyond one host is
a new, first-class system this build owes (SURVEY.md §2).  The design
follows the scaling-book recipe: a 2-D ``Mesh`` whose minor axis
("ici") spans the chips inside one pod slice and whose major axis
("dcn") spans hosts, with every collective laid out so the slow
data-center network carries O(1) group elements while the per-element
work reduces over ICI.

Topology rules encoded here:

* **Field reductions** (`all_reduce_field`): integer limb psum over
  "ici" first (fast, wide), then over "dcn" (one (16,)-limb vector per
  host), then a single replicated mod-q squash.  The mod-q reduction
  cannot ride the collective (XLA psums are plain integer adds), so
  limb headroom bounds fan-in: 16-bit limbs in uint32 accumulate
  safely across <= 2^16 devices.

* **MSMs** (`msm_two_tier`): points are block-sharded over the whole
  mesh; each chip reduces its shard to ONE group element, the ICI
  all_gather + local tree-sum makes one element per host, and only
  those ride the DCN.  DCN traffic is 256 B/host per MSM regardless of
  N — the ≥80%-at-2-hosts scaling north star (BASELINE.md) is then a
  statement about per-chip kernel time vs one 256 B exchange.

Multi-host initialisation itself is ``jax.distributed.initialize``
(`init_multihost`); on this single-host dev box the same code paths
are exercised by shaping the 8-device CPU mesh as (hosts=2, ici=4)
(tests/test_dcn.py) — the XLA graphs are identical, only the physical
transport differs.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curve import edwards as ed
from ..curve.edwards import PointArray
from ..ff import fq, limb

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join (or no-op on single-host) a multi-host JAX runtime.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    when arguments are omitted; silently does nothing when neither an
    argument nor an env var announces a multi-process run, so library
    users can call this unconditionally before building a mesh."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh2d(n_hosts: int | None = None,
                chips_per_host: int | None = None) -> Mesh:
    """(dcn, ici) mesh over all visible devices.

    Devices enumerate host-major in ``jax.devices()`` (all of host 0's
    chips first), so reshaping to (hosts, chips_per_host) puts exactly
    one host's chips in each "ici" row — ICI collectives never cross a
    host boundary."""
    devs = np.array(jax.devices())
    n = devs.size
    if n_hosts is None:
        n_hosts = max(1, getattr(jax, "process_count", lambda: 1)())
    if chips_per_host is None:
        chips_per_host = n // n_hosts
    devs = devs[: n_hosts * chips_per_host]
    return Mesh(devs.reshape(n_hosts, chips_per_host), (DCN_AXIS, ICI_AXIS))


def all_reduce_field(partials: jnp.ndarray, two_tier: bool = True
                     ) -> jnp.ndarray:
    """All-reduce canonical Fq limb vectors across BOTH mesh axes (must
    run inside shard_map over a make_mesh2d mesh).  two_tier reduces
    over ICI before DCN so the inter-host hop carries one partial per
    host; False psums over both axes at once (XLA may still stage it,
    but the layout intent is lost)."""
    if two_tier:
        s = jax.lax.psum(partials, ICI_AXIS)
        s = jax.lax.psum(s, DCN_AXIS)
    else:
        s = jax.lax.psum(partials, (DCN_AXIS, ICI_AXIS))
    w = limb.carry_prop(limb.pad_limbs(s, limb.NLIMBS + 2))
    return fq.reduce_wide(w)


def _tree_sum_axis0(pts: PointArray, n: int) -> PointArray:
    while n > 1:
        half = n // 2
        a = PointArray(*(c[:half] for c in pts))
        b = PointArray(*(c[half : 2 * half] for c in pts))
        pts = ed.add(a, b)
        n = half
    return pts


def msm_two_tier(mesh: Mesh):
    """fn(scalars, points) -> (1,) PointArray: MSM with inputs
    block-sharded over the full (dcn, ici) mesh.

    Per-chip double-and-add reduction -> ICI all_gather + tree-sum
    (one element per host) -> DCN all_gather + tree-sum of the host
    partials.  Bit-identical to ``curve.msm.msm`` (group-element-wise;
    tests compare compressed bytes)."""
    n_ici = mesh.shape[ICI_AXIS]
    n_dcn = mesh.shape[DCN_AXIS]
    d = n_ici * n_dcn
    spec = P((DCN_AXIS, ICI_AXIS))
    pspec = PointArray(spec, spec, spec, spec)
    rep = PointArray(P(None), P(None), P(None), P(None))

    # Two-stage, compile-lean formulation.  Stage 1 (per-chip partials)
    # runs OUTSIDE shard_map as a GSPMD row-MSM — elementwise over the
    # chip axis, zero collectives, and the scalar ladder stays the ONE
    # shared flat module (putting the 256-step ladder inside shard_map
    # made XLA compile it per partition: >105 min over 8 CPU devices,
    # the round-2 dryrun timeout).  Stage 2 is the two-tier combine on
    # d group elements: ICI all_gather + tree-sum (one element per
    # host), then the per-host elements — 256 B each — ride the DCN.
    @partial(shard_map, mesh=mesh, in_specs=(pspec,), out_specs=rep,
             check_rep=False)
    def combine(partials):                            # (1,) per chip
        ici = jax.lax.all_gather(partials, ICI_AXIS, axis=0, tiled=True)
        host = _tree_sum_axis0(ici, n_ici)            # (1,) per host
        dcn = jax.lax.all_gather(host, DCN_AXIS, axis=0, tiled=True)
        return _tree_sum_axis0(dcn, n_dcn)            # (1,) replicated

    combine_jit = jax.jit(combine)

    def msm_fn(scalars, points):
        from ..curve import msm as msm_mod

        n = scalars.shape[0]
        assert n % d == 0, f"point count {n} must split over {d} chips"
        sh = NamedSharding(mesh, spec)
        scal = jax.device_put(scalars.reshape(d, n // d, 16), sh)
        pts = PointArray(*(
            jax.device_put(c.reshape(d, n // d, limb.NLIMBS), sh)
            for c in points))
        partials = msm_mod._msm_rows_rowgens_jit(scal, pts)  # (d,)
        return combine_jit(partials)

    return msm_fn


def sum_mod_q_two_tier(mesh: Mesh):
    """fn(table) -> (16,) canonical limbs: sum of a block-sharded
    (n, 16) Montgomery table mod q, reduced ICI-first.  The collective
    backend primitive behind sharded sumcheck round evaluations when the
    table spans hosts."""
    spec = P((DCN_AXIS, ICI_AXIS))

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=P(None),
             check_rep=False)
    def fn(table):
        return all_reduce_field(fq.sum_mod(table))[None]

    return jax.jit(fn)
