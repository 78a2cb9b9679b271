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


def msm_rows_sharded(scalars: jnp.ndarray, gens: PointArray, mesh: Mesh,
                     axis: str = "shard") -> PointArray:
    """Data-parallel row-MSM under GSPMD: rows (independent MSMs sharing
    one generator vector — dense_mlpoly.rs:148-162) are sharded across
    the mesh and the naive-ladder row-MSM kernel is jitted over the
    sharded inputs.  Every op in that kernel is elementwise over the
    row axis, so XLA partitions it with ZERO collectives and ONE
    compiled SPMD module — this is the compile-lean multi-chip MSM used
    by the driver dryrun and CI (the shard_map Pippenger variant
    `sharded_msm` is the warm-cache production alternative).

    scalars: (L, R, 16) canonical limbs, L % D == 0; gens: (R,) points.
    Group elements are bit-identical to msm.msm_rows."""
    L = scalars.shape[0]
    d = mesh.shape[axis]
    if L % d != 0:
        return msm_mod.msm_rows(scalars, gens)
    scal_sh = jax.device_put(scalars, NamedSharding(mesh, P(axis)))
    return _MSM_ROWS_SHARDED_JIT(scal_sh, gens)


_MSM_ROWS_SHARDED_JIT = jax.jit(msm_mod._msm_rows_naive_jit)


def sharded_msm_naive(mesh: Mesh, axis: str = "shard"):
    """Returns fn(scalars, points) computing an MSM with points/scalars
    block-sharded across the mesh, using the *naive* per-point
    double-and-add kernel (a 256-step lax.scan with one add instance).

    NOTE: prefer ``msm_rows_sharded`` — the shard_map wrapper here
    makes XLA compile the ladder per-partition, which costs minutes of
    local LLVM on the CPU backend (the round-2 dryrun timeout); the
    GSPMD formulation compiles the same math as one small module.
    Results are bit-identical to ``sharded_msm``.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), PointArray(P(axis), P(axis), P(axis), P(axis))),
        out_specs=PointArray(P(None), P(None), P(None), P(None)),
        check_rep=False,
    )
    def msm_fn(scalars, points):
        prods = ed.scalar_mul(points, scalars)
        local = ed.sum_reduce(prods, axis=0)
        gathered = jax.lax.all_gather(
            PointArray(*(pc[None] for pc in local)), axis, axis=0, tiled=True
        )  # (D,)
        return _tree_sum(gathered, mesh.shape[axis])

    return jax.jit(msm_fn)


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


# ---------------------------------------------------------------------------
# Sharded sumcheck rounds (generalized over the three combs)
# ---------------------------------------------------------------------------

from ..protocols import _combs

_KERNEL_CACHE: dict = {}


def _round_kernels(mesh: Mesh, which: str, axis: str):
    """(evals_only, fold_evals, fold_only) shard_map kernels for one
    comb.  Cached per (mesh, which): jax.jit then specializes per table
    shape as the rounds halve."""
    key = (mesh, which, axis)
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    k = _combs.NTABLES[which]
    in_tabs = tuple(P(axis) for _ in range(k))

    def psum_sum(x):
        return psum_mod_q(fq.sum_mod(x), axis)

    @partial(shard_map, mesh=mesh, in_specs=(in_tabs,),
             out_specs=P(None), check_rep=False)
    def evals_only(tables):
        return jnp.stack(list(_combs.evals(which, tables, psum_sum)), axis=0)

    @partial(shard_map, mesh=mesh, in_specs=(in_tabs, P(None)),
             out_specs=(in_tabs, P(None)), check_rep=False)
    def fold_evals(tables, r_m):
        from ..poly import dense

        folded = tuple(dense.bound_var_top(T, r_m) for T in tables)
        es = jnp.stack(list(_combs.evals(which, folded, psum_sum)), axis=0)
        return folded, es

    @partial(shard_map, mesh=mesh, in_specs=(in_tabs, P(None)),
             out_specs=in_tabs, check_rep=False)
    def fold_only(tables, r_m):
        from ..poly import dense

        return tuple(dense.bound_var_top(T, r_m) for T in tables)

    out = (jax.jit(evals_only), jax.jit(fold_evals), jax.jit(fold_only))
    _KERNEL_CACHE[key] = out
    return out


class ShardedSumcheckTables:
    """Sumcheck tables laid out trailing-bit-sharded across a mesh.

    Every fold (bound_poly_var_top) is chip-local under this layout —
    index i pairs with i + n/2, which differ only in the LEADING bit —
    and round evaluations cost one 18-limb integer psum.  When the
    global table drops below 2 elements/chip the tables unshard and the
    remaining rounds run on the default device.  Results (and therefore
    proof bytes) are bit-identical to the unsharded prover.

    TPU-native replacement for the rayon/SIMD parallelism the reference
    leaves to dependencies (SURVEY §2 P1/P3; sumcheck.rs:199-228).
    """

    def __init__(self, mesh: Mesh, tables: list[jnp.ndarray], which: str,
                 axis: str = "shard"):
        self.mesh, self.which, self.axis = mesh, which, axis
        self.d = mesh.shape[axis]
        n = tables[0].shape[0]
        self.sharded = n >= 2 * self.d
        if self.sharded:
            self.tables = [shard_table(T, mesh, axis) for T in tables]
        else:
            self.tables = list(tables)

    def _unshard_if_small(self):
        """The local lo/hi split equals the global split only while
        each chip holds >= 2 elements; unshard BEFORE a fold whose
        output would drop below that (post-fold local size >= 2 also
        guarantees the next round's evals split stays local)."""
        if self.sharded and self.tables[0].shape[0] < 4 * self.d:
            self.tables = [unshard_table(T, self.d) for T in self.tables]
            self.sharded = False

    def evals(self) -> jnp.ndarray:
        if self.sharded:
            ev, _, _ = _round_kernels(self.mesh, self.which, self.axis)
            return ev(tuple(self.tables))
        return jnp.stack(
            list(_combs.evals(self.which, self.tables, fq.sum_mod)), axis=0)

    def fold_evals(self, r_m: jnp.ndarray) -> jnp.ndarray:
        self._unshard_if_small()
        if self.sharded:
            _, fe, _ = _round_kernels(self.mesh, self.which, self.axis)
            folded, es = fe(tuple(self.tables), r_m)
            self.tables = list(folded)
            return es
        from ..poly import dense

        self.tables = [dense.bound_var_top(T, r_m) for T in self.tables]
        return jnp.stack(
            list(_combs.evals(self.which, self.tables, fq.sum_mod)), axis=0)

    def fold(self, r_m: jnp.ndarray) -> None:
        self._unshard_if_small()
        if self.sharded:
            _, _, fo = _round_kernels(self.mesh, self.which, self.axis)
            self.tables = list(fo(tuple(self.tables), r_m))
        else:
            from ..poly import dense

            self.tables = [dense.bound_var_top(T, r_m) for T in self.tables]

    def final_scalars(self) -> jnp.ndarray:
        """(k, 16) stacked T[0] values (logical index 0).  Under the
        trailing-bit layout logical 0 sits at position 0 of shard 0,
        which is global position 0 either way."""
        return jnp.stack([T[0] for T in self.tables], axis=0)


# ---------------------------------------------------------------------------
# Sharded product-tree layer rounds (SURVEY §2 P3: the grand-product /
# Spark half of the hypercube sharding; product_tree.rs:157-486)
# ---------------------------------------------------------------------------

def shard_table_batched(table: jnp.ndarray, mesh: Mesh,
                        axis: str = "shard") -> jnp.ndarray:
    """(B, n, 16) batched hypercube tables laid out trailing-bit-sharded
    on the HYPERCUBE axis (axis 1): logical index i lives on chip
    i mod D at local slot i // D; the instance axis rides along
    replicated-in-layout (each chip holds all B instances' shard)."""
    d = mesh.shape[axis]
    b, n, _ = table.shape
    assert n % d == 0
    resh = (table.reshape(b, n // d, d, 16)
            .transpose(0, 2, 1, 3).reshape(b, n, 16))
    return jax.device_put(resh, NamedSharding(mesh, P(None, axis)))


def unshard_table_batched(table: jnp.ndarray, d: int) -> jnp.ndarray:
    b, n, _ = table.shape
    return (table.reshape(b, d, n // d, 16)
            .transpose(0, 2, 1, 3).reshape(b, n, 16))


_BATCHED3_CACHE: dict = {}


def _batched3_kernels(mesh: Mesh, axis: str):
    """(evals, fold_evals, fold) shard_map kernels for the batched
    product-layer cubic comb sum_i A[b,i]*Bt[b,i]*C[b,i]."""
    key = (mesh, axis)
    if key in _BATCHED3_CACHE:
        return _BATCHED3_CACHE[key]
    from ..protocols.product_tree import (
        _bound_var_top_batched,
        _evals_cubic_batched,
    )

    spec = P(None, axis)

    def psum_sum(x):
        return psum_mod_q(fq.sum_mod(x, axis=1), axis)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=P(None), check_rep=False)
    def evals3(A, Bt, C):
        return jnp.stack(_evals_cubic_batched(A, Bt, C, psum_sum), axis=0)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec, spec, spec, P(None)),
             out_specs=((spec, spec, spec), P(None)), check_rep=False)
    def fold_evals3(A, Bt, C, r_m):
        A2 = _bound_var_top_batched(A, r_m)
        Bt2 = _bound_var_top_batched(Bt, r_m)
        C2 = _bound_var_top_batched(C, r_m)
        es = jnp.stack(_evals_cubic_batched(A2, Bt2, C2, psum_sum), axis=0)
        return (A2, Bt2, C2), es

    @partial(shard_map, mesh=mesh,
             in_specs=(spec, spec, spec, P(None)),
             out_specs=(spec, spec, spec), check_rep=False)
    def fold3(A, Bt, C, r_m):
        return (_bound_var_top_batched(A, r_m),
                _bound_var_top_batched(Bt, r_m),
                _bound_var_top_batched(C, r_m))

    out = (jax.jit(evals3), jax.jit(fold_evals3), jax.jit(fold3))
    _BATCHED3_CACHE[key] = out
    return out


class ShardedProductLayerTables:
    """One product-tree layer's (A, Bt, C) tables, (B, n, 16), sharded
    trailing-bit on the hypercube axis.  The instance-batched analogue
    of ShardedSumcheckTables: every bound_var_top fold is chip-local,
    round evals cost one (B, 18)-limb integer psum, and the tables
    unshard automatically once a chip would hold < 2 elements.  Proof
    bytes are bit-identical to the unsharded layer rounds."""

    def __init__(self, mesh: Mesh, A: jnp.ndarray, Bt: jnp.ndarray,
                 C: jnp.ndarray, axis: str = "shard"):
        self.mesh, self.axis = mesh, axis
        self.d = mesh.shape[axis]
        n = A.shape[1]
        self.sharded = n >= 2 * self.d and n % self.d == 0
        if self.sharded:
            self.A, self.Bt, self.C = (
                shard_table_batched(T, mesh, axis) for T in (A, Bt, C))
        else:
            self.A, self.Bt, self.C = A, Bt, C

    def _unshard_if_small(self):
        if self.sharded and self.A.shape[1] < 4 * self.d:
            self.A, self.Bt, self.C = (
                unshard_table_batched(T, self.d)
                for T in (self.A, self.Bt, self.C))
            self.sharded = False

    @property
    def tables(self):
        return self.A, self.Bt, self.C

    def evals(self) -> jnp.ndarray:
        from ..protocols.product_tree import _evals_cubic_batched

        if self.sharded:
            ev, _, _ = _batched3_kernels(self.mesh, self.axis)
            return ev(self.A, self.Bt, self.C)
        return jnp.stack(
            list(_evals_cubic_batched(self.A, self.Bt, self.C)), axis=0)

    def step(self, r_m: jnp.ndarray) -> jnp.ndarray:
        """Fold + next-round evals."""
        from ..protocols.product_tree import _step3

        self._unshard_if_small()
        if self.sharded:
            _, fe, _ = _batched3_kernels(self.mesh, self.axis)
            (self.A, self.Bt, self.C), es = fe(self.A, self.Bt, self.C, r_m)
            return es
        self.A, self.Bt, self.C, es = _step3(self.A, self.Bt, self.C, r_m)
        return es

    def fold(self, r_m: jnp.ndarray) -> None:
        from ..protocols.product_tree import _fold3

        self._unshard_if_small()
        if self.sharded:
            _, _, fo = _batched3_kernels(self.mesh, self.axis)
            self.A, self.Bt, self.C = fo(self.A, self.Bt, self.C, r_m)
        else:
            self.A, self.Bt, self.C = _fold3(self.A, self.Bt, self.C, r_m)


# ---------------------------------------------------------------------------
# Data-parallel row-block MSM (the witness-commitment kernel)
# ---------------------------------------------------------------------------

def msm_rows_blocked(scalars: jnp.ndarray, gens: PointArray,
                     mesh: Mesh, axis: str = "shard") -> PointArray:
    """L row-commitments (dense_mlpoly.rs:148-162, the rayon site)
    computed as D independent per-device Pippenger launches over row
    blocks — rows are independent MSMs sharing the generator vector, so
    this is collective-free data parallelism.  Uses explicit per-device
    dispatch of the SAME single-device kernel (one compile, D async
    launches) rather than shard_map: the sort+seg-scan Pippenger graph
    is expensive to compile and shard_map would force a second copy.

    Returns the (L,) PointArray of row commitments on the default
    device; group elements (and compressed bytes) are bit-identical to
    ``msm.msm_rows`` — only projective representatives may differ.
    """
    from ..curve.msm import (
        _DENSE_MSM_JIT,
        _msm_impl,
        _msm_rows_jit,
        _pad_pow2,
        _pick_c,
    )

    L, R = scalars.shape[0], scalars.shape[1]
    devs = list(mesh.devices.flat)
    d = len(devs)
    if L % d != 0 or L < d:
        return msm_mod.msm_rows(scalars, gens)
    Lb = L // d
    dense_fn = _DENSE_MSM_JIT.get(_msm_impl())
    if dense_fn is None:
        c = _pick_c(Lb * R, rows=Lb)
        tiled = PointArray(*(jnp.tile(gc, (Lb, 1)) for gc in gens))
    outs = []
    for i, dev in enumerate(devs):
        if dense_fn is not None:
            s, g = _pad_pow2(scalars[i * Lb:(i + 1) * Lb], gens)
            s_d = jax.device_put(s, dev)
            g_d = PointArray(*(jax.device_put(gc, dev) for gc in g))
            outs.append(dense_fn(s_d, g_d))
        else:
            block = jax.device_put(
                scalars[i * Lb:(i + 1) * Lb].reshape(Lb * R, 16), dev)
            tiled_d = PointArray(*(jax.device_put(tc, dev) for tc in tiled))
            outs.append(_msm_rows_jit(block, tiled_d, c, Lb))
    dev0 = jax.devices()[0]
    return PointArray(*(
        jnp.concatenate([jax.device_put(o[i], dev0) for o in outs], axis=0)
        for i in range(4)
    ))
