"""Spark sparse multilinear polynomial commitment (reference
src/sparse_mlpoly.rs): offline memory checking + grand products.

TPU mapping:
* AddrTimestamps' sequential counter scan (sparse_mlpoly.rs:220-254)
  becomes a vectorized occurrence-rank ("cumcount") computed by one
  stable argsort on host numpy.
* Hash layers, deref gathers and all polynomial evaluations are batched
  device kernels over (B, N, 16) tables.
* The 12 ops product circuits and 4 mem circuits are instance-batched
  ProductCircuitBatch trees (see protocols/product_tree.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..core.field import Q
from ..core.merlin import RandomTape, Transcript
from ..ff import fq, limb
from ..poly import dense
from ..poly.commit import PolyCommitment, PolyCommitmentGens, PolyEvalProof, commit
from ..poly.unipoly import UniPoly  # noqa: F401 (doc reference)
from ..utils.errors import ProofVerifyError
from ..utils.timer import Timer
from .product_tree import (
    DotProductCircuitBatch,
    ProductCircuitBatch,
    ProductCircuitEvalProofBatched,
)

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


def _log2(n: int) -> int:
    assert n > 0
    return (n - 1).bit_length() if n > 1 else 0


def _fold_bot_host(vals: list[int], challenges: list[int]) -> int:
    """bound_poly_var_bot applied for i in reversed(challenges) on a
    tiny host vector (the n-to-1 evaluation reductions)."""
    cur = [v % Q for v in vals]
    for r in reversed(challenges):
        cur = [
            (cur[2 * k] + r * (cur[2 * k + 1] - cur[2 * k])) % Q
            for k in range(len(cur) // 2)
        ]
    assert len(cur) == 1
    return cur[0]


def _evaluate_batched(polys: jnp.ndarray, r: list[int]) -> list[int]:
    """Evaluate B polynomials (B, n, 16) at the same point r.

    Width-chunked above 2^18 per instance-row: the single-program
    (15, 2^20, 16) hash-layer evaluation otherwise holds tens of GB of
    mul intermediates (SNARK-2^20 compile OOM class).  Modular partial
    sums combine exactly."""
    chis = dense.eq_evals(r)
    n = polys.shape[1]
    ch = 1 << 18
    if polys.shape[0] * n <= (3 << 18):
        return fq.decode_to_ints(
            fq.sum_mod(fq.mul(polys, chis[None]), axis=1))
    parts = [
        fq.sum_mod(fq.mul(polys[:, i : i + ch], chis[None, i : i + ch]),
                   axis=1)
        for i in range(0, n, ch)
    ]
    return fq.decode_to_ints(
        fq.sum_mod(jnp.stack(parts, axis=1), axis=1))


def _identity_table(n: int) -> jnp.ndarray:
    """Montgomery table of [0, 1, ..., n-1] built on device."""
    i = jnp.arange(n, dtype=jnp.uint32)
    limbs = jnp.zeros((n, limb.NLIMBS), dtype=jnp.uint32)
    limbs = limbs.at[:, 0].set(i & 0xFFFF)
    limbs = limbs.at[:, 1].set(i >> 16)
    return fq.to_mont(limbs)


def _ints_to_mont(xs) -> jnp.ndarray:
    return fq.to_mont(jnp.asarray(limb.ints_to_limbs([int(x) for x in xs])))


def _usize_table(arr: np.ndarray) -> jnp.ndarray:
    """(..., ) nonneg int numpy (< 2^32) -> Montgomery device table."""
    a = np.asarray(arr, dtype=np.uint64)
    limbs = np.zeros((*a.shape, limb.NLIMBS), dtype=np.uint32)
    limbs[..., 0] = a & 0xFFFF
    limbs[..., 1] = (a >> 16) & 0xFFFF
    return fq.to_mont(jnp.asarray(limbs))


# ---------------------------------------------------------------------------
# AddrTimestamps (sparse_mlpoly.rs:213-282)
# ---------------------------------------------------------------------------


class AddrTimestamps:
    def __init__(self, num_cells: int, num_ops: int, ops_addr: np.ndarray):
        """ops_addr: (B, num_ops) int array.  Timestamps accumulate
        across instances in order, exactly like the reference's shared
        audit counter."""
        B, N = ops_addr.shape
        assert N == num_ops
        assert ops_addr.max(initial=0) < num_cells
        flat = ops_addr.reshape(-1).astype(np.int64)
        order = np.argsort(flat, kind="stable")
        sorted_a = flat[order]
        idx = np.arange(flat.size, dtype=np.int64)
        is_start = np.empty(flat.size, dtype=bool)
        if flat.size:
            is_start[0] = True
            is_start[1:] = sorted_a[1:] != sorted_a[:-1]
        group_start = np.maximum.accumulate(np.where(is_start, idx, 0))
        ranks_sorted = idx - group_start
        read_ts = np.empty(flat.size, dtype=np.int64)
        read_ts[order] = ranks_sorted
        self.ops_addr_int = ops_addr.astype(np.int64)
        self.read_ts_int = read_ts.reshape(B, N)
        audit = np.bincount(flat, minlength=num_cells).astype(np.int64)
        self.audit_ts_int = audit
        self.num_cells = num_cells

        self.ops_addr = _usize_table(self.ops_addr_int)  # (B, N, 16)
        self.read_ts = _usize_table(self.read_ts_int)  # (B, N, 16)
        self.audit_ts = _usize_table(audit)  # (num_cells, 16)

    def deref(self, mem_val: jnp.ndarray) -> jnp.ndarray:
        """(B, N, 16) gather of mem_val[addr] (sparse_mlpoly.rs:256-272)."""
        return mem_val[jnp.asarray(self.ops_addr_int)]


# ---------------------------------------------------------------------------
# Dense representation + commitment (sparse_mlpoly.rs:330-520)
# ---------------------------------------------------------------------------


class Derefs:
    def __init__(self, row_ops_val: jnp.ndarray, col_ops_val: jnp.ndarray):
        self.row_ops_val = row_ops_val  # (B, N, 16)
        self.col_ops_val = col_ops_val
        B, N, _ = row_ops_val.shape
        self.comb = dense.merge_pad(
            [row_ops_val.reshape(B * N, 16), col_ops_val.reshape(B * N, 16)]
        )

    def commit(self, gens: PolyCommitmentGens) -> "DerefsCommitment":
        comm, _ = commit(self.comb, gens, None)
        return DerefsCommitment(comm)


@dataclass
class DerefsCommitment:
    comm_ops_val: PolyCommitment

    def append_to_transcript(self, label: bytes, transcript: Transcript):
        transcript.append_message(b"derefs_commitment", b"begin_derefs_commitment")
        self.comm_ops_val.append_to_transcript(label, transcript)
        transcript.append_message(b"derefs_commitment", b"end_derefs_commitment")


class MultiSparseMatPolynomialAsDense:
    def __init__(self, batch_size, row, col, val, comb_ops, comb_mem):
        self.batch_size = batch_size
        self.row: AddrTimestamps = row
        self.col: AddrTimestamps = col
        self.val: jnp.ndarray = val  # (B, N, 16)
        self.comb_ops = comb_ops
        self.comb_mem = comb_mem

    def deref(self, row_mem_val, col_mem_val) -> Derefs:
        return Derefs(self.row.deref(row_mem_val), self.col.deref(col_mem_val))


class SparseMatPolyCommitmentGens:
    """sparse_mlpoly.rs:291-328."""

    def __init__(self, label: bytes, num_vars_x: int, num_vars_y: int,
                 num_nz_entries: int, batch_size: int):
        num_vars_ops = (
            _log2(_next_pow2(num_nz_entries))
            + _log2(_next_pow2(batch_size * 5))
        )
        num_vars_mem = max(num_vars_x, num_vars_y) + 1
        num_vars_derefs = (
            _log2(_next_pow2(num_nz_entries))
            + _log2(_next_pow2(batch_size * 2))
        )
        self.gens_ops = PolyCommitmentGens(num_vars_ops, label)
        self.gens_mem = PolyCommitmentGens(num_vars_mem, label)
        self.gens_derefs = PolyCommitmentGens(num_vars_derefs, label)


@dataclass
class SparseMatPolyCommitment:
    batch_size: int
    num_ops: int
    num_mem_cells: int
    comm_comb_ops: PolyCommitment
    comm_comb_mem: PolyCommitment

    def append_to_transcript(self, _label: bytes, transcript: Transcript):
        transcript.append_u64(b"batch_size", self.batch_size)
        transcript.append_u64(b"num_ops", self.num_ops)
        transcript.append_u64(b"num_mem_cells", self.num_mem_cells)
        self.comm_comb_ops.append_to_transcript(b"comm_comb_ops", transcript)
        self.comm_comb_mem.append_to_transcript(b"comm_comb_mem", transcript)


def multi_sparse_to_dense_rep(sparse_polys) -> MultiSparseMatPolynomialAsDense:
    """sparse_mlpoly.rs:370-427."""
    assert sparse_polys
    vx = sparse_polys[0].num_vars_x
    vy = sparse_polys[0].num_vars_y
    for p in sparse_polys[1:]:
        assert p.num_vars_x == vx and p.num_vars_y == vy

    N = max(p.get_num_nz_entries() for p in sparse_polys)
    B = len(sparse_polys)

    ops_row = np.zeros((B, N), dtype=np.int64)
    ops_col = np.zeros((B, N), dtype=np.int64)
    val_rows = []
    for i, p in enumerate(sparse_polys):
        nnz = p.nnz
        ops_row[i, :nnz] = p._rows_np
        ops_col[i, :nnz] = p._cols_np
        v = jnp.concatenate(
            [p.vals, jnp.zeros((N - nnz, 16), dtype=jnp.uint32)], axis=0
        ) if nnz < N else p.vals
        val_rows.append(v)
    val = jnp.stack(val_rows, axis=0)  # (B, N, 16)

    num_mem_cells = 1 << max(vx, vy)
    row = AddrTimestamps(num_mem_cells, N, ops_row)
    col = AddrTimestamps(num_mem_cells, N, ops_col)

    comb_ops = dense.merge_pad([
        row.ops_addr.reshape(B * N, 16),
        row.read_ts.reshape(B * N, 16),
        col.ops_addr.reshape(B * N, 16),
        col.read_ts.reshape(B * N, 16),
        val.reshape(B * N, 16),
    ])
    comb_mem = dense.merge_pad([row.audit_ts, col.audit_ts])
    return MultiSparseMatPolynomialAsDense(B, row, col, val, comb_ops, comb_mem)


def multi_commit(sparse_polys, gens: SparseMatPolyCommitmentGens):
    """sparse_mlpoly.rs:483-504."""
    batch_size = len(sparse_polys)
    dense_rep = multi_sparse_to_dense_rep(sparse_polys)
    comm_ops, _ = commit(dense_rep.comb_ops, gens.gens_ops, None)
    comm_mem, _ = commit(dense_rep.comb_mem, gens.gens_mem, None)
    return (
        SparseMatPolyCommitment(
            batch_size,
            dense_rep.row.read_ts.shape[1],
            dense_rep.row.audit_ts.shape[0],
            comm_ops,
            comm_mem,
        ),
        dense_rep,
    )


# ---------------------------------------------------------------------------
# Hash layers + product layers (sparse_mlpoly.rs:506-678)
# ---------------------------------------------------------------------------


class ProductLayer:
    """Batched form of the reference's ProductLayer: ops circuits in one
    (4B, N) tree batch per row/col handled jointly at proof time."""

    def __init__(self, init_c, read_write_c, audit_c):
        self.init = init_c  # slice indices into the mem batch
        self.read_write = read_write_c
        self.audit = audit_c


def _hash_leaves(addr, val, ts, r_hash: int, r_ms: int):
    """hash(a,v,t) = t*r^2 + v*r + a - r_ms over device tables."""
    r2 = _ints_to_mont([r_hash * r_hash % Q])
    r1 = _ints_to_mont([r_hash])
    rm = _ints_to_mont([r_ms])
    h = fq.add(fq.add(fq.mul(ts, r2), fq.mul(val, r1)), addr)
    return fq.sub(h, jnp.broadcast_to(rm, h.shape))


class Layers:
    """Hashed init/read/write/audit leaf tables for one address space
    (sparse_mlpoly.rs:528-654)."""

    def __init__(self, eval_table: jnp.ndarray, addr_ts: AddrTimestamps,
                 poly_ops_val: jnp.ndarray, r_mem_check):
        r_hash, r_ms = r_mem_check
        num_cells = eval_table.shape[0]
        ident = _identity_table(num_cells)
        zero = jnp.zeros_like(eval_table)
        self.init_leaves = _hash_leaves(ident, eval_table, zero, r_hash, r_ms)
        self.audit_leaves = _hash_leaves(
            ident, eval_table, addr_ts.audit_ts, r_hash, r_ms)
        one = jnp.broadcast_to(_ints_to_mont([1]), addr_ts.read_ts.shape)
        self.read_leaves = _hash_leaves(
            addr_ts.ops_addr, poly_ops_val, addr_ts.read_ts, r_hash, r_ms)
        self.write_leaves = _hash_leaves(
            addr_ts.ops_addr, poly_ops_val, fq.add(addr_ts.read_ts, one),
            r_hash, r_ms)


# ---------------------------------------------------------------------------
# Proof layers
# ---------------------------------------------------------------------------


@dataclass
class ProductLayerProof:
    eval_row: tuple  # (init, read vec, write vec, audit)
    eval_col: tuple
    eval_val: tuple  # (dotp_left vec, dotp_right vec)
    proof_mem: ProductCircuitEvalProofBatched
    proof_ops: ProductCircuitEvalProofBatched

    PROTOCOL = b"Sparse polynomial product layer proof"

    @staticmethod
    def prove(row_layers: Layers, col_layers: Layers,
              dense_rep: MultiSparseMatPolynomialAsDense, derefs: Derefs,
              evals: list[int], transcript: Transcript):
        transcript.append_protocol_name(ProductLayerProof.PROTOCOL)
        B = dense_rep.batch_size
        N = dense_rep.val.shape[1]

        # build the two instance-batched circuit trees.  Under the
        # shape-stable regime (accelerator backends) the leaf tables are
        # bit-reverse-relayouted ONCE (two gathers) so every tree-build
        # step and every layer-sumcheck round runs at one of ~4 padded
        # shapes instead of one executable per (layer, round-size) —
        # the dominant fresh-process compile cost of SNARK::prove on the
        # axon backend.  Proof bytes are identical.
        from .sumcheck import _use_device_nonzk, stable_layout_active

        # device-resident layers (one traced dispatch per layer through
        # the device transcript) want the natural halving layout; the
        # BR relayout only pays for the host round path
        use_br = stable_layout_active() and not _use_device_nonzk()
        ops_leaves = jnp.concatenate([
            row_layers.read_leaves, row_layers.write_leaves,
            col_layers.read_leaves, col_layers.write_leaves,
        ], axis=0)  # (4B, N, 16)
        mem_leaves = jnp.stack([
            row_layers.init_leaves, row_layers.audit_leaves,
            col_layers.init_leaves, col_layers.audit_leaves,
        ], axis=0)  # (4, C, 16)
        if use_br:
            C_cells = mem_leaves.shape[1]
            perm_n = jnp.asarray(dense.bitrev_perm(N.bit_length() - 1))
            perm_c = jnp.asarray(dense.bitrev_perm(C_cells.bit_length() - 1))
            ops_leaves = jnp.take(ops_leaves, perm_n, axis=1)
            mem_leaves = jnp.take(mem_leaves, perm_c, axis=1)
        ops_circuit = ProductCircuitBatch(ops_leaves, bitrev=use_br)
        mem_circuit = ProductCircuitBatch(mem_leaves, bitrev=use_br)

        ops_evals = ops_circuit.evaluate()
        mem_evals = mem_circuit.evaluate()
        row_eval_read = ops_evals[0:B]
        row_eval_write = ops_evals[B:2 * B]
        col_eval_read = ops_evals[2 * B:3 * B]
        col_eval_write = ops_evals[3 * B:4 * B]
        row_eval_init, row_eval_audit = mem_evals[0], mem_evals[1]
        col_eval_init, col_eval_audit = mem_evals[2], mem_evals[3]

        # multiset consistency (prover-side assert, sparse_mlpoly.rs:1055)
        ws = rs = 1
        for w in row_eval_write:
            ws = ws * w % Q
        for r in row_eval_read:
            rs = rs * r % Q
        assert row_eval_init * ws % Q == rs * row_eval_audit % Q

        transcript.append_scalar(b"claim_row_eval_init", row_eval_init)
        transcript.append_scalar_vector(b"claim_row_eval_read", row_eval_read)
        transcript.append_scalar_vector(b"claim_row_eval_write", row_eval_write)
        transcript.append_scalar(b"claim_row_eval_audit", row_eval_audit)

        ws = rs = 1
        for w in col_eval_write:
            ws = ws * w % Q
        for r in col_eval_read:
            rs = rs * r % Q
        assert col_eval_init * ws % Q == rs * col_eval_audit % Q

        transcript.append_scalar(b"claim_col_eval_init", col_eval_init)
        transcript.append_scalar_vector(b"claim_col_eval_read", col_eval_read)
        transcript.append_scalar_vector(b"claim_col_eval_write", col_eval_write)
        transcript.append_scalar(b"claim_col_eval_audit", col_eval_audit)

        # dot-product circuits proving the actual evaluations, split in
        # two halves each (sparse_mlpoly.rs:1089-1118); interleaved
        # [left_0, right_0, left_1, right_1, ...]
        half = N // 2
        def interleave(t):
            return t.reshape(B, 2, half, 16).reshape(2 * B, half, 16)

        dotp = DotProductCircuitBatch(
            interleave(derefs.row_ops_val),
            interleave(derefs.col_ops_val),
            interleave(dense_rep.val),
        )
        dotp_evals = dotp.evaluate()
        eval_dotp_left = dotp_evals[0::2]
        eval_dotp_right = dotp_evals[1::2]
        for i in range(B):
            transcript.append_scalar(b"claim_eval_dotp_left", eval_dotp_left[i])
            transcript.append_scalar(b"claim_eval_dotp_right", eval_dotp_right[i])
            assert (eval_dotp_left[i] + eval_dotp_right[i]) % Q == evals[i] % Q

        proof_ops, rand_ops = ProductCircuitEvalProofBatched.prove(
            ops_circuit, dotp, transcript)
        proof_mem, rand_mem = ProductCircuitEvalProofBatched.prove(
            mem_circuit, None, transcript)

        return (
            ProductLayerProof(
                (row_eval_init, row_eval_read, row_eval_write, row_eval_audit),
                (col_eval_init, col_eval_read, col_eval_write, col_eval_audit),
                (eval_dotp_left, eval_dotp_right),
                proof_mem, proof_ops,
            ),
            rand_mem, rand_ops,
        )

    def verify(self, num_ops: int, num_cells: int, evals: list[int],
               transcript: Transcript):
        transcript.append_protocol_name(ProductLayerProof.PROTOCOL)
        num_instances = len(evals)

        row_eval_init, row_eval_read, row_eval_write, row_eval_audit = self.eval_row
        if len(row_eval_write) != num_instances or len(row_eval_read) != num_instances:
            raise ProofVerifyError("product layer: wrong instance count")
        ws = rs = 1
        for w in row_eval_write:
            ws = ws * w % Q
        for r in row_eval_read:
            rs = rs * r % Q
        if row_eval_init * ws % Q != rs * row_eval_audit % Q:
            raise ProofVerifyError("row multiset check failed")

        transcript.append_scalar(b"claim_row_eval_init", row_eval_init)
        transcript.append_scalar_vector(b"claim_row_eval_read", row_eval_read)
        transcript.append_scalar_vector(b"claim_row_eval_write", row_eval_write)
        transcript.append_scalar(b"claim_row_eval_audit", row_eval_audit)

        col_eval_init, col_eval_read, col_eval_write, col_eval_audit = self.eval_col
        ws = rs = 1
        for w in col_eval_write:
            ws = ws * w % Q
        for r in col_eval_read:
            rs = rs * r % Q
        if col_eval_init * ws % Q != rs * col_eval_audit % Q:
            raise ProofVerifyError("col multiset check failed")

        transcript.append_scalar(b"claim_col_eval_init", col_eval_init)
        transcript.append_scalar_vector(b"claim_col_eval_read", col_eval_read)
        transcript.append_scalar_vector(b"claim_col_eval_write", col_eval_write)
        transcript.append_scalar(b"claim_col_eval_audit", col_eval_audit)

        eval_dotp_left, eval_dotp_right = self.eval_val
        if (len(eval_dotp_left) != num_instances
                or len(eval_dotp_right) != num_instances):
            raise ProofVerifyError("product layer: dotp count")
        claims_dotp_circuit = []
        for i in range(num_instances):
            if (eval_dotp_left[i] + eval_dotp_right[i]) % Q != evals[i] % Q:
                raise ProofVerifyError("dotp split mismatch")
            transcript.append_scalar(b"claim_eval_dotp_left", eval_dotp_left[i])
            transcript.append_scalar(b"claim_eval_dotp_right", eval_dotp_right[i])
            claims_dotp_circuit += [eval_dotp_left[i], eval_dotp_right[i]]

        claims_prod_circuit = (
            list(row_eval_read) + list(row_eval_write)
            + list(col_eval_read) + list(col_eval_write))

        claims_ops, claims_dotp, rand_ops = self.proof_ops.verify(
            claims_prod_circuit, claims_dotp_circuit, num_ops, transcript)
        claims_mem, _, rand_mem = self.proof_mem.verify(
            [row_eval_init, row_eval_audit, col_eval_init, col_eval_audit],
            [], num_cells, transcript)
        return claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops


@dataclass
class HashLayerProof:
    eval_row: tuple  # (addr vec, read_ts vec, audit_ts)
    eval_col: tuple
    eval_val: list
    eval_derefs: tuple  # (row_ops_val vec, col_ops_val vec)
    proof_ops: PolyEvalProof
    proof_mem: PolyEvalProof
    proof_derefs: "DerefsEvalProof"

    PROTOCOL = b"Sparse polynomial hash layer proof"

    @staticmethod
    def prove(rand: tuple, dense_rep: MultiSparseMatPolynomialAsDense,
              derefs: Derefs, gens: SparseMatPolyCommitmentGens,
              transcript: Transcript, tape: RandomTape) -> "HashLayerProof":
        transcript.append_protocol_name(HashLayerProof.PROTOCOL)
        rand_mem, rand_ops = rand

        # ALL ops-point evaluations in one kernel + one fetch (every
        # separate fetch is a relay round-trip), then the two mem-point
        # (audit) evaluations in a second one.
        groups = [derefs.row_ops_val, derefs.col_ops_val,
                  dense_rep.row.ops_addr, dense_rep.row.read_ts,
                  dense_rep.col.ops_addr, dense_rep.col.read_ts,
                  dense_rep.val]
        all_ops = _evaluate_batched(jnp.concatenate(groups, axis=0), rand_ops)
        sizes = [g.shape[0] for g in groups]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        (eval_row_ops_val, eval_col_ops_val, eval_row_addr,
         eval_row_read_ts, eval_col_addr, eval_col_read_ts, eval_val) = (
            all_ops[offs[i] : offs[i + 1]] for i in range(7))
        eval_row_audit_ts, eval_col_audit_ts = _evaluate_batched(
            jnp.stack([dense_rep.row.audit_ts, dense_rep.col.audit_ts]),
            rand_mem)

        proof_derefs = DerefsEvalProof.prove(
            derefs, eval_row_ops_val, eval_col_ops_val, rand_ops,
            gens.gens_derefs, transcript, tape)

        evals_ops = (list(eval_row_addr) + list(eval_row_read_ts)
                     + list(eval_col_addr) + list(eval_col_read_ts)
                     + list(eval_val))
        evals_ops += [0] * (_next_pow2(len(evals_ops)) - len(evals_ops))
        transcript.append_scalar_vector(b"claim_evals_ops", evals_ops)
        challenges_ops = transcript.challenge_vector(
            b"challenge_combine_n_to_one", _log2(len(evals_ops)))
        joint_claim_eval_ops = _fold_bot_host(evals_ops, challenges_ops)
        r_joint_ops = challenges_ops + list(rand_ops)
        transcript.append_scalar(b"joint_claim_eval_ops", joint_claim_eval_ops)
        proof_ops, _ = PolyEvalProof.prove(
            dense_rep.comb_ops, None, r_joint_ops, joint_claim_eval_ops,
            None, gens.gens_ops, transcript, tape)

        evals_mem = [eval_row_audit_ts, eval_col_audit_ts]
        transcript.append_scalar_vector(b"claim_evals_mem", evals_mem)
        challenges_mem = transcript.challenge_vector(
            b"challenge_combine_two_to_one", 1)
        joint_claim_eval_mem = _fold_bot_host(evals_mem, challenges_mem)
        r_joint_mem = challenges_mem + list(rand_mem)
        transcript.append_scalar(b"joint_claim_eval_mem", joint_claim_eval_mem)
        proof_mem, _ = PolyEvalProof.prove(
            dense_rep.comb_mem, None, r_joint_mem, joint_claim_eval_mem,
            None, gens.gens_mem, transcript, tape)

        return HashLayerProof(
            (eval_row_addr, eval_row_read_ts, eval_row_audit_ts),
            (eval_col_addr, eval_col_read_ts, eval_col_audit_ts),
            eval_val,
            (eval_row_ops_val, eval_col_ops_val),
            proof_ops, proof_mem, proof_derefs,
        )

    @staticmethod
    def _verify_helper(rand, claims, eval_ops_val, eval_ops_addr,
                       eval_read_ts, eval_audit_ts, r, r_hash, r_ms):
        rand_mem, _rand_ops = rand
        claim_init, claim_read, claim_write, claim_audit = claims
        r2 = r_hash * r_hash % Q

        def hash_func(a, v, t):
            return (t * r2 + v * r_hash + a) % Q

        eval_init_addr = 0
        for i, ri in enumerate(rand_mem):
            eval_init_addr = (
                eval_init_addr + (1 << (len(rand_mem) - i - 1)) * ri) % Q
        eval_init_val = 1
        for a, b in zip(r, rand_mem):
            eval_init_val = eval_init_val * (a * b + (1 - a) * (1 - b)) % Q
        if (hash_func(eval_init_addr, eval_init_val, 0) - r_ms) % Q != claim_init % Q:
            raise ProofVerifyError("hash layer: init claim")
        for i in range(len(eval_ops_addr)):
            if ((hash_func(eval_ops_addr[i], eval_ops_val[i], eval_read_ts[i])
                 - r_ms) % Q != claim_read[i] % Q):
                raise ProofVerifyError("hash layer: read claim")
            if ((hash_func(eval_ops_addr[i], eval_ops_val[i],
                           (eval_read_ts[i] + 1) % Q) - r_ms) % Q
                    != claim_write[i] % Q):
                raise ProofVerifyError("hash layer: write claim")
        if ((hash_func(eval_init_addr, eval_init_val, eval_audit_ts) - r_ms)
                % Q != claim_audit % Q):
            raise ProofVerifyError("hash layer: audit claim")

    def verify(self, rand, claims_row, claims_col, claims_dotp,
               comm: SparseMatPolyCommitment, gens: SparseMatPolyCommitmentGens,
               comm_derefs: DerefsCommitment, rx, ry, r_hash, r_ms,
               transcript: Transcript):
        transcript.append_protocol_name(HashLayerProof.PROTOCOL)
        rand_mem, rand_ops = rand

        eval_row_ops_val, eval_col_ops_val = self.eval_derefs
        if len(eval_row_ops_val) != len(eval_col_ops_val):
            raise ProofVerifyError("hash layer: derefs eval count")
        self.proof_derefs.verify(
            rand_ops, eval_row_ops_val, eval_col_ops_val,
            gens.gens_derefs, comm_derefs, transcript)

        if (len(claims_dotp) != 3 * len(eval_row_ops_val)
                or len(self.eval_val) < len(eval_row_ops_val)):
            raise ProofVerifyError("hash layer: dotp claim count")
        for i in range(len(claims_dotp) // 3):
            if (claims_dotp[3 * i] % Q != eval_row_ops_val[i] % Q
                    or claims_dotp[3 * i + 1] % Q != eval_col_ops_val[i] % Q
                    or claims_dotp[3 * i + 2] % Q != self.eval_val[i] % Q):
                raise ProofVerifyError("hash layer: dotp claims mismatch")

        eval_row_addr, eval_row_read_ts, eval_row_audit_ts = self.eval_row
        eval_col_addr, eval_col_read_ts, eval_col_audit_ts = self.eval_col

        evals_ops = (list(eval_row_addr) + list(eval_row_read_ts)
                     + list(eval_col_addr) + list(eval_col_read_ts)
                     + list(self.eval_val))
        evals_ops += [0] * (_next_pow2(len(evals_ops)) - len(evals_ops))
        transcript.append_scalar_vector(b"claim_evals_ops", evals_ops)
        challenges_ops = transcript.challenge_vector(
            b"challenge_combine_n_to_one", _log2(len(evals_ops)))
        joint_claim_eval_ops = _fold_bot_host(evals_ops, challenges_ops)
        r_joint_ops = challenges_ops + list(rand_ops)
        transcript.append_scalar(b"joint_claim_eval_ops", joint_claim_eval_ops)
        self.proof_ops.verify_plain(
            gens.gens_ops, transcript, r_joint_ops, joint_claim_eval_ops,
            comm.comm_comb_ops)

        evals_mem = [eval_row_audit_ts, eval_col_audit_ts]
        transcript.append_scalar_vector(b"claim_evals_mem", evals_mem)
        challenges_mem = transcript.challenge_vector(
            b"challenge_combine_two_to_one", 1)
        joint_claim_eval_mem = _fold_bot_host(evals_mem, challenges_mem)
        r_joint_mem = challenges_mem + list(rand_mem)
        transcript.append_scalar(b"joint_claim_eval_mem", joint_claim_eval_mem)
        self.proof_mem.verify_plain(
            gens.gens_mem, transcript, r_joint_mem, joint_claim_eval_mem,
            comm.comm_comb_mem)

        HashLayerProof._verify_helper(
            (rand_mem, rand_ops), claims_row, eval_row_ops_val,
            eval_row_addr, eval_row_read_ts, eval_row_audit_ts, rx,
            r_hash, r_ms)
        HashLayerProof._verify_helper(
            (rand_mem, rand_ops), claims_col, eval_col_ops_val,
            eval_col_addr, eval_col_read_ts, eval_col_audit_ts, ry,
            r_hash, r_ms)


@dataclass
class DerefsEvalProof:
    """sparse_mlpoly.rs:70-204."""

    proof_derefs: PolyEvalProof

    PROTOCOL = b"Derefs evaluation proof"

    @staticmethod
    def prove(derefs: Derefs, eval_row_ops_val, eval_col_ops_val, r,
              gens: PolyCommitmentGens, transcript: Transcript,
              tape: RandomTape) -> "DerefsEvalProof":
        transcript.append_protocol_name(DerefsEvalProof.PROTOCOL)
        evals = list(eval_row_ops_val) + list(eval_col_ops_val)
        evals += [0] * (_next_pow2(len(evals)) - len(evals))

        transcript.append_scalar_vector(b"evals_ops_val", evals)
        challenges = transcript.challenge_vector(
            b"challenge_combine_n_to_one", _log2(len(evals)))
        joint_claim_eval = _fold_bot_host(evals, challenges)
        r_joint = challenges + list(r)
        transcript.append_scalar(b"joint_claim_eval", joint_claim_eval)
        proof, _ = PolyEvalProof.prove(
            derefs.comb, None, r_joint, joint_claim_eval, None, gens,
            transcript, tape)
        return DerefsEvalProof(proof)

    def verify(self, r, eval_row_ops_val, eval_col_ops_val,
               gens: PolyCommitmentGens, comm: DerefsCommitment,
               transcript: Transcript):
        transcript.append_protocol_name(DerefsEvalProof.PROTOCOL)
        evals = list(eval_row_ops_val) + list(eval_col_ops_val)
        evals += [0] * (_next_pow2(len(evals)) - len(evals))
        transcript.append_scalar_vector(b"evals_ops_val", evals)
        challenges = transcript.challenge_vector(
            b"challenge_combine_n_to_one", _log2(len(evals)))
        joint_claim_eval = _fold_bot_host(evals, challenges)
        r_joint = challenges + list(r)
        transcript.append_scalar(b"joint_claim_eval", joint_claim_eval)
        self.proof_derefs.verify_plain(
            gens, transcript, r_joint, joint_claim_eval, comm.comm_ops_val)


@dataclass
class PolyEvalNetworkProof:
    proof_prod_layer: ProductLayerProof
    proof_hash_layer: HashLayerProof

    PROTOCOL = b"Sparse polynomial evaluation proof"

    @staticmethod
    def prove(dense_rep, derefs, mem_rx, mem_ry, r_mem_check, evals,
              gens, transcript, tape) -> "PolyEvalNetworkProof":
        transcript.append_protocol_name(PolyEvalNetworkProof.PROTOCOL)
        row_layers = Layers(mem_rx, dense_rep.row, derefs.row_ops_val,
                            r_mem_check)
        col_layers = Layers(mem_ry, dense_rep.col, derefs.col_ops_val,
                            r_mem_check)
        proof_prod_layer, rand_mem, rand_ops = ProductLayerProof.prove(
            row_layers, col_layers, dense_rep, derefs, evals, transcript)
        proof_hash_layer = HashLayerProof.prove(
            (rand_mem, rand_ops), dense_rep, derefs, gens, transcript, tape)
        return PolyEvalNetworkProof(proof_prod_layer, proof_hash_layer)

    def verify(self, comm, comm_derefs, evals, gens, rx, ry, r_mem_check,
               nz: int, transcript: Transcript):
        transcript.append_protocol_name(PolyEvalNetworkProof.PROTOCOL)
        num_instances = len(evals)
        r_hash, r_ms = r_mem_check
        num_ops = _next_pow2(nz)
        num_cells = 1 << len(rx)
        if len(rx) != len(ry):
            raise ProofVerifyError("eval network: unequal rx/ry")

        claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops = (
            self.proof_prod_layer.verify(num_ops, num_cells, evals, transcript))
        if (len(claims_mem) != 4 or len(claims_ops) != 4 * num_instances
                or len(claims_dotp) != 3 * num_instances):
            raise ProofVerifyError("eval network: claim counts")

        claims_ops_row_read = claims_ops[:num_instances]
        claims_ops_row_write = claims_ops[num_instances:2 * num_instances]
        claims_ops_col_read = claims_ops[2 * num_instances:3 * num_instances]
        claims_ops_col_write = claims_ops[3 * num_instances:]

        self.proof_hash_layer.verify(
            (rand_mem, rand_ops),
            (claims_mem[0], claims_ops_row_read, claims_ops_row_write,
             claims_mem[1]),
            (claims_mem[2], claims_ops_col_read, claims_ops_col_write,
             claims_mem[3]),
            claims_dotp, comm, gens, comm_derefs, rx, ry, r_hash, r_ms,
            transcript)


def _equalize(rx: list[int], ry: list[int]):
    """sparse_mlpoly.rs:1429-1445: zero-PREFIX the shorter point."""
    if len(rx) < len(ry):
        return [0] * (len(ry) - len(rx)) + list(rx), list(ry)
    if len(rx) > len(ry):
        return list(rx), [0] * (len(rx) - len(ry)) + list(ry)
    return list(rx), list(ry)


@dataclass
class SparseMatPolyEvalProof:
    """sparse_mlpoly.rs:1418-1553."""

    comm_derefs: DerefsCommitment
    poly_eval_network_proof: PolyEvalNetworkProof

    PROTOCOL = b"Sparse polynomial evaluation proof"

    @staticmethod
    def prove(dense_rep: MultiSparseMatPolynomialAsDense, rx, ry,
              evals: list[int], gens: SparseMatPolyCommitmentGens,
              transcript: Transcript, tape: RandomTape):
        from ..ff import limb as _limb

        transcript.append_protocol_name(SparseMatPolyEvalProof.PROTOCOL)
        assert len(evals) == dense_rep.batch_size

        # Scope the loop-form limb muls over the whole Spark prove: its
        # kernels run INSTANCE-BATCHED (B..4B+2B, n, 16) tables, where
        # the unrolled mul's ~22 live accumulator copies exceed HBM at
        # 2^20 shapes (35.7 G compile-time OOM, attempt-3 log).  The
        # single-batch ZK phases keep the unrolled form — the loop
        # graphs there OOM-killed the relay's compile helper.
        with _limb.mul_impl_override("loop"):
            rx_ext, ry_ext = _equalize(rx, ry)
            mem_rx = dense.eq_evals(rx_ext)
            mem_ry = dense.eq_evals(ry_ext)
            derefs = dense_rep.deref(mem_rx, mem_ry)

            t_commit = Timer("commit_nondet_witness")
            comm_derefs = derefs.commit(gens.gens_derefs)
            comm_derefs.append_to_transcript(
                b"comm_poly_row_col_ops_val", transcript)
            t_commit.stop()

            r_mem_check = transcript.challenge_vector(
                b"challenge_r_hash", 2)
            t_net = Timer("build_layered_network+evalproof_layered_network")
            proof = PolyEvalNetworkProof.prove(
                dense_rep, derefs, mem_rx, mem_ry,
                (r_mem_check[0], r_mem_check[1]), evals, gens,
                transcript, tape)
            t_net.stop()
        return SparseMatPolyEvalProof(comm_derefs, proof)

    def verify(self, comm: SparseMatPolyCommitment, rx, ry,
               evals: list[int], gens: SparseMatPolyCommitmentGens,
               transcript: Transcript):
        transcript.append_protocol_name(SparseMatPolyEvalProof.PROTOCOL)
        rx_ext, ry_ext = _equalize(rx, ry)
        nz, num_mem_cells = comm.num_ops, comm.num_mem_cells
        if (1 << len(rx_ext)) != num_mem_cells:
            raise ProofVerifyError("sparse eval: point/commitment size")

        self.comm_derefs.append_to_transcript(
            b"comm_poly_row_col_ops_val", transcript)
        r_mem_check = transcript.challenge_vector(b"challenge_r_hash", 2)
        self.poly_eval_network_proof.verify(
            comm, self.comm_derefs, evals, gens, rx_ext, ry_ext,
            (r_mem_check[0], r_mem_check[1]), nz, transcript)
