"""R1CS shape and sparse-matrix kernels (reference src/r1cs.rs and the
SpMV pieces of src/sparse_mlpoly.rs:330-504).

Matrices are COO on device: int32 row/col index vectors plus an
(nnz, 16) Montgomery value table.  SpMV and its transpose are
gather -> batched field mul -> scatter-add with per-limb uint32
accumulators (safe for < 2^16 entries per output cell, asserted) and a
single wide modular reduction — the TPU replacement for the
sequential fold in multiply_vec (sparse_mlpoly.rs:454-464).
"""

from __future__ import annotations

import struct

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ..core.field import Q
from ..ff import fq, limb
from ..poly import dense
from ..utils.errors import R1CSError


class SparseMatPolynomial:
    """COO sparse multilinear matrix polynomial."""

    def __init__(self, num_vars_x: int, num_vars_y: int,
                 rows: np.ndarray, cols: np.ndarray, vals_mont: jnp.ndarray,
                 vals_ints: list[int] | None = None):
        self.num_vars_x = num_vars_x
        self.num_vars_y = num_vars_y
        self.rows = jnp.asarray(rows, dtype=jnp.int32)
        self.cols = jnp.asarray(cols, dtype=jnp.int32)
        self.vals = vals_mont  # (nnz, 16) Montgomery
        self._rows_np = np.asarray(rows, dtype=np.int64)
        self._cols_np = np.asarray(cols, dtype=np.int64)
        self._vals_ints = vals_ints
        self._rows_br = None  # lazy bit-reversed index vectors (device)
        self._cols_br = None

    @property
    def rows_br(self) -> jnp.ndarray:
        """Row indices bit-reversed within num_vars_x bits — scattering
        or gathering with these produces/consumes tables in the
        bit-reversed layout of the shape-stable sumcheck rounds, at
        zero device cost (the permutation is folded into the constant
        index vector on the host)."""
        if self._rows_br is None:
            perm = dense.bitrev_perm(self.num_vars_x)
            self._rows_br = jnp.asarray(perm[self._rows_np], dtype=jnp.int32)
        return self._rows_br

    @property
    def cols_br(self) -> jnp.ndarray:
        if self._cols_br is None:
            perm = dense.bitrev_perm(self.num_vars_y)
            self._cols_br = jnp.asarray(perm[self._cols_np], dtype=jnp.int32)
        return self._cols_br

    @staticmethod
    def from_entries(num_vars_x: int, num_vars_y: int,
                     entries: list[tuple[int, int, int]]) -> "SparseMatPolynomial":
        rows = np.array([e[0] for e in entries], dtype=np.int64)
        cols = np.array([e[1] for e in entries], dtype=np.int64)
        vals = [e[2] % Q for e in entries]
        return SparseMatPolynomial(
            num_vars_x, num_vars_y, rows, cols, dense.from_ints(vals), vals)

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    def get_num_nz_entries(self) -> int:
        n = max(self.nnz, 1)
        return 1 << (n - 1).bit_length()

    def entries_ints(self) -> list[tuple[int, int, int]]:
        if self._vals_ints is None:
            self._vals_ints = fq.decode_to_ints(self.vals)
        return list(zip(self._rows_np.tolist(), self._cols_np.tolist(),
                        self._vals_ints))

    # -- kernels ------------------------------------------------------------

    def multiply_vec(self, num_rows: int, num_cols: int,
                     z: jnp.ndarray, bitrev: bool = False) -> jnp.ndarray:
        """Az: (num_rows, 16) Montgomery (sparse_mlpoly.rs:454-464).
        bitrev=True: z is in bit-reversed layout and the output is
        produced bit-reversed (both permutations live in the constant
        index vectors; the kernel is unchanged)."""
        assert z.shape[0] == num_cols
        if bitrev:
            return _spmv(self.rows_br, self.cols_br, self.vals, z, num_rows)
        return _spmv(self.rows, self.cols, self.vals, z, num_rows)

    def compute_eval_table_sparse(self, rx: jnp.ndarray, num_rows: int,
                                  num_cols: int,
                                  bitrev: bool = False) -> jnp.ndarray:
        """M_evals[col] += rx[row] * val (sparse_mlpoly.rs:466-480).
        bitrev=True: rx stays normal-layout; only the output table is
        produced bit-reversed."""
        assert rx.shape[0] == num_rows
        if bitrev:
            return _spmv(self.cols_br, self.rows, self.vals, rx, num_cols)
        return _spmv(self.cols, self.rows, self.vals, rx, num_cols)

    def evaluate_with_tables(self, eq_rx: jnp.ndarray,
                             eq_ry: jnp.ndarray) -> int:
        prod = fq.mul(fq.mul(eq_rx[self.rows], eq_ry[self.cols]), self.vals)
        return fq.decode_to_ints(fq.sum_mod(prod, axis=0)[None])[0]

    def vals_mont_bytes(self) -> bytes:
        """The (nnz, 16) Montgomery limb table as nnz 32-byte LE
        entries (one device->host fetch, cached; no compile)."""
        if getattr(self, "_vals_mont_bytes", None) is None:
            self._vals_mont_bytes = (
                np.asarray(self.vals).astype("<u2").tobytes())
        return self._vals_mont_bytes

    @staticmethod
    def multi_evaluate(polys: list["SparseMatPolynomial"], rx: list[int],
                       ry: list[int]) -> list[int]:
        """The verifier's eval_sparse_polys (r1cs.rs:300-303).

        Default path is HOST-side (native C++ Montgomery batch ops):
        verification is public-data, latency-bound work that should
        never wait on an XLA compile — the fused device formulation
        cost ~100 s of per-process compile at 2^14 on the tunneled TPU
        backend vs milliseconds here.  SPARTAN_TPU_EVAL_SPARSE=device
        selects the fused one-executable device path (useful when the
        tables are already resident and the process is warm)."""
        import os

        from .. import native

        mode = os.environ.get("SPARTAN_TPU_EVAL_SPARSE", "host")
        if mode != "device" and native.available():
            eq_rx = native.fq_eq_evals_mont(rx)
            eq_ry = native.fq_eq_evals_mont(ry)
            return [
                native.fq_sparse_eval(
                    eq_rx, eq_ry, p._rows_np, p._cols_np,
                    p.vals_mont_bytes())
                for p in polys
            ]
        if mode != "device":
            # pure-python fallback (no native toolchain): O(2^ell + nnz)
            eqx = _eq_evals_host_py(rx)
            eqy = _eq_evals_host_py(ry)
            outs = []
            for p in polys:
                total = 0
                for r, c, v in p.entries_ints():
                    total += eqx[r] * eqy[c] % Q * v
                outs.append(total % Q)
            return outs
        rx_m = fq.to_mont(jnp.asarray(fq.encode_ints(rx)))
        ry_m = fq.to_mont(jnp.asarray(fq.encode_ints(ry)))
        outs = _multi_eval_jit(
            tuple((p.rows, p.cols, p.vals) for p in polys),
            rx_m, ry_m, len(rx), len(ry))
        return fq.decode_to_ints(outs)


def _eq_evals_host_py(r: list[int]) -> list[int]:
    """eq(r, x) table with python ints (dense_mlpoly.rs:68-84 order)."""
    tab = [1]
    for rj in r:
        nxt = []
        for t in tab:
            hi = t * rj % Q
            nxt.append((t - hi) % Q)
            nxt.append(hi)
        tab = nxt
    return tab


@partial(jax.jit, static_argnames=("ell_x", "ell_y"))
def _multi_eval_jit(mats, rx_m: jnp.ndarray, ry_m: jnp.ndarray,
                    ell_x: int, ell_y: int) -> jnp.ndarray:
    """Fused eq-table expansion + gather + dot for a batch of sparse
    matrices sharing one (rx, ry) point.  Returns (len(mats), 16)."""
    eq_rx = dense._eq_evals_jit(rx_m, ell_x)
    eq_ry = dense._eq_evals_jit(ry_m, ell_y)
    outs = [
        fq.sum_mod(
            fq.mul(fq.mul(eq_rx[rows], eq_ry[cols]), vals), axis=0)
        for rows, cols, vals in mats
    ]
    return jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnums=4)
def _spmv(out_idx: jnp.ndarray, in_idx: jnp.ndarray, vals: jnp.ndarray,
          z: jnp.ndarray, out_size: int) -> jnp.ndarray:
    prod = fq.mul(vals, z[in_idx])  # (nnz, 16) — limbs < 2^16
    acc = jnp.zeros((out_size, limb.NLIMBS + 2), dtype=jnp.uint32)
    acc = acc.at[out_idx, : limb.NLIMBS].add(prod)
    w = limb.carry_prop(acc)
    return fq.reduce_wide(w)


class R1CSShape:
    """reference r1cs.rs:18-26,86-140."""

    def __init__(self, num_cons: int, num_vars: int, num_inputs: int,
                 A: SparseMatPolynomial, B: SparseMatPolynomial,
                 C: SparseMatPolynomial):
        assert num_cons == _next_pow2(num_cons)
        assert num_vars == _next_pow2(num_vars)
        assert num_inputs < num_vars
        # Scatter-accumulator overflow guard: _spmv sums (nnz,16)
        # products with limbs < 2^16 into per-limb uint32 cells, so any
        # single output cell may receive at most 2^16 contributions.
        # _spmv scatters on rows (multiply_vec) AND on cols
        # (compute_eval_table_sparse), so both axes are bounded.
        for name, m in (("A", A), ("B", B), ("C", C)):
            if m.nnz == 0:
                continue
            for axis, idx in (("row", m._rows_np), ("col", m._cols_np)):
                heaviest = int(np.bincount(idx).max())
                if heaviest >= (1 << 16):
                    raise R1CSError(
                        f"matrix {name}: {heaviest} entries share one "
                        f"{axis} (max {(1 << 16) - 1}); the SpMV "
                        "accumulator would overflow"
                    )
        self.num_cons = num_cons
        self.num_vars = num_vars
        self.num_inputs = num_inputs
        self.A, self.B, self.C = A, B, C

    @staticmethod
    def create(num_cons: int, num_vars: int, num_inputs: int,
               A: list, B: list, C: list) -> "R1CSShape":
        npx = _log2(num_cons)
        npy = _log2(2 * num_vars)
        return R1CSShape(
            num_cons, num_vars, num_inputs,
            SparseMatPolynomial.from_entries(npx, npy, A),
            SparseMatPolynomial.from_entries(npx, npy, B),
            SparseMatPolynomial.from_entries(npx, npy, C),
        )

    def get_digest(self) -> bytes:
        """zlib(bincode(shape)) (r1cs.rs:154-158).  bincode layout is
        reproduced field-for-field (u64 LE ints, u64-length-prefixed
        vecs, Scalars as 4xu64 Montgomery limbs, matching the derive on
        ristretto255.rs:198).  The deflate stream comes from the
        vendored miniz (tdefl) compressor — the same family flate2's
        rust_backend (miniz_oxide) ports — because madler zlib emits a
        different stream for every nonempty input (utils/miniz.py)."""
        out = bytearray()
        out += struct.pack("<QQQ", self.num_cons, self.num_vars, self.num_inputs)
        for m in (self.A, self.B, self.C):
            out += struct.pack("<QQ", m.num_vars_x, m.num_vars_y)
            n = m.nnz
            out += struct.pack("<Q", n)
            # Vectorized record build (a python to_bytes loop costs ~a
            # minute at 2^20 nnz): each entry is 8B row ‖ 8B col ‖ 32B
            # Montgomery scalar.  m.vals already holds (v<<256)%Q as
            # 16-bit LE limbs, so the scalar bytes come straight from
            # the limb array; numpy structured dtypes are packed, so
            # tobytes() reproduces the exact byte stream.
            rec = np.empty(n, dtype=[("r", "<u8"), ("c", "<u8"),
                                     ("s", "<u2", (16,))])
            rec["r"] = m._rows_np
            rec["c"] = m._cols_np
            rec["s"] = np.asarray(m.vals).astype("<u2")
            out += rec.tobytes()
        from ..utils import miniz

        return miniz.zlib_stream(bytes(out), 6)

    def multiply_vec(self, z: jnp.ndarray, bitrev: bool = False):
        n, m = self.num_cons, z.shape[0]
        assert m > self.num_vars
        return (
            self.A.multiply_vec(n, m, z, bitrev),
            self.B.multiply_vec(n, m, z, bitrev),
            self.C.multiply_vec(n, m, z, bitrev),
        )

    def compute_eval_table_sparse(self, rx: jnp.ndarray, num_cols: int,
                                  bitrev: bool = False):
        return (
            self.A.compute_eval_table_sparse(
                rx, self.num_cons, num_cols, bitrev),
            self.B.compute_eval_table_sparse(
                rx, self.num_cons, num_cols, bitrev),
            self.C.compute_eval_table_sparse(
                rx, self.num_cons, num_cols, bitrev),
        )

    def evaluate(self, rx: list[int], ry: list[int]) -> tuple[int, int, int]:
        e = SparseMatPolynomial.multi_evaluate([self.A, self.B, self.C], rx, ry)
        return e[0], e[1], e[2]

    def is_sat(self, vars_ints: list[int], input_ints: list[int]) -> bool:
        assert len(vars_ints) == self.num_vars
        assert len(input_ints) == self.num_inputs
        from .. import native

        if native.available():
            # Host path (C++ SpMV): r1cs.rs:240-266 is pure public-data
            # checking — paying a device SpMV compile for it doubled
            # synthetic-instance construction cost on the TPU backend.
            z_ints = list(vars_ints) + [1] + list(input_ints)
            R256 = (1 << 256) % Q
            zb = b"".join((v * R256 % Q).to_bytes(32, "little")
                          for v in z_ints)
            Az, Bz, Cz = (
                native.fq_spmv(m._rows_np, m._cols_np, m.vals_mont_bytes(),
                               zb, self.num_cons)
                for m in (self.A, self.B, self.C))
            return all((a * b - c) % Q == 0
                       for a, b, c in zip(Az, Bz, Cz))
        z = dense.from_ints(list(vars_ints) + [1] + list(input_ints))
        Az, Bz, Cz = self.multiply_vec(z)
        diff = fq.sub(fq.mul(Az, Bz), Cz)
        return bool(np.all(np.asarray(diff) == 0))

    @staticmethod
    def produce_synthetic(num_cons: int, num_vars: int, num_inputs: int,
                          seed: int | None = 0):
        """Synthetic satisfiable instance (r1cs.rs:160-238): one entry
        per row per matrix at rotating columns.  Deterministic for any
        integer seed (including 0 — `seed or None` used to fall
        through to OS entropy, making fixture digests irreproducible);
        pass seed=None explicitly for an OsRng-style instance."""
        import random as _random

        rng = _random.Random(seed)
        size_z = num_vars + num_inputs + 1
        Z = [rng.randrange(Q) for _ in range(size_z)]
        Z[num_vars] = 1
        # batch-invert every z value once (Montgomery trick) instead of
        # num_cons separate pow(-1) calls — same values, ~30x faster at
        # 2^20 rows
        from ..core.field import batch_inv

        nonzero_idx = [i for i, z in enumerate(Z) if z != 0]
        invs = batch_inv([Z[i] for i in nonzero_idx])
        Z_inv = [0] * size_z
        for i, v in zip(nonzero_idx, invs):
            Z_inv[i] = v
        A, B, C = [], [], []
        for i in range(num_cons):
            a_idx = i % size_z
            b_idx = (i + 2) % size_z
            A.append((i, a_idx, 1))
            B.append((i, b_idx, 1))
            ab = Z[a_idx] * Z[b_idx] % Q
            c_idx = (i + 3) % size_z
            if Z[c_idx] == 0:
                C.append((i, num_vars, ab))
            else:
                C.append((i, c_idx, ab * Z_inv[c_idx] % Q))
        inst = R1CSShape.create(num_cons, num_vars, num_inputs, A, B, C)
        assert inst.is_sat(Z[:num_vars], Z[num_vars + 1:])
        return inst, Z[:num_vars], Z[num_vars + 1:]


class SparsePolynomial:
    """Verifier-side sparse multilinear poly for the input vector
    (sparse_mlpoly.rs:1555-1594); host ints, O(#entries log n)."""

    def __init__(self, num_vars: int, entries: list[tuple[int, int]]):
        self.num_vars = num_vars
        self.entries = entries

    def evaluate(self, r: list[int]) -> int:
        assert len(r) == self.num_vars
        total = 0
        for idx, val in self.entries:
            chi = 1
            for j in range(len(r)):
                bit = (idx >> (len(r) - j - 1)) & 1
                chi = chi * (r[j] if bit else (1 - r[j]) % Q) % Q
            total = (total + chi * val) % Q
        return total


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else max(n, 1)


def _log2(n: int) -> int:
    assert n > 0
    return (n - 1).bit_length() if n > 1 else 0
