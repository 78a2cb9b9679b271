"""Grand-product (GKR-lite) circuits and their batched sumcheck
evaluation proofs (reference src/product_tree.rs).

TPU re-design: the reference keeps every circuit as its own
DensePolynomial and loops over instances inside each sumcheck round
(sumcheck.rs:254-424).  Here all same-shaped instances live in ONE
(B, n, 16) device array — the per-round evaluations for all B circuits
are a single batched kernel, and the per-layer tree build is one
elementwise mul per layer.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.field import Q
from ..core.merlin import Transcript
from ..ff import fq, limb
from ..poly import dense
from ..poly.unipoly import UniPoly
from ..utils.errors import ProofVerifyError
from .sumcheck import SumcheckInstanceProof, _r_mont


def _to_ints(x: jnp.ndarray) -> list[int]:
    return fq.decode_to_ints(x)


@partial(jax.jit, static_argnums=3)
def _evals_cubic_batched(A: jnp.ndarray, B: jnp.ndarray, C: jnp.ndarray,
                         sum_fn=None):
    """Per-instance round evals at {0,2,3} of sum_i A[b,i]*B[b,i]*C[b,i].
    All inputs (B, n, 16); returns three (B, 16) arrays.  sum_fn
    overrides the per-instance reduction (the sharded path passes a
    psum-reducing variant; parallel/mesh.py)."""
    n = A.shape[1] // 2
    if sum_fn is None:
        def sum_fn(x):
            return fq.sum_mod(x, axis=1)

    def comb(a, b, c):
        return fq.mul(fq.mul(a, b), c)

    lo = [X[:, :n] for X in (A, B, C)]
    hi = [X[:, n:] for X in (A, B, C)]
    e0 = sum_fn(comb(*lo))
    p2 = [fq.sub(fq.add(h, h), l) for h, l in zip(hi, lo)]
    e2 = sum_fn(comb(*p2))
    p3 = [fq.add(x2, fq.sub(h, l)) for x2, h, l in zip(p2, hi, lo)]
    e3 = sum_fn(comb(*p3))
    return e0, e2, e3


@jax.jit
def _bound_var_top_batched(Z: jnp.ndarray, r_m: jnp.ndarray) -> jnp.ndarray:
    n = Z.shape[1] // 2
    lo, hi = Z[:, :n], Z[:, n:]
    return fq.add(lo, fq.mul(r_m, fq.sub(hi, lo)))


def _fuse_rounds() -> bool:
    """Whole-round fused executables (_step3/_evals3_stacked) pay off on
    the tunneled TPU backend — one dispatch + one fetch per round.  On
    the CPU backend the same fused graphs explode LLVM (tens of minutes
    and ~20 GB per shape), so rounds there run the identical math as a
    chain of small cached executables.  Proof bytes are unaffected.
    SPARTAN_TPU_FUSE_ROUNDS=0/1 overrides."""
    import os

    v = os.environ.get("SPARTAN_TPU_FUSE_ROUNDS")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() != "cpu"


@jax.jit
def _evals3_stacked_jit(A, Bt, C):
    return jnp.stack(_evals_cubic_batched(A, Bt, C), axis=0)


def _evals3_stacked(A, Bt, C):
    """Round evals as ONE (3, B, 16) array — a single device->host
    fetch per round instead of three (each fetch is a full relay
    round-trip on the tunneled TPU backend)."""
    if _fuse_rounds():
        return _evals3_stacked_jit(A, Bt, C)
    return jnp.stack(_evals_cubic_batched(A, Bt, C), axis=0)


@jax.jit
def _step3_jit(A, Bt, C, r_m):
    A2 = _bound_var_top_batched(A, r_m)
    Bt2 = _bound_var_top_batched(Bt, r_m)
    C2 = _bound_var_top_batched(C, r_m)
    return A2, Bt2, C2, jnp.stack(_evals_cubic_batched(A2, Bt2, C2), axis=0)


def _step3(A, Bt, C, r_m):
    """Fused fold + next-round evals (one dispatch per round)."""
    if _fuse_rounds():
        return _step3_jit(A, Bt, C, r_m)
    A2, Bt2, C2 = _fold3(A, Bt, C, r_m)
    return A2, Bt2, C2, _evals3_stacked(A2, Bt2, C2)


def _fold3(A, Bt, C, r_m):
    return (_bound_var_top_batched(A, r_m), _bound_var_top_batched(Bt, r_m),
            _bound_var_top_batched(C, r_m))


def _decode3(ev: jnp.ndarray) -> tuple[list[int], list[int], list[int]]:
    """(3, B, 16) -> three length-B int lists with one fetch."""
    b = ev.shape[1]
    flat = fq.decode_to_ints(ev.reshape(3 * b, 16))
    return flat[:b], flat[b : 2 * b], flat[2 * b :]


# -- bit-reversed-layout layer machinery -------------------------------------
#
# Mirror of sumcheck.py's shape-stable rounds for the instance-batched
# product layers: with every layer table stored at BIT-REVERSED logical
# indices, (a) the tree build pairs *adjacent* elements (one reshape +
# mul per step), (b) the layer sumcheck's bound-top-variable fold pairs
# adjacent elements, and (c) zero-padding the table is invisible (zero
# leaves multiply to zero; zero lanes contribute comb(0,0,0)=0 to every
# round eval and fold to zero).  Tables therefore keep a padded
# power-of-two shape with a tiered shrink, and ONE compiled executable
# per (batch, tier) shape serves every round of every layer — the
# unstable path compiles one module per (layer, round-size), ~2x
# sum_k log(m_k) modules per proof, which dominates fresh-process
# SNARK::prove latency on the axon TPU backend (no cross-process
# executable cache).  Proof bytes are identical.

_BR_FLOOR = 1 << 14   # pad every smaller layer up to this one shape
_BR_FACTOR = 4        # shrink a tier once live <= shape/4


def _tier_up(n: int) -> int:
    """Snap n up to the {_BR_FLOOR * 2^j} grid: every build step and
    every layer-round executable runs at one of a handful of shapes,
    shared across all layers of all proofs of a given instance size.

    The grid was 4^j through round 4; at SNARK-2^20 shapes the x4
    snap padded the top ops layer from 2^19 to 2^20 width, doubling
    the already-HBM-critical round transients (the (18, 2^19, 16)
    eval comb peaks ~12 G with loop-form muls) — the x2 grid costs a
    few extra build-step compiles and halves that peak."""
    t = _BR_FLOOR
    while t < n:
        t *= 2
    return t


def _pad1(T: jnp.ndarray, n: int) -> jnp.ndarray:
    """Zero-pad axis 1 up to n."""
    cur = T.shape[1]
    if cur >= n:
        return T
    return jnp.concatenate(
        [T, jnp.zeros((T.shape[0], n - cur, 16), dtype=T.dtype)], axis=1)


def _pairs_b(T: jnp.ndarray):
    b, n, _ = T.shape
    T2 = T.reshape(b, n // 2, 2, 16)
    return T2[:, :, 0], T2[:, :, 1]


def _evals3_br(A, Bt, C):
    lo = []
    hi = []
    for T in (A, Bt, C):
        l, h = _pairs_b(T)
        lo.append(l)
        hi.append(h)

    def comb(a, b, c):
        return fq.mul(fq.mul(a, b), c)

    e0 = fq.sum_mod(comb(*lo), axis=1)
    p2 = [fq.sub(fq.add(h, h), l) for h, l in zip(hi, lo)]
    e2 = fq.sum_mod(comb(*p2), axis=1)
    p3 = [fq.add(x2, fq.sub(h, l)) for x2, h, l in zip(p2, hi, lo)]
    e3 = fq.sum_mod(comb(*p3), axis=1)
    return e0, e2, e3


def _fold1_br(T: jnp.ndarray, r_m: jnp.ndarray) -> jnp.ndarray:
    lo, hi = _pairs_b(T)
    f = fq.add(lo, fq.mul(r_m, fq.sub(hi, lo)))
    return jnp.concatenate([f, jnp.zeros_like(f)], axis=1)


@jax.jit
def _evals3_br_jit(A, Bt, C):
    return jnp.stack(_evals3_br(A, Bt, C), axis=0)


@jax.jit
def _step3_br_jit(A, Bt, C, r_m):
    A2, Bt2, C2 = (_fold1_br(T, r_m) for T in (A, Bt, C))
    return A2, Bt2, C2, jnp.stack(_evals3_br(A2, Bt2, C2), axis=0)


@jax.jit
def _fold3_br_jit(A, Bt, C, r_m):
    return tuple(_fold1_br(T, r_m) for T in (A, Bt, C))


# -- one-program round variants (mirror of sumcheck._step_br_io) ------------
#
# Challenge Montgomery-encode, fold, next-round evals and the
# canonical decode of the evals all inside ONE executable, so a layer
# round costs one program invocation + one small d2h fetch instead of
# three invocations + fetch.  Measured round 5 (NIZK phases): the
# relay's per-invocation cost is the width-independent ~0.9 s/round
# floor of the in-prove rounds; Spark runs hundreds of such rounds.

@jax.jit
def _evals3_br_io_jit(A, Bt, C):
    return fq.from_mont(jnp.stack(_evals3_br(A, Bt, C), axis=0))


@jax.jit
def _step3_br_io(A, Bt, C, r_canon):
    r_m = fq.to_mont(r_canon)
    A2, Bt2, C2 = (_fold1_br(T, r_m) for T in (A, Bt, C))
    return A2, Bt2, C2, fq.from_mont(
        jnp.stack(_evals3_br(A2, Bt2, C2), axis=0))


@jax.jit
def _fold3_br_io_jit(A, Bt, C, r_canon):
    r_m = fq.to_mont(r_canon)
    return tuple(_fold1_br(T, r_m) for T in (A, Bt, C))


def _decode3_canon(ev) -> tuple[list[int], list[int], list[int]]:
    """(3, B, 16) canonical limbs -> three length-B int lists, one
    fetch (counted by utils.rt)."""
    import time as _time

    import numpy as _np

    from ..ff import limb as _limb
    from ..utils import rt as _rt

    b = ev.shape[1]
    t0 = _time.perf_counter()
    arr = _np.asarray(ev).reshape(3 * b, 16)
    _rt.record(_time.perf_counter() - t0)
    flat = _limb.limbs_to_ints(arr)
    return flat[:b], flat[b : 2 * b], flat[2 * b :]


def _shrink3(tabs, live: int):
    cur = tabs[0].shape[1]
    if cur <= _BR_FLOOR or live > cur // _BR_FACTOR:
        return tabs
    new = max(_BR_FLOOR, max(live, 2))
    return tuple(T[:, :new] for T in tabs)


@jax.jit
def _build_step_br_jit(cur: jnp.ndarray):
    """One BR tree-build step on a padded table: split adjacent pairs,
    multiply.  Output live = live/2 at padded shape n/2."""
    left, right = _pairs_b(cur)
    return left, right, fq.mul(left, right)


class ProductCircuitBatch:
    """B binary product trees over (B, n) leaf tables
    (product_tree.rs:12-64, instance-batched).

    bitrev=True: ``inputs`` are in bit-reversed index layout (and may
    carry a zero pad beyond ``live``); layers are built adjacent-pair
    and stay bit-reversed, padded at >= _BR_FLOOR, for the shape-stable
    layer rounds.  Roots/evaluations are identical either way."""

    def __init__(self, inputs: jnp.ndarray, bitrev: bool = False,
                 live: int | None = None):
        b, n, _ = inputs.shape
        self.bitrev = bitrev
        if not bitrev:
            assert n & (n - 1) == 0 and n >= 2
            self.num_layers = n.bit_length() - 1
            self.live = [n // 2]
            self.left = [inputs[:, : n // 2]]
            self.right = [inputs[:, n // 2 :]]
            for _ in range(self.num_layers - 1):
                prod = fq.mul(self.left[-1], self.right[-1])
                half = prod.shape[1] // 2
                self.live.append(half)
                self.left.append(prod[:, :half])
                self.right.append(prod[:, half:])
            return
        live = n if live is None else live
        assert live & (live - 1) == 0 and live >= 2
        self.num_layers = live.bit_length() - 1
        cur = inputs
        self.left, self.right, self.live = [], [], []
        while live >= 2:
            # grid-snap the working shape (pad up with zeros / slice
            # down past-the-live-prefix zeros) so _build_step_br_jit
            # compiles at ~4 shapes total
            t = _tier_up(live)
            if cur.shape[1] < t:
                cur = _pad1(cur, t)
            elif cur.shape[1] > t:
                cur = cur[:, :t]
            left, right, prod = _build_step_br_jit(cur)
            self.live.append(live // 2)
            self.left.append(left)
            self.right.append(right)
            cur = prod
            live //= 2

    def evaluate(self) -> list[int]:
        root = fq.mul(self.left[-1][:, 0], self.right[-1][:, 0])
        return _to_ints(root)


class DotProductCircuitBatch:
    """B weighted dot products <L, R . W> (product_tree.rs:66-108)."""

    def __init__(self, left, right, weight):
        self.left, self.right, self.weight = left, right, weight

    def evaluate(self) -> list[int]:
        prod = fq.mul(fq.mul(self.left, self.right), self.weight)
        return _to_ints(fq.sum_mod(prod, axis=1))


@dataclass
class LayerProofBatched:
    proof: SumcheckInstanceProof
    claims_prod_left: list
    claims_prod_right: list


@dataclass
class ProductCircuitEvalProofBatched:
    """product_tree.rs:258-486."""

    proof: list  # LayerProofBatched
    claims_dotp: tuple  # (left, right, weight) final claims

    @staticmethod
    def prove(prod: ProductCircuitBatch,
              dotp: DotProductCircuitBatch | None,
              transcript: Transcript):
        from .sumcheck import _use_device_nonzk, _use_device_prover

        if not prod.bitrev and (_use_device_prover() or _use_device_nonzk()):
            from .device_prover import prove_product_layers_device

            return prove_product_layers_device(prod, dotp, transcript)
        num_prod = prod.left[0].shape[0]
        claims_to_verify = prod.evaluate()
        claims_dotp_final = ([], [], [])
        proof_layers = []
        rand: list[int] = []

        br = prod.bitrev
        for layer_id in range(prod.num_layers - 1, -1, -1):
            A = prod.left[layer_id]
            Bt = prod.right[layer_id]
            m = prod.live[layer_id]
            C_par = dense.eq_evals(rand, bitrev=br)
            assert C_par.shape[0] == m
            num_rounds = m.bit_length() - 1
            pad_n = max(A.shape[1], _BR_FLOOR) if br else m
            if br:
                A = _pad1(A, pad_n)
                Bt = _pad1(Bt, pad_n)

            # The par set's eq-table C and the seq (dotp) set's weight
            # table have the same per-instance length at layer 0, so
            # both sets concatenate along the INSTANCE axis and the
            # whole layer runs as one batched kernel: one dispatch +
            # one fetch per round (sumcheck.rs's par/seq split done
            # data-parallel instead of as two loops).
            has_seq = layer_id == 0 and dotp is not None
            if has_seq:
                claims_to_verify = claims_to_verify + dotp.evaluate()

            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % Q

            # broadcast C across the par batch once per layer
            C_b = jnp.broadcast_to(_pad1(C_par[None], pad_n), A.shape)
            if has_seq:
                dl, dr, dw = dotp.left, dotp.right, dotp.weight
                if br:
                    # the dotp (seq) tables are logical-layout polys:
                    # relayout them once per proof (3 gathers) and pad
                    # to the layer shape
                    perm = jnp.asarray(dense.bitrev_perm(num_rounds))
                    dl = _pad1(jnp.take(dl, perm, axis=1), pad_n)
                    dr = _pad1(jnp.take(dr, perm, axis=1), pad_n)
                    dw = _pad1(jnp.take(dw, perm, axis=1), pad_n)
                A = jnp.concatenate([A, dl], axis=0)
                Bt = jnp.concatenate([Bt, dr], axis=0)
                C_b = jnp.concatenate([C_b, dw], axis=0)
            # hypercube-sharded layer rounds when a mesh is active
            # (SURVEY §2 P3; proof bytes identical to the local path)
            from ..parallel import context as pctx

            mesh = pctx.get_mesh()
            mgr = None
            if not br and mesh is not None and num_rounds:
                from ..parallel.mesh import ShardedProductLayerTables

                mgr = ShardedProductLayerTables(mesh, A, Bt, C_b)

            compressed = []
            e = claim
            r_round: list[int] = []
            live_r = m
            io = br and mgr is None  # one-program rounds (canonical evs)
            if mgr is not None:
                ev = mgr.evals()
            elif br:
                ev = _evals3_br_io_jit(A, Bt, C_b) if num_rounds else None
            else:
                ev = _evals3_stacked(A, Bt, C_b) if num_rounds else None
            for k in range(num_rounds):
                e0v, e2v, e3v = (_decode3_canon(ev) if io
                                 else _decode3(ev))
                e0 = sum(c * v for c, v in zip(coeffs, e0v)) % Q
                e2 = sum(c * v for c, v in zip(coeffs, e2v)) % Q
                e3 = sum(c * v for c, v in zip(coeffs, e3v)) % Q
                poly = UniPoly.from_evals([e0, (e - e0) % Q, e2, e3])
                poly.append_to_transcript(b"poly", transcript)
                r_j = transcript.challenge_scalar(b"challenge_nextround")
                r_round.append(r_j)
                if mgr is not None:
                    rm = _r_mont(r_j)
                    if k + 1 < num_rounds:
                        ev = mgr.step(rm)
                    else:
                        mgr.fold(rm)
                        A, Bt, C_b = mgr.tables
                elif br:
                    r_canon = limb.int_to_limbs(r_j)
                    if k + 1 < num_rounds:
                        A, Bt, C_b, ev = _step3_br_io(A, Bt, C_b, r_canon)
                        live_r //= 2
                        A, Bt, C_b = _shrink3((A, Bt, C_b), live_r)
                    else:
                        A, Bt, C_b = _fold3_br_io_jit(A, Bt, C_b, r_canon)
                elif k + 1 < num_rounds:
                    rm = _r_mont(r_j)
                    A, Bt, C_b, ev = _step3(A, Bt, C_b, rm)
                else:
                    rm = _r_mont(r_j)
                    A, Bt, C_b = _fold3(A, Bt, C_b, rm)
                e = poly.evaluate(r_j)
                compressed.append(poly.compress())

            # all end-of-layer claims in ONE fetch
            finals = fq.decode_to_ints(jnp.concatenate(
                [A[:, 0], Bt[:, 0], C_b[num_prod:, 0]], axis=0))
            ntot = A.shape[0]
            claims_prod_left = finals[:num_prod]
            claims_prod_right = finals[ntot : ntot + num_prod]
            for i in range(num_prod):
                transcript.append_scalar(b"claim_prod_left", claims_prod_left[i])
                transcript.append_scalar(b"claim_prod_right", claims_prod_right[i])

            if has_seq:
                dl = finals[num_prod:ntot]
                dr = finals[ntot + num_prod : 2 * ntot]
                dw = finals[2 * ntot :]
                for i in range(len(dl)):
                    transcript.append_scalar(b"claim_dotp_left", dl[i])
                    transcript.append_scalar(b"claim_dotp_right", dr[i])
                    transcript.append_scalar(b"claim_dotp_weight", dw[i])
                claims_dotp_final = (dl, dr, dw)

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (l + r_layer * (r - l)) % Q
                for l, r in zip(claims_prod_left, claims_prod_right)
            ]
            rand = [r_layer] + r_round
            proof_layers.append(LayerProofBatched(
                SumcheckInstanceProof(compressed),
                claims_prod_left, claims_prod_right))

        return (ProductCircuitEvalProofBatched(proof_layers, claims_dotp_final),
                rand)

    def verify(self, claims_prod_vec: list[int], claims_dotp_vec: list[int],
               n_leaves: int, transcript: Transcript):
        """product_tree.rs:385-486.  Returns (claims_prod, claims_dotp,
        rand)."""
        num_layers = n_leaves.bit_length() - 1
        if len(self.proof) != num_layers:
            raise ProofVerifyError("product proof: wrong layer count")
        rand: list[int] = []
        claims_to_verify = list(claims_prod_vec)
        claims_to_verify_dotp: list[int] = []
        for num_rounds, i in enumerate(range(num_layers)):
            if i == num_layers - 1:
                claims_to_verify = claims_to_verify + list(claims_dotp_vec)

            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % Q
            claim_last, rand_prod = self.proof[i].proof.verify(
                claim, num_rounds, 3, transcript)

            claims_prod_left = self.proof[i].claims_prod_left
            claims_prod_right = self.proof[i].claims_prod_right
            if (len(claims_prod_left) != len(claims_prod_vec)
                    or len(claims_prod_right) != len(claims_prod_vec)):
                raise ProofVerifyError("product proof: claim count")

            for k in range(len(claims_prod_vec)):
                transcript.append_scalar(b"claim_prod_left", claims_prod_left[k])
                transcript.append_scalar(b"claim_prod_right", claims_prod_right[k])

            if len(rand) != len(rand_prod):
                raise ProofVerifyError("product proof: round count")
            eq = 1
            for a, b in zip(rand, rand_prod):
                eq = eq * (a * b + (1 - a) * (1 - b)) % Q
            claim_expected = sum(
                coeffs[k] * (claims_prod_left[k] * claims_prod_right[k] % Q)
                % Q * eq for k in range(len(claims_prod_vec))) % Q

            if i == num_layers - 1:
                num_prod = len(claims_prod_vec)
                dl, dr, dw = self.claims_dotp
                for k in range(len(dl)):
                    transcript.append_scalar(b"claim_dotp_left", dl[k])
                    transcript.append_scalar(b"claim_dotp_right", dr[k])
                    transcript.append_scalar(b"claim_dotp_weight", dw[k])
                    claim_expected = (
                        claim_expected
                        + coeffs[k + num_prod] * dl[k] % Q * dr[k] % Q * dw[k]
                    ) % Q

            if claim_expected != claim_last:
                raise ProofVerifyError("product layer claim mismatch")

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (l + r_layer * (r - l)) % Q
                for l, r in zip(claims_prod_left, claims_prod_right)
            ]
            if i == num_layers - 1:
                dl, dr, dw = self.claims_dotp
                for k in range(len(claims_dotp_vec) // 2):
                    claims_to_verify_dotp.append(
                        (dl[2 * k] + r_layer * (dl[2 * k + 1] - dl[2 * k])) % Q)
                    claims_to_verify_dotp.append(
                        (dr[2 * k] + r_layer * (dr[2 * k + 1] - dr[2 * k])) % Q)
                    claims_to_verify_dotp.append(
                        (dw[2 * k] + r_layer * (dw[2 * k + 1] - dw[2 * k])) % Q)

            rand = [r_layer] + rand_prod
        return claims_to_verify, claims_to_verify_dotp, rand
