"""Active-mesh context: the switch that turns the single-chip prover
into a sharded one.

The reference is a single-process library; its one parallel site is a
rayon loop over commitment rows (dense_mlpoly.rs:148-162).  Here the
analogous knob is a process-wide device mesh: when one is active, the
witness-commitment MSM runs row-block data-parallel across the mesh
and the sumcheck round loops run on trailing-bit-sharded tables with
mod-q psum round reductions (parallel/mesh.py).  Proof bytes are
bit-identical with and without a mesh (tested in
tests/test_sharded_prover.py) — sharding is a pure execution-layout
choice, never a protocol change.

Usage:
    from spartan_tpu.parallel import context as pctx
    with pctx.use_mesh(pctx.default_mesh()):
        proof = NIZK.prove(...)
"""

from __future__ import annotations

from contextlib import contextmanager

_ACTIVE = None


def set_mesh(mesh) -> None:
    global _ACTIVE
    _ACTIVE = mesh


def get_mesh():
    """The active mesh, or None.  Meshes with a single device are
    treated as inactive (sharding would be pure overhead)."""
    if _ACTIVE is not None and _ACTIVE.size <= 1:
        return None
    return _ACTIVE


@contextmanager
def use_mesh(mesh):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev


def default_mesh():
    """A 1-D mesh over every visible device."""
    from .mesh import make_mesh

    return make_mesh()
