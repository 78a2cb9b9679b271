"""Finite-field limb kernels for TPU: generic big-int limbs (limb),
the scalar field Fq in Montgomery form (fq), and the coordinate field
Fp25519 with pseudo-Mersenne folding (fp25519)."""

from . import fp25519, fq, limb  # noqa: F401
