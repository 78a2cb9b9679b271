"""Device ristretto255 group: batched Edwards kernels, compression,
and the Pippenger sort+scan MSM."""

from . import edwards, msm, ristretto  # noqa: F401
