"""Pallas TPU kernels for the hot display/sampling paths.

Kernels fall back to the XLA implementations transparently when Pallas is
unavailable (CPU tests run them in interpreter mode).
"""

from . import tf1d, tonemap_kernel  # noqa: F401
