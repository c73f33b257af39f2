"""custrings_tpu — a TPU-native columnar string engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of RAPIDS cuStrings
(nvstrings / nvcategory / nvtext).  Strings live as flat Arrow-style tensors
(bytes + offsets + validity) sharded over TPU meshes; every operator is a
jit-compiled data-parallel program instead of a one-thread-per-string kernel.

Public modules (mirroring the reference's Python surface):
    custrings_tpu.nvstrings   vectorized string ops
    custrings_tpu.nvcategory  string dictionary encoding
    custrings_tpu.nvtext      token-level utilities
"""

from .column import StringColumn  # noqa: F401

__version__ = "0.1.0"
