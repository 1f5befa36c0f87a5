"""Core implementation package.

Enables x64 so INT64/UINT64/FP64/FC64 are exact on device (must happen before
any tracing).  Holds a few process-wide singletons, mirroring the role of
reference graphblas/core/__init__.py (which holds ffi/lib/NULL).
"""

import jax

jax.config.update("jax_enable_x64", True)

# The TPU backend always supports "UDFs" — any traceable Python function.
_supports_udfs = True

# Execution mode singletons, set by graphblas_tpu.init()
_init_params = None
_backend = None
_blocking = None
