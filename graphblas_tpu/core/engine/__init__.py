"""The TPU compute engine.

This package is the replacement for the reference's external
SuiteSparse:GraphBLAS C library (SURVEY §0, §2 row 0): every GraphBLAS
operation — semiring matmuls, element-wise ops, extract/assign, select,
reduce, transpose, kron — is implemented as JAX/XLA (and Pallas, see
kernels/) code over device-resident stores.

Layout:
- store.py    device storage formats (bitmap/dense now; CSR in sparse.py)
- dense.py    bitmap-format kernels (pure jnp, fused under jit)
- sparse.py   CSR kernels incl. Pallas SpMV/SpGEMM
- dispatch.py op-aware dispatch + jit cache: one fused kernel per
              (method, op, mask kind, accum, replace, dtypes) configuration
"""
