"""Pallas TPU kernels for hot semiring operations.

- tropical.py: blocked min_plus/max_plus/min_max dense semiring matmul
  (VPU broadcast-reduce per k-slice, MXU-tile-shaped blocks)
- spmv.py: ELL-format semiring SpMV (row-tile gather + reduce)

Kernels are optional fast paths: dispatch falls back to the pure-XLA lowering
when Pallas is unavailable for the current backend (e.g. CPU tests run the
interpreter or the fallback).
"""
