"""Extension namespace implementation (`Matrix.ss`, `Vector.ss`, `gb.ss`).

The name `ss` is kept for drop-in API compatibility with the reference's
SuiteSparse extension layer (SURVEY §2 rows 15-22); on this backend it is the
TPU storage/system extension surface: storage formats import/export,
split/concat tiling, selectk/compactify/sort, serialize, per-object config,
and execution Context.
"""
