"""Pure, vectorized per-batch kernels (no Ray dependency).

These are the scalar/batch functions of SURVEY §2.2 re-expressed as
numpy/pyarrow kernels: tokenize+shingle (M1), rolling hash (M2),
content hash (M3), cheap 64-bit mixing (M5), plus the new signature
math (MinHash / SimHash / LSH bands / Jaccard / winnowing) the
north_rule adds.  Everything here is deterministic and seedable.
"""
