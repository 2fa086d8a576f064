"""Element-wise matrix maps and sparsity-pattern conversion
(reference Source/Fortran/MatrixMapsModule.F90:39-438 and
MatrixConversionModule.F90:21-63).

The reference routes every element through a user callback (SWIG directors
RealOperation/ComplexOperation, Source/CPlusPlus/MatrixMapper.h:13-45) with
slice-round-robin work division.  Here the callback runs on the host over
the triplet arrays; a vectorized fast path is used when the operation
provides one.
"""
from __future__ import annotations

import numpy as np

from ..parallel import pmatrix as PM


class Triplet:
    __slots__ = ("index_row", "index_column", "point_value")

    def __init__(self, row=0, col=0, val=0.0):
        self.index_row = row
        self.index_column = col
        self.point_value = val


class RealOperation:
    """Subclass and override __call__(); ``self.data`` holds the current
    Triplet; return False to drop the element (reference MatrixMapper.h)."""

    def __init__(self):
        self.data = Triplet()

    def __call__(self) -> bool:
        return True


ComplexOperation = type("ComplexOperation", (RealOperation,), {})


def map_matrix(mat: PM.PSMatrix, op) -> PM.PSMatrix:
    """Apply op to every stored element (reference MapMatrix_psr/psc)."""
    rows, cols, vals = PM.to_triplets(mat)
    out_r, out_c, out_v = [], [], []
    for r, c, v in zip(rows, cols, vals):
        op.data.index_row = int(r) + 1       # reference indices are 1-based
        op.data.index_column = int(c) + 1
        op.data.point_value = v
        if op():
            out_r.append(op.data.index_row - 1)
            out_c.append(op.data.index_column - 1)
            out_v.append(op.data.point_value)
    out = PM.empty(mat.dim, bs=mat.bs, k=mat.k, dtype=mat.dtype,
                   grid=mat.grid)
    return PM.fill_from_triplets(
        out, np.asarray(out_r, np.int64), np.asarray(out_c, np.int64),
        np.asarray(out_v, mat.dtype))


def map_triplets(mat: PM.PSMatrix, fn) -> PM.PSMatrix:
    """Vectorized map: fn(rows, cols, vals) -> (rows, cols, vals) or
    (rows, cols, vals, keep_mask).  The TPU-native fast path."""
    rows, cols, vals = PM.to_triplets(mat)
    result = fn(rows, cols, vals)
    if len(result) == 4:
        r, c, v, keep = result
        r, c, v = r[keep], c[keep], v[keep]
    else:
        r, c, v = result
    out = PM.empty(mat.dim, bs=mat.bs, k=mat.k, dtype=mat.dtype,
                   grid=mat.grid)
    return PM.fill_from_triplets(out, r, c, v)


def snap_to_sparsity_pattern(mat: PM.PSMatrix,
                             pattern: PM.PSMatrix) -> PM.PSMatrix:
    """Force ``mat`` onto ``pattern``'s sparsity (explicit zeros added,
    off-pattern entries dropped) — reference SnapMatrixToSparsityPattern
    (MatrixConversionModule.F90:21-63) for fixed-pattern interop."""
    pr, pc, _ = PM.to_triplets(pattern)
    mr, mc, mv = PM.to_triplets(mat)
    mat_map = {(int(r), int(c)): v for r, c, v in zip(mr, mc, mv)}
    vals = np.array([mat_map.get((int(r), int(c)), 0.0) for r, c in
                     zip(pr, pc)], dtype=mat.dtype)
    out = PM.empty(mat.dim, bs=mat.bs, k=mat.k, dtype=mat.dtype,
                   grid=mat.grid)
    return PM.fill_from_triplets(out, pr, pc, vals)
