"""Matrix analysis tools (reference Source/Fortran/AnalysisModule.F90).

PivotedCholeskyDecomposition (:30-221, aquilante2006fast): rank-k partial
Cholesky with max-diagonal pivoting.  The reference hunts pivots with
allreduce-maxloc over a distributed panel; on TPU the factorization is run
on the gathered dense matrix with a jax loop (k is small by construction —
it is the target rank).

ReduceDimension (:222-279): TRS4 with identity overlap -> rank-dim pivoted
Cholesky of the density -> similarity transform into that subspace ->
GetMatrixSlice.
"""
from __future__ import annotations

import numpy as np

from ..parallel import algebra as alg
from ..parallel import pmatrix as PM
from .common import resolve, solver_log, identity_like
from .parameters import SolverParameters


def pivoted_cholesky_decomposition(amat, rank: int,
                                   params: SolverParameters | None = None):
    """Rank-``rank`` L with A ~= L L^H; returns L as a PSMatrix whose first
    ``rank`` columns are the pivoted Cholesky vectors."""
    params, _ = resolve(params)
    with solver_log(params, "Cholesky Solver", "Pivoted",
                    citations=("aquilante2006fast",),
                    extra={"Target_Rank": rank}):
        a = np.asarray(PM.to_dense(amat))
        n = a.shape[0]
        ell = np.zeros((n, rank), dtype=a.dtype)
        diag = np.real(np.diag(a)).copy().astype(np.float64)
        pivots = []
        for jj in range(rank):
            p = int(np.argmax(diag))
            pivots.append(p)
            val = diag[p]
            if val <= 0:
                break
            col = (a[:, p] - ell[:, :jj] @ np.conj(ell[p, :jj])) \
                / np.sqrt(val)
            col[p] = np.sqrt(val)
            if params.threshold > 0:
                col = np.where(np.abs(col) > params.threshold, col, 0)
            ell[:, jj] = col
            diag -= np.abs(col) ** 2
            diag[p] = 0.0
        out = np.zeros((n, n), dtype=a.dtype)
        out[:, :rank] = ell
        return PM.from_dense(out, bs=amat.bs, k=amat.k, grid=amat.grid,
                             dtype=amat.dtype)


def reduce_dimension(mat, dim: int, params: SolverParameters | None = None):
    """reference ReduceDimension (AnalysisModule.F90:222-279)."""
    from .density import trs4
    params, _ = resolve(params)
    with solver_log(params, "Dimension Reduction"):
        imat = identity_like(mat)
        pmat, _, _ = trs4(mat, imat, float(dim), params)
        pvec = pivoted_cholesky_decomposition(pmat, dim, params)
        pvec_t = alg.transpose(pvec).conjugate()
        vav = alg.similarity_transform(mat, pvec_t, pvec,
                                       threshold=params.threshold)
        return PM.get_slice(vav, 0, dim, 0, dim)
