"""Shared skeleton of every iterative solver.

The reference repeats this pattern in all ~25 solver modules (see e.g.
reference Source/Fortran/DensityMatrixSolversModule.F90:285-481): resolve
params -> construct monitor -> verbose YAML header with citations ->
similarity-transform into the orthogonal basis -> optional load-balance
permutation -> iterate with monitor -> undo permutation -> transform back.
Here it is factored once.
"""
from __future__ import annotations

from ..parallel import algebra as alg
from ..parallel import pmatrix as PM
from ..utils.logging import logger, sub_log
from ..utils.permutation import permute_matrix, undo_permute_matrix
from .parameters import SolverParameters, Monitor


def resolve(params: SolverParameters | None
            ) -> tuple[SolverParameters, Monitor]:
    params = params.copy() if params is not None else SolverParameters()
    return params, params.monitor()


class solver_log:
    """Verbose YAML block: header, method, citations, parameters."""

    def __init__(self, params, header: str, method: str | None = None,
                 citations: tuple[str, ...] = (), extra: dict | None = None):
        self.params, self.header = params, header
        self.method, self.citations = method, citations
        self.extra = extra or {}
        self._policy = None

    def __enter__(self):
        if self.params.be_verbose:
            logger.write_header(self.header)
            logger.enter_sub_log()
            if self.method:
                logger.write_element("Method", self.method)
            for key, val in self.extra.items():
                logger.write_element(key, val)
            if self.citations:
                with sub_log("Citations"):
                    for c in self.citations:
                        logger.write_list_element(c)
            self.params.print()
        # Pin the block capacity for the whole solve when the user set
        # params.k_out: iteration shapes stay static, so XLA compiles each
        # op once instead of once per fill-in level.
        if self.params.k_out or self.params.row_chunk:
            self._policy = alg.capacity_policy(
                k_out=self.params.k_out, row_chunk=self.params.row_chunk,
                on_overflow="truncate" if self.params.k_out else None)
            self._policy.__enter__()
        return self

    def __exit__(self, *exc):
        if self._policy is not None:
            self._policy.__exit__(*exc)
            self._policy = None
        if self.params.be_verbose:
            logger.exit_sub_log()
        return False


class iteration_log:
    def __init__(self, params):
        self.params = params

    def __enter__(self):
        if self.params.be_verbose:
            logger.write_header("Iterations")
            logger.enter_sub_log()
        return self

    def step(self, **kv):
        if self.params.be_verbose:
            with sub_log():
                for key, val in kv.items():
                    logger.write_element(key, val)

    def __exit__(self, *exc):
        if self.params.be_verbose:
            logger.exit_sub_log()
        return False


def finish_iterations(params, total_iterations, mat=None):
    if params.be_verbose:
        logger.write_element("Total Iterations", total_iterations)
        if mat is not None:
            print_matrix_information(mat)


def print_matrix_information(mat):
    """reference PSMatrixModule.F90:1248-1270."""
    with sub_log("Matrix Information"):
        logger.write_element("Dimension", mat.dim)
        nnz = mat.nnz
        logger.write_element("Nonzeros", nnz)
        logger.write_element("Sparsity", nnz / float(mat.dim) ** 2)


def orthogonalize(h, isq, params):
    """WH = ISQ @ H @ ISQ^H (reference solvers' working-Hamiltonian step).

    The reference uses a plain transpose (e.g.
    DensityMatrixSolversModule.F90:355-357) but only ever pairs complex
    Hamiltonians with *real* overlaps (UnitTests/test_chemistry.py:32); the
    conjugate transpose is the Hermitian-correct generalization and is
    identical for real ISQ.
    """
    isqt = alg.transpose(isq).conjugate()
    wh = alg.similarity_transform(h, isq, isqt, threshold=params.threshold)
    return wh, isqt


def deorthogonalize(x, isq, isqt, params):
    """K = ISQ^T @ X @ ISQ."""
    return alg.similarity_transform(x, isqt, isq, threshold=params.threshold)


def maybe_permute(params, *mats):
    if params.do_load_balancing and params.balance_permutation is not None:
        return tuple(permute_matrix(m, params.balance_permutation,
                                    params.threshold) for m in mats)
    return mats if len(mats) > 1 else mats


def maybe_unpermute(params, mat):
    if params.do_load_balancing and params.balance_permutation is not None:
        return undo_permute_matrix(mat, params.balance_permutation,
                                   params.threshold)
    return mat


def identity_like(mat) -> PM.PSMatrix:
    return PM.identity(mat.dim, bs=mat.bs, k=mat.k, dtype=mat.dtype,
                       grid=mat.grid)


def real_scalar(x) -> float:
    x = complex(x)
    return float(x.real)
