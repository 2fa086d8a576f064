"""Linear solvers (reference Source/Fortran/LinearSolversModule.F90).

CGSolver (:33-183): matrix-RHS conjugate gradient with trace-ratio step
sizes.  CholeskyDecomposition (:185-321): the reference runs a sequential
column-by-column distributed factorization; on TPU that serial dependency
chain wastes the MXU, so the TPU-native path gathers to dense, runs XLA's
blocked ``jnp.linalg.cholesky``, and re-sparsifies with the threshold —
the same design substitution the reference itself makes for its eigensolver
(gather + LAPACK, EigenSolversModule.F90:229-321).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..parallel import algebra as alg
from ..parallel import pmatrix as PM
from .common import (resolve, solver_log, iteration_log, finish_iterations,
                     maybe_permute, maybe_unpermute, identity_like,
                     real_scalar)
from .parameters import SolverParameters


def cg_solver(amat, bmat, params: SolverParameters | None = None):
    """Solve A X = B for SPD A (reference CGSolver)."""
    params, monitor = resolve(params)
    with solver_log(params, "Linear Solver", "CG"):
        imat = identity_like(amat)
        ab, bb, imat = maybe_permute(params, amat, bmat, imat)
        x = imat
        r = alg.increment(bb, alg.matmul(ab, x, threshold=params.threshold),
                          1.0, -1.0)
        p = r

        if params.iters_per_sync > 1:
            x, total = _cg_chunked(x, r, p, ab, params, monitor)
            finish_iterations(params, total + 1, x, monitor=monitor,
                          solver="Linear Solver")
            return maybe_unpermute(params, x)

        total = 0
        with iteration_log(params):
            for ii in range(params.max_iterations):
                q = alg.matmul(ab, p, threshold=params.threshold)
                top = real_scalar(alg.dot(r, r))
                bottom = real_scalar(alg.dot(p, q))
                step = top / bottom
                x = alg.increment(x, p, 1.0, step)
                norm_value = abs(step * real_scalar(alg.norm(p)))
                r = alg.increment(r, q, 1.0, -step)
                new_top = real_scalar(alg.dot(r, r))
                p = alg.increment(r, p, 1.0, new_top / top)
                total = ii
                monitor.append(norm_value)
                if monitor.check_converged(params.be_verbose):
                    break
        finish_iterations(params, total + 1, x, monitor=monitor,
                          solver="Linear Solver")
        return maybe_unpermute(params, x)


def _cg_chunked(x, r, p, ab, params, monitor):
    """CG fused iterations (see density._trs4_chunked): the x/r/p triple
    rides in the scan carry."""
    from .common import run_chunked
    from .density import _pin_capacity

    thr = params.threshold
    k_pin, (x, r, p, abp) = _pin_capacity(params, x, r, p, ab,
                                          n_carry=3)

    def step(carry, abc):
        xc, rc, pc = carry
        q = alg.matmul(abc, pc, threshold=thr)
        top = jnp.real(alg.dot(rc, rc))
        bottom = jnp.real(alg.dot(pc, q))
        step_sz = top / bottom
        x_new = alg.increment(xc, pc, 1.0, step_sz)
        norm_value = jnp.abs(step_sz * jnp.real(alg.norm(pc)))
        r_new = alg.increment(rc, q, 1.0, -step_sz)
        new_top = jnp.real(alg.dot(r_new, r_new))
        p_new = alg.increment(r_new, pc, 1.0, new_top / top)
        return (x_new, r_new, p_new), (norm_value,)

    with iteration_log(params) as ilog:
        (x, _, _), _, total = run_chunked(
            step, (x, r, p), (abp,), params, monitor, ilog,
            k_pin=k_pin, aux_names=("Convergence",), conv_mode="value",
            cache_key=("cg", thr))
    return x, total


def cholesky_decomposition(amat, params: SolverParameters | None = None):
    """A = L L^T (lower-triangular L), threshold-sparsified."""
    params, _ = resolve(params)
    with solver_log(params, "Linear Solver", "Cholesky"):
        d = PM.to_dense(amat)
        ell = jnp.linalg.cholesky(d)
        if params.threshold > 0:
            ell = jnp.where(jnp.abs(ell) > params.threshold, ell, 0)
        return PM.from_dense(np.asarray(ell), bs=amat.bs, k=amat.k,
                             grid=amat.grid, dtype=amat.dtype)
