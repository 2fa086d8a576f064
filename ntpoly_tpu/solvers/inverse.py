"""Matrix inverse solvers (reference Source/Fortran/InverseSolversModule.F90).

Hotelling/Newton iteration X <- 2X - X A X with Ozaki sigma scaling for the
initial guess (ozaki2001efficient); convergence on ||I - A X||.
"""
from __future__ import annotations

from ..parallel import algebra as alg
from .common import (resolve, solver_log, iteration_log, finish_iterations,
                     maybe_permute, maybe_unpermute, identity_like,
                     real_scalar)
from ..utils.logging import logger
from .parameters import SolverParameters


def _hotelling(mat, params, monitor):
    imat = identity_like(mat)
    balanced, imat = maybe_permute(params, mat, imat)
    sigma = real_scalar(alg.matrix_sigma(balanced))
    x = alg.scale(balanced, sigma)
    if params.iters_per_sync > 1:
        x, total = _hotelling_chunked(x, balanced, imat, params, monitor)
        finish_iterations(params, total, x, monitor=monitor,
                          solver="Inverse Solver")
        return maybe_unpermute(params, x)
    total = 0
    with iteration_log(params) as ilog:
        for ii in range(params.max_iterations):
            t1 = alg.matmul(x, balanced, threshold=params.threshold)
            norm_value = real_scalar(
                alg.norm(alg.increment(imat, t1, 1.0, -1.0)))
            # X <- 2X - T1 X
            x = alg.increment(alg.scale(x, 2.0),
                              alg.matmul(t1, x, threshold=params.threshold),
                              1.0, -1.0, threshold=params.threshold)
            total = ii
            monitor.append(norm_value)
            # the monitor's verbose check logs the per-iteration
            # Convergence element itself (incl. the converged one)
            if monitor.check_converged(params.be_verbose):
                break
    finish_iterations(params, total, x, monitor=monitor,
                          solver="Inverse Solver")
    return maybe_unpermute(params, x)


def _hotelling_chunked(x, balanced, imat, params, monitor):
    """Hotelling iterations fused into compiled lax.scan chunks (see
    density._trs4_chunked for the pattern)."""
    import jax.numpy as jnp
    from .common import run_chunked, pad_capacity
    from .density import _pin_capacity

    thr = params.threshold
    k_pin, (x, balp, imatp) = _pin_capacity(params, x, balanced, imat)

    def step(xc, balc, imatc):
        t1 = alg.matmul(xc, balc, threshold=thr)
        norm_value = jnp.real(
            alg.norm(alg.increment(imatc, t1, 1.0, -1.0)))
        x_new = alg.increment(alg.scale(xc, 2.0),
                              alg.matmul(t1, xc, threshold=thr),
                              1.0, -1.0, threshold=thr)
        return x_new, (norm_value,)

    with iteration_log(params) as ilog:
        x, _, total = run_chunked(
            step, x, (balp, imatp), params, monitor, ilog,
            k_pin=k_pin, aux_names=("Convergence",), conv_mode="value",
            cache_key=("hotelling", thr))
    return x, total


def invert(mat, params: SolverParameters | None = None):
    """reference InverseSolversModule.F90:29-151."""
    params, monitor = resolve(params)
    with solver_log(params, "Inverse Solver",
                    citations=("palser1998canonical",
                               "ozaki2001efficient")):
        return _hotelling(mat, params, monitor)


def pseudo_inverse(mat, params: SolverParameters | None = None):
    """Moore-Penrose pseudo-inverse by the same Hotelling iteration, which
    converges on the row/column space (reference
    InverseSolversModule.F90:187+)."""
    params, monitor = resolve(params)
    with solver_log(params, "Inverse Solver",
                    citations=("palser1998canonical",)):
        return _hotelling(mat, params, monitor)


def dense_invert(mat, params: SolverParameters | None = None):
    """reference InverseSolversModule.F90:152-185."""
    from .eigen import dense_matrix_function
    params, _ = resolve(params)
    with solver_log(params, "Inverse Solver"):
        return dense_matrix_function(mat, lambda w: 1.0 / w, params)
