"""Matrix sign function and polar decomposition
(reference Source/Fortran/SignSolversModule.F90).

Scaled Newton-Schulz: X <- (alpha_k/2) X (3I - alpha_k^2 X^2) with
alpha_k = min(sqrt(3/(1 + x + x^2)), 1.6977...) and x tracked analytically
(reference CoreComputation, SignSolversModule.F90:150-260).  The polar
variant uses X^H X in place of X^2.
"""
from __future__ import annotations

import math

from ..parallel import algebra as alg
from .common import (resolve, solver_log, iteration_log, finish_iterations,
                     maybe_permute, maybe_unpermute, identity_like,
                     real_scalar)
from .parameters import SolverParameters

ALPHA_MAX = 1.69770248526


def _core(mat, params, monitor, needs_transpose: bool):
    imat = identity_like(mat)
    out, imat = maybe_permute(params, mat, imat)
    e_min, e_max = alg.gershgorin_bounds(mat)
    e_min, e_max = float(e_min), float(e_max)
    xk = abs(e_min / e_max)
    out = alg.scale(out, 1.0 / abs(e_max))

    if params.iters_per_sync > 1 and not needs_transpose:
        out, total = _core_chunked(out, imat, xk, params, monitor)
        finish_iterations(params, total + 1, out, monitor=monitor,
                          solver="Sign Solver")
        return maybe_unpermute(params, out)
    total = 0
    with iteration_log(params):
        for ii in range(params.max_iterations):
            alpha_k = min(math.sqrt(3.0 / (1.0 + xk + xk ** 2)), ALPHA_MAX)
            xk = 0.5 * alpha_k * xk * (3.0 - alpha_k ** 2 * xk ** 2)
            if needs_transpose:
                outt = alg.transpose(out).conjugate()
                t1 = alg.matmul(outt, out, alpha=-alpha_k ** 2,
                                threshold=params.threshold)
            else:
                t1 = alg.matmul(out, out, alpha=-alpha_k ** 2,
                                threshold=params.threshold)
            t1 = alg.increment(t1, imat, 1.0, 3.0)
            t2 = alg.matmul(out, t1, alpha=0.5 * alpha_k,
                            threshold=params.threshold)
            norm_value = real_scalar(
                alg.norm(alg.increment(out, t2, 1.0, -1.0)))
            out = t2
            total = ii
            monitor.append(norm_value)
            if monitor.check_converged(params.be_verbose):
                break
    finish_iterations(params, total + 1, out, monitor=monitor,
                          solver="Sign Solver")
    return maybe_unpermute(params, out)


def _core_chunked(out, imat, xk0, params, monitor):
    """Scaled Newton-Schulz fused iterations: the alpha_k recurrence rides
    in the scan carry as a traced scalar (see density._trs4_chunked)."""
    import jax.numpy as jnp
    from .common import run_chunked
    from .density import _pin_capacity

    thr = params.threshold
    k_pin, (out, imatp) = _pin_capacity(params, out, imat)

    def step(carry, imatc):
        xc, xk = carry
        alpha_k = jnp.minimum(jnp.sqrt(3.0 / (1.0 + xk + xk ** 2)),
                              ALPHA_MAX)
        xk_new = 0.5 * alpha_k * xk * (3.0 - alpha_k ** 2 * xk ** 2)
        t1 = alg.matmul(xc, xc, alpha=-alpha_k ** 2, threshold=thr)
        t1 = alg.increment(t1, imatc, 1.0, 3.0)
        t2 = alg.matmul(xc, t1, alpha=0.5 * alpha_k, threshold=thr)
        norm_value = jnp.real(
            alg.norm(alg.increment(xc, t2, 1.0, -1.0)))
        return (t2, xk_new), (norm_value,)

    carry0 = (out, jnp.asarray(xk0, jnp.real(out.blocks).dtype))
    with iteration_log(params) as ilog:
        (out, _), _, total = run_chunked(
            step, carry0, (imatp,), params, monitor, ilog,
            k_pin=k_pin, aux_names=("Convergence",), conv_mode="value",
            cache_key=("sign_core", thr))
    return out, total


def sign_function(mat, params: SolverParameters | None = None):
    """reference SignSolversModule.F90 SignFunction."""
    params, monitor = resolve(params)
    with solver_log(params, "Sign Function Solver",
                    citations=("nicholas2008functions",)):
        return _core(mat, params, monitor, needs_transpose=False)


def polar_decomposition(mat, params: SolverParameters | None = None):
    """A = U H; returns (U, H) (reference PolarDecomposition)."""
    params, monitor = resolve(params)
    with solver_log(params, "Polar Decomposition Solver",
                    citations=("nicholas2008functions",)):
        u = _core(mat, params, monitor, needs_transpose=True)
        ut = alg.transpose(u).conjugate()
        h = alg.matmul(ut, mat, threshold=params.threshold)
        return u, h


def dense_sign_function(mat, params: SolverParameters | None = None):
    from .eigen import dense_matrix_function
    params, _ = resolve(params)
    with solver_log(params, "Sign Function Solver"):
        return dense_matrix_function(
            mat, lambda w: (w >= 0) * 2.0 - 1.0, params)
