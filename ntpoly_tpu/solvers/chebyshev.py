"""Chebyshev polynomial evaluation
(reference Source/Fortran/ChebyshevSolversModule.F90).

``compute``: three-term recurrence T_k = 2 X T_{k-1} - T_{k-2} accumulating
coefficients (reference :83-188).  ``factorized_compute``: divide-and-conquer
over precomputed T_{2^i} powers (liang2003improved; reference :192-366) which
halves the multiply count for long expansions.
"""
from __future__ import annotations

from ..parallel import algebra as alg
from .common import (resolve, solver_log, maybe_permute, maybe_unpermute,
                     identity_like)
from .parameters import SolverParameters


class ChebyshevPolynomial:
    """Coefficients c_k of sum_k c_k T_k(x) (reference :20-24)."""

    def __init__(self, degree: int):
        self.coefficients = [0.0] * degree

    def set_coefficient(self, index: int, value: float):
        self.coefficients[index] = value


def compute(mat, poly: ChebyshevPolynomial,
            params: SolverParameters | None = None):
    """Standard three-term recurrence (reference Compute_cheby)."""
    params, _ = resolve(params)
    c = poly.coefficients
    degree = len(c)
    with solver_log(params, "Chebyshev Solver", "Standard",
                    extra={"Degree": degree - 1}):
        imat = identity_like(mat)
        x, imat = maybe_permute(params, mat, imat)
        tkm2 = imat
        if degree == 1:
            out = alg.scale(tkm2, c[0])
        else:
            tkm1 = x
            out = alg.increment(alg.scale(tkm2, c[0]), tkm1, 1.0, c[1])
            if degree > 2:
                tk = alg.increment(
                    alg.matmul(x, tkm1, alpha=2.0,
                               threshold=params.threshold),
                    tkm2, 1.0, -1.0)
                out = alg.increment(out, tk, 1.0, c[2])
                for ii in range(3, degree):
                    tkm2, tkm1 = tkm1, tk
                    tk = alg.increment(
                        alg.matmul(x, tkm1, alpha=2.0,
                                   threshold=params.threshold),
                        tkm2, 1.0, -1.0)
                    out = alg.increment(out, tk, 1.0, c[ii])
        return maybe_unpermute(params, out)


def factorized_compute(mat, poly: ChebyshevPolynomial,
                       params: SolverParameters | None = None):
    """Divide-and-conquer using T_{2^i} (reference FactorizedCompute_cheby)."""
    params, _ = resolve(params)
    c = list(poly.coefficients)
    degree = len(c)
    with solver_log(params, "Chebyshev Solver", "Recursive",
                    extra={"Degree": degree - 1}):
        imat = identity_like(mat)
        x, imat = maybe_permute(params, mat, imat)
        log2degree = 1
        while 2 ** log2degree <= degree:
            log2degree += 1
        t_powers = [imat]
        if degree == 1:
            out = t_powers[0]
        else:
            t_powers.append(x)
            for _ in range(2, log2degree):
                prev = t_powers[-1]
                nxt = alg.increment(
                    alg.matmul(prev, prev, alpha=2.0,
                               threshold=params.threshold),
                    imat, 1.0, -1.0)
                t_powers.append(nxt)
            out = _compute_recursive(t_powers, c, 1, params)
        return maybe_unpermute(params, out)


def _compute_recursive(t_powers, c, depth, params):
    """reference ComputeRecursive (ChebyshevSolversModule.F90:234-330):
    split coefficients at the midpoint, fold the tail into the left half
    (T_{m+k} + T_{m-k} = 2 T_m T_k), recurse."""
    if len(c) == 1:
        return alg.scale(t_powers[0], c[0])
    if len(c) == 2:
        return alg.increment(alg.scale(t_powers[0], c[0]),
                             t_powers[1], 1.0, c[1])
    mid = len(c) // 2
    left = list(c[:mid])
    right = list(c[mid:])
    for ii in range(1, len(left)):
        left[ii] -= c[len(c) - ii]
    left_mat = _compute_recursive(t_powers, left, depth + 1, params)
    full_mid = len(t_powers) - depth
    right_mat = _compute_recursive(t_powers, right, depth + 1, params)
    out = alg.matmul(t_powers[full_mid], right_mat, alpha=2.0,
                     threshold=params.threshold)
    out = alg.increment(out, left_mat)
    out = alg.increment(out, t_powers[full_mid], 1.0, -right[0])
    return out
