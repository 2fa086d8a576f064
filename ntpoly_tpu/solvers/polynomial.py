"""Standard polynomial evaluation
(reference Source/Fortran/PolynomialSolversModule.F90): Horner's method
(:83-167) and Paterson-Stockmeyer factorization (paterson1973number;
:165-283) which needs only ~2*sqrt(degree) matrix multiplies.

Coefficient k multiplies x^k.
"""
from __future__ import annotations

import math

from ..parallel import algebra as alg
from .common import (resolve, solver_log, maybe_permute, maybe_unpermute,
                     identity_like)
from .parameters import SolverParameters


class Polynomial:
    def __init__(self, degree: int):
        self.coefficients = [0.0] * degree

    def set_coefficient(self, index: int, value: float):
        self.coefficients[index] = value


def horner_compute(mat, poly: Polynomial,
                   params: SolverParameters | None = None):
    """reference Compute_stand (Horner)."""
    params, _ = resolve(params)
    c = poly.coefficients
    degree = len(c)
    with solver_log(params, "Polynomial Solver", "Horner",
                    extra={"Degree": degree - 1}):
        imat = identity_like(mat)
        x, imat = maybe_permute(params, mat, imat)
        if degree == 1:
            out = alg.scale(imat, c[0])
        else:
            out = alg.increment(alg.scale(imat, c[degree - 2]),
                                x, 1.0, c[degree - 1])
            for ii in range(degree - 3, -1, -1):
                out = alg.increment(
                    alg.matmul(x, out, threshold=params.threshold),
                    imat, 1.0, c[ii])
        return maybe_unpermute(params, out)


def paterson_stockmeyer_compute(mat, poly: Polynomial,
                                params: SolverParameters | None = None):
    """reference FactorizedCompute_stand (Paterson-Stockmeyer)."""
    params, _ = resolve(params)
    c = poly.coefficients
    degree = len(c)
    with solver_log(params, "Polynomial Solver", "Paterson Stockmeyer",
                    citations=("paterson1973number",),
                    extra={"Degree": degree - 1}):
        m_value = degree - 1
        s = max(int(math.isqrt(m_value)), 1)
        r = m_value // s

        imat = identity_like(mat)
        x_powers = [imat]                        # X^0 .. X^s
        for ii in range(s):
            x_powers.append(alg.matmul(mat, x_powers[ii],
                                       threshold=params.threshold))
        xs = x_powers[s]

        # top block: coefficients s*r .. m
        bk = alg.scale(imat, c[s * r])
        for ii in range(1, m_value - s * r + 1):
            bk = alg.increment(bk, x_powers[ii], 1.0, c[s * r + ii])
        out = alg.matmul(bk, xs, threshold=params.threshold)

        k = r - 1
        bk = alg.scale(imat, c[s * k])
        for ii in range(1, s):
            bk = alg.increment(bk, x_powers[ii], 1.0, c[s * k + ii])
        out = alg.increment(out, bk)

        for k in range(r - 2, -1, -1):
            bk = alg.scale(imat, c[s * k])
            for ii in range(1, s):
                bk = alg.increment(bk, x_powers[ii], 1.0, c[s * k + ii])
            out = alg.matmul(xs, out, threshold=params.threshold)
            out = alg.increment(out, bk)
        return out
