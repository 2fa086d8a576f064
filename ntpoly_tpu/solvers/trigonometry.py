"""Matrix sine and cosine
(reference Source/Fortran/TrigonometrySolversModule.F90).

Scale-and-square with a 17-term even Chebyshev expansion of cos on [-1,1]
(serbin1980algorithm, higham2003computing, yau1993reducing; reference
:290-398): the coefficients are c_0 = J_0(1), c_2k = 2 (-1)^k J_2k(1)
(Bessel), generated at import.  Squaring back uses cos(2x) = 2cos^2 x - 1,
and sin(x) = cos(x - pi/2).
"""
from __future__ import annotations

import math

from ..parallel import algebra as alg
from .common import (resolve, solver_log, maybe_permute, maybe_unpermute,
                     identity_like)
from .parameters import SolverParameters


def _cos_cheby_coefficients(n: int = 17) -> list[float]:
    from scipy.special import jv
    coeffs = [0.0] * n
    coeffs[0] = float(jv(0, 1.0))
    for k in range(1, (n + 1) // 2):
        if 2 * k < n:
            coeffs[2 * k] = 2.0 * (-1.0) ** k * float(jv(2 * k, 1.0))
    return coeffs


def sine(mat, params: SolverParameters | None = None):
    """sin(A) = cos(A - pi/2 I) (reference Sine, :157+)."""
    params, _ = resolve(params)
    with solver_log(params, "Trigonometry Solver", "Sine"):
        shifted = alg.increment(mat, identity_like(mat), 1.0,
                                -0.5 * math.pi)
        return _scale_square_trig(shifted, params)


def cosine(mat, params: SolverParameters | None = None):
    params, _ = resolve(params)
    with solver_log(params, "Trigonometry Solver", "Cosine"):
        return _scale_square_trig(mat, params)


def _scale_square_trig(mat, params):
    """reference ScaleSquareTrigonometry (:290-296, 327-398)."""
    e_min, e_max = alg.gershgorin_bounds(mat)
    spectral_radius = max(abs(float(e_min)), abs(float(e_max)))
    sigma = 1.0
    counter = 1
    while spectral_radius / sigma > 1.0:
        sigma *= 2
        counter += 1
    scaled = alg.scale(mat, 1.0 / sigma)
    imat = identity_like(mat)
    scaled, imat = maybe_permute(params, scaled, imat)

    c = _cos_cheby_coefficients(17)

    t2 = alg.increment(
        alg.matmul(scaled, scaled, alpha=2.0, threshold=params.threshold),
        imat, 1.0, -1.0)
    t4 = alg.increment(
        alg.matmul(t2, t2, alpha=2.0, threshold=params.threshold),
        imat, 1.0, -1.0)
    t6 = alg.increment(
        alg.matmul(t4, t2, alpha=2.0, threshold=params.threshold),
        t2, 1.0, -1.0)
    t8 = alg.increment(
        alg.matmul(t6, t2, alpha=2.0, threshold=params.threshold),
        t4, 1.0, -1.0)

    # Two-half split: high coefficients (T10..T16 via T8 * low powers).
    hi = alg.scale(t8, 0.5 * c[16])
    hi = alg.increment(hi, t6, 1.0, 0.5 * c[14])
    hi = alg.increment(hi, t4, 1.0, 0.5 * c[12])
    hi = alg.increment(hi, t2, 1.0, 0.5 * c[10])
    hi = alg.matmul(t8, hi, threshold=params.threshold)

    out = alg.scale(t8, c[8])
    out = alg.increment(out, t6, 1.0, c[6] + 0.5 * c[10])
    out = alg.increment(out, t4, 1.0, c[4] + 0.5 * c[12])
    out = alg.increment(out, t2, 1.0, c[2] + 0.5 * c[14])
    out = alg.increment(out, imat, 1.0, c[0] + 0.5 * c[16])
    out = alg.increment(out, hi)

    for _ in range(counter - 1):
        out = alg.increment(
            alg.matmul(out, out, alpha=2.0, threshold=params.threshold),
            imat, 1.0, -1.0)
    return maybe_unpermute(params, out)


def scale_square_trigonometry_taylor(mat,
                                     params: SolverParameters | None = None):
    """cos(A) via aggressive scaling + even Taylor series + double-angle
    squaring (reference ScaleSquareTrigonometryTaylor,
    TrigonometrySolversModule.F90:157-262; higham2003computing).

    Scale by sigma = 2^k until rho/sigma <= 3e-3, accumulate
    cos(x) ~= sum_k (-1)^k x^{2k} / (2k)! over even powers (the series is
    evaluated in powers of A^2), then square back with
    cos(2x) = 2 cos^2 x - 1.
    """
    params, _ = resolve(params)
    with solver_log(params, "Trigonometry Solver", "Taylor"):
        e_min, e_max = alg.gershgorin_bounds(mat)
        spectral_radius = max(abs(float(e_min)), abs(float(e_max)))
        sigma = 1.0
        counter = 1
        while spectral_radius / sigma > 3.0e-3:
            sigma *= 2
            counter += 1
        scaled = alg.scale(mat, 1.0 / sigma)
        imat = identity_like(mat)
        out = identity_like(mat)
        scaled, imat, out = maybe_permute(params, scaled, imat, out)

        # Even-power Taylor accumulation: A_k tracks (A/sigma)^(2k).
        a2 = alg.matmul(scaled, scaled, threshold=params.threshold)
        ak = out
        taylor_denom = -2.0
        for ii in range(2, 41, 2):
            ak = alg.matmul(ak, a2, threshold=params.threshold)
            out = alg.increment(out, ak, 1.0, 1.0 / taylor_denom)
            taylor_denom *= (ii + 1)
            taylor_denom *= -(ii + 2)

        for _ in range(counter - 1):
            out = alg.increment(
                alg.matmul(out, out, alpha=2.0,
                           threshold=params.threshold),
                imat, 1.0, -1.0)
        return maybe_unpermute(params, out)


def dense_sine(mat, params: SolverParameters | None = None):
    from .eigen import dense_matrix_function
    import jax.numpy as jnp
    params, _ = resolve(params)
    with solver_log(params, "Trigonometry Solver"):
        return dense_matrix_function(mat, jnp.sin, params)


def dense_cosine(mat, params: SolverParameters | None = None):
    from .eigen import dense_matrix_function
    import jax.numpy as jnp
    params, _ = resolve(params)
    with solver_log(params, "Trigonometry Solver"):
        return dense_matrix_function(mat, jnp.cos, params)
