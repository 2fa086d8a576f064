"""Matrix exponential and logarithm
(reference Source/Fortran/ExponentialSolversModule.F90).

ComputeExponential (:37-151): power-bound the spectrum, scale by 2^-k into
[-1,1], evaluate a 16-term Chebyshev expansion of exp, square k times.  The
Chebyshev coefficients of exp on [-1,1] are c_0 = I_0(1), c_k = 2 I_k(1)
(modified Bessel) and are generated at import time rather than hardcoded.

ComputeLogarithm (:408-529): take the 2^k-th root so the spectrum lands in
[1/sqrt(2), sqrt(2)], shift by -I, evaluate a 32-term Chebyshev fit of
log(1+x) on [1/sqrt(2)-1, sqrt(2)-1], then scale by 2^k.  The fit is
computed at import with numpy (least squares in the T_k basis on [-1, 1]).
"""
from __future__ import annotations

import math

import numpy as np

from ..parallel import algebra as alg
from .common import (resolve, solver_log, maybe_permute, maybe_unpermute,
                     identity_like)
from .parameters import SolverParameters
from . import chebyshev
from .eigenbounds import power_bounds


def _exp_cheby_coefficients(n: int = 16) -> list[float]:
    from scipy.special import iv
    coeffs = [float(iv(0, 1.0))]
    coeffs += [2.0 * float(iv(k, 1.0)) for k in range(1, n)]
    return coeffs


def _log1p_cheby_coefficients(n: int = 32) -> list[float]:
    # Least-squares fit of log(1+x) over the post-root spectral interval in
    # the Chebyshev basis of [-1, 1] (same scheme as the reference's
    # hardcoded table, ExponentialSolversModule.F90:460-500).
    lo, hi = 1.0 / math.sqrt(2.0) - 1.0, math.sqrt(2.0) - 1.0
    x = np.linspace(lo, hi, 2048)
    y = np.log1p(x)
    basis = np.polynomial.chebyshev.chebvander(x, n - 1)
    coeffs, *_ = np.linalg.lstsq(basis, y, rcond=None)
    return [float(c) for c in coeffs]


def _scale_squaring_count(spectral_radius: float, limit: float = 1.0):
    sigma = 1.0
    counter = 1
    while spectral_radius / sigma > limit:
        sigma *= 2
        counter += 1
    return sigma, counter


def compute_exponential(mat, params: SolverParameters | None = None):
    """Chebyshev + scale-and-square (reference :37-151)."""
    params, _ = resolve(params)
    with solver_log(params, "Exponential Solver", "Chebyshev"):
        psub = params.copy()
        psub.max_iterations = 10
        spectral_radius = power_bounds(mat, psub)
        sigma, counter = _scale_squaring_count(spectral_radius)
        scaled = alg.scale(mat, 1.0 / sigma)
        sub = params.copy()
        sub.threshold = sub.threshold / sigma

        poly = chebyshev.ChebyshevPolynomial(16)
        for i, cv in enumerate(_exp_cheby_coefficients(16)):
            poly.set_coefficient(i, cv)
        out = chebyshev.compute(scaled, poly, sub)

        out, = maybe_permute(params, out)
        for _ in range(counter - 1):
            out = alg.matmul(out, out, threshold=params.threshold)
        return maybe_unpermute(params, out)


def compute_exponential_pade(mat, params: SolverParameters | None = None):
    """Scaling + (6,6)-ish Pade with CG solve for the denominator
    (reference :152-275)."""
    from .linear import cg_solver
    params, _ = resolve(params)
    with solver_log(params, "Exponential Solver", "Pade"):
        imat = identity_like(mat)
        spectral_radius = float(alg.norm(mat))
        sigma, counter = _scale_squaring_count(spectral_radius)
        scaled = alg.scale(mat, 1.0 / sigma)
        sub = params.copy()
        sub.threshold = sub.threshold / sigma

        b1 = alg.matmul(scaled, scaled, threshold=sub.threshold)
        b2 = alg.matmul(b1, b1, threshold=sub.threshold)
        b3 = alg.matmul(b2, b2, threshold=sub.threshold)
        p1 = alg.increment(
            alg.increment(alg.increment(alg.scale(imat, 17297280.0),
                                        b1, 1.0, 1995840.0),
                          b2, 1.0, 25200.0),
            b3, 1.0, 56.0)
        tmp = alg.increment(
            alg.increment(alg.increment(alg.scale(imat, 8648640.0),
                                        b1, 1.0, 277200.0),
                          b2, 1.0, 1512.0),
            b3, 1.0, 1.0)
        p2 = alg.matmul(scaled, tmp, threshold=sub.threshold)
        left = alg.increment(p1, p2, 1.0, -1.0)
        right = alg.increment(p1, p2, 1.0, 1.0)
        out = cg_solver(left, right, sub)
        for _ in range(counter - 1):
            out = alg.matmul(out, out, threshold=params.threshold)
        return out


def compute_exponential_taylor(mat, params: SolverParameters | None = None):
    """Heavily-scaled 10-term Taylor series (reference :276-372)."""
    params, _ = resolve(params)
    with solver_log(params, "Exponential Solver", "Taylor"):
        psub = params.copy()
        psub.max_iterations = 10
        spectral_radius = power_bounds(mat, psub)
        sigma, counter = _scale_squaring_count(spectral_radius, 3.0e-8)
        scaled = alg.scale(mat, 1.0 / sigma)
        out = identity_like(mat)
        scaled, out = maybe_permute(params, scaled, out)
        ak = out
        for ii in range(1, 11):
            ak = alg.matmul(ak, scaled, threshold=params.threshold)
            out = alg.increment(out, ak)
        for _ in range(counter - 1):
            out = alg.matmul(out, out, threshold=params.threshold)
        return maybe_unpermute(params, out)


def compute_logarithm(mat, params: SolverParameters | None = None):
    """Root + Chebyshev of log(1+x) + rescale (reference :408-529)."""
    from .roots import compute_root
    params, _ = resolve(params)
    with solver_log(params, "Logarithm Solver", "Chebyshev"):
        imat = identity_like(mat)
        psub = params.copy()
        psub.max_iterations = 16
        spectral_radius = power_bounds(mat, psub)
        # The Chebyshev fit of log(1+x) is valid on the window the
        # 2^k-th root must land the WHOLE spectrum in: [1/sqrt(2),
        # sqrt(2)].  Driving only the radius below sqrt(2) (the
        # reference's rule, ExponentialSolversModule.F90:460-500) leaves
        # a small lowest eigenvalue BELOW the window — measured 4.4%
        # oracle error on the graph-Laplacian bench whose exp has
        # eigenvalues in [0.37, 1].  When a positive lower bound is
        # available (Gershgorin), keep rooting until both edges fit.
        lo_bound, _ = alg.gershgorin_bounds(mat)
        lo_bound = float(lo_bound)
        sigma = 1
        counter = 1
        while (spectral_radius > math.sqrt(2.0)
               or (0.0 < lo_bound < 1.0 / math.sqrt(2.0))):
            spectral_radius = math.sqrt(spectral_radius)
            if lo_bound > 0.0:
                lo_bound = math.sqrt(lo_bound)
            sigma *= 2
            counter += 1
        fsub = params.copy()
        fsub.threshold = fsub.threshold / (2.0 ** (counter - 1))
        scaled = compute_root(mat, sigma, params)
        scaled = alg.increment(scaled, imat, 1.0, -1.0)

        poly = chebyshev.ChebyshevPolynomial(32)
        for i, cv in enumerate(_log1p_cheby_coefficients(32)):
            poly.set_coefficient(i, cv)
        out = chebyshev.factorized_compute(scaled, poly, fsub)
        return alg.scale(out, float(sigma))


def compute_logarithm_taylor(mat, params: SolverParameters | None = None):
    """Square roots + Taylor of log(1+x) + rescale (reference :530-637)."""
    from .squareroot import square_root
    params, _ = resolve(params)
    with solver_log(params, "Logarithm Solver", "Taylor"):
        imat = identity_like(mat)
        psub = params.copy()
        psub.max_iterations = 10
        spectral_radius = power_bounds(mat, psub)
        sigma = 1
        counter = 1
        while spectral_radius > 1.1:
            spectral_radius = math.sqrt(spectral_radius)
            sigma *= 2
            counter += 1
        scaled = mat
        for _ in range(counter - 1):
            scaled = square_root(scaled, params)
        scaled = alg.increment(scaled, imat, 1.0, -1.0)
        ak = scaled
        out = alg.scale(scaled, 1.0)
        sign = 1.0
        for ii in range(2, 11):
            sign = -sign
            ak = alg.matmul(ak, scaled, threshold=params.threshold)
            out = alg.increment(out, ak, 1.0, sign / ii)
        return alg.scale(out, float(sigma))


def compute_dense_exponential(mat, params: SolverParameters | None = None):
    from .eigen import dense_matrix_function
    import jax.numpy as jnp
    params, _ = resolve(params)
    with solver_log(params, "Exponential Solver"):
        return dense_matrix_function(mat, jnp.exp, params)


def compute_dense_logarithm(mat, params: SolverParameters | None = None):
    from .eigen import dense_matrix_function
    import jax.numpy as jnp
    params, _ = resolve(params)
    with solver_log(params, "Logarithm Solver"):
        return dense_matrix_function(mat, jnp.log, params)
