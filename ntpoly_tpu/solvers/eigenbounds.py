"""Spectral bounds (reference Source/Fortran/EigenBoundsModule.F90).

GershgorinBounds lives in parallel.algebra (it is a cheap reduction over the
matrix); PowerBounds here is the power-iteration upper bound with Aitken
delta-squared extrapolation (reference EigenBoundsModule.F90:60-191), run on
a dense replicated vector via SpMV rather than the reference's
diagonal-matrix-as-vector trick.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..parallel import algebra as alg
from .common import resolve, solver_log, iteration_log, real_scalar
from .parameters import SolverParameters


def gershgorin_bounds(mat):
    lo, hi = alg.gershgorin_bounds(mat)
    return float(lo), float(hi)


def power_bounds(mat, params: SolverParameters | None = None) -> float:
    if params is None:
        params = SolverParameters(max_iterations=10)
    params, monitor = resolve(params)

    with solver_log(params, "Power Bounds Solver"):
        # Uniform guess across all logical columns with value 1/actual_dim
        # (reference EigenBoundsModule.F90:102-112) — logical coverage
        # matters when the matrix was load-balance permuted into padding.
        n = mat.logical_dim
        x = jnp.full((n,), 1.0 / mat.dim)
        x = x.astype(mat.blocks.real.dtype if jnp.iscomplexobj(mat.blocks)
                     else mat.dtype)
        ritz = [0.0, 0.0, 0.0]
        aitken = [0.0, 0.0, 0.0]
        max_value = 0.0
        with iteration_log(params) as ilog:
            for ii in range(1, params.max_iterations + 1):
                y = alg.spmv(mat, x.astype(mat.dtype))
                num = real_scalar(jnp.vdot(x, y))
                den = real_scalar(jnp.vdot(x, x))
                max_value = num / den
                x = y / jnp.max(jnp.abs(y))
                ritz = ritz[1:] + [max_value]
                aitken = aitken[1:] + [0.0]
                if ii >= 3:
                    num_a = ritz[2] * ritz[0] - ritz[1] ** 2
                    den_a = ritz[2] - 2 * ritz[1] + ritz[0]
                    aitken[2] = num_a / den_a if abs(den_a) > 1e-14 \
                        else ritz[2]
                else:
                    aitken[2] = ritz[2]
                monitor.append(-(aitken[2] - aitken[1]))
                if monitor.check_converged(params.be_verbose):
                    if abs(aitken[2] - ritz[2]) < monitor.loose_cutoff:
                        break
                ilog.step(**{"Estimate": ritz[2],
                             "Aitken Estimate": aitken[2]})
    return float(aitken[2])
