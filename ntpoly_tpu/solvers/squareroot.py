"""Matrix square root and inverse square root
(reference Source/Fortran/SquareRootSolversModule.F90).

Coupled Newton-Schulz iterations (jansik2007linear): order 2 with
per-iteration Gershgorin rescaling (reference :198-341), and a higher-order
Taylor variant (orders 3/5; reference :342-549, default order 5).
"""
from __future__ import annotations

import math

from ..parallel import algebra as alg
from .common import (resolve, solver_log, iteration_log, finish_iterations,
                     maybe_permute, maybe_unpermute, identity_like,
                     real_scalar)
from .parameters import SolverParameters


def square_root(mat, params: SolverParameters | None = None, order: int = 5):
    return _selector(mat, params, compute_inverse=False, order=order)


def inverse_square_root(mat, params: SolverParameters | None = None,
                        order: int = 5):
    return _selector(mat, params, compute_inverse=True, order=order)


def _selector(mat, params, compute_inverse: bool, order: int):
    if order == 2:
        return _ns_order2(mat, params, compute_inverse)
    if order not in (3, 5):
        raise ValueError(f"unsupported Taylor order {order}")
    return _ns_taylor(mat, params, order, compute_inverse)


def _ns_order2(mat, params, compute_inverse):
    """reference SquareRootSolversModule.F90:198-341."""
    params, monitor = resolve(params)
    with solver_log(params, "Newton Schultz Inverse Square Root",
                    citations=("jansik2007linear",)):
        imat = identity_like(mat)
        y = mat                                   # square root iterate
        z = identity_like(mat)                    # inverse square root
        y, imat, z = maybe_permute(params, y, imat, z)

        if params.iters_per_sync > 1:
            y, z, total = _ns_order2_chunked(y, z, imat, params, monitor)
        else:
            total = 0
            with iteration_log(params) as ilog:
                for ii in range(params.max_iterations):
                    x = alg.matmul(y, z, threshold=params.threshold)
                    e_min, e_max = alg.gershgorin_bounds(x)
                    lam = 1.0 / max(abs(float(e_min)), abs(float(e_max)))
                    x = alg.scale(x, lam)
                    norm_value = real_scalar(
                        alg.norm(alg.increment(imat, x, 1.0, -1.0)))
                    tk = alg.increment(imat, x, 3.0, -1.0)
                    tk = alg.scale(tk, 0.5)
                    sq = math.sqrt(lam)
                    z = alg.scale(
                        alg.matmul(z, tk, threshold=params.threshold), sq)
                    y = alg.scale(
                        alg.matmul(tk, y, threshold=params.threshold), sq)
                    total = ii
                    monitor.append(norm_value)
                    if monitor.check_converged(params.be_verbose):
                        break
        finish_iterations(params, total + 1, z if compute_inverse else y,
                          monitor=monitor, solver="Square Root Solver")
        out = z if compute_inverse else y
        return maybe_unpermute(params, out)


def _ns_order2_chunked(y, z, imat, params, monitor):
    """Coupled Newton-Schulz fused iterations; the per-iteration Gershgorin
    rescale stays on device as traced scalars (see density._trs4_chunked
    for the chunking pattern)."""
    import jax.numpy as jnp
    from .common import run_chunked
    from .density import _pin_capacity

    thr = params.threshold
    k_pin, (y, z, imatp) = _pin_capacity(params, y, z, imat,
                                         n_carry=2)

    def step(carry, imatc):
        yc, zc = carry
        x = alg.matmul(yc, zc, threshold=thr)
        e_min, e_max = alg.gershgorin_bounds(x)
        lam = 1.0 / jnp.maximum(jnp.abs(e_min), jnp.abs(e_max))
        x = alg.scale(x, lam.astype(jnp.real(x.blocks).dtype))
        norm_value = jnp.real(
            alg.norm(alg.increment(imatc, x, 1.0, -1.0)))
        tk = alg.scale(alg.increment(imatc, x, 3.0, -1.0), 0.5)
        sq = jnp.sqrt(lam).astype(jnp.real(x.blocks).dtype)
        z_new = alg.scale(alg.matmul(zc, tk, threshold=thr), sq)
        y_new = alg.scale(alg.matmul(tk, yc, threshold=thr), sq)
        return (y_new, z_new), (norm_value,)

    with iteration_log(params) as ilog:
        (y, z), _, total = run_chunked(
            step, (y, z), (imatp,), params, monitor, ilog,
            k_pin=k_pin, aux_names=("Convergence",), conv_mode="value")
    return y, z, total


def _ns_taylor(mat, params, order, compute_inverse):
    """reference SquareRootSolversModule.F90:342-549."""
    params, monitor = resolve(params)
    with solver_log(params, "Newton Schultz Inverse Square Root",
                    citations=("jansik2007linear",),
                    extra={"Order": order}):
        imat = identity_like(mat)
        e_min, e_max = alg.gershgorin_bounds(mat)
        lam = 1.0 / max(abs(float(e_min)), abs(float(e_max)))
        y = alg.scale(mat, lam)
        z = identity_like(mat)
        y, imat, z = maybe_permute(params, y, imat, z)

        if params.iters_per_sync > 1:
            y, z, total = _ns_taylor_chunked(y, z, imat, order, params,
                                             monitor)
            finish_iterations(params, total + 1,
                              z if compute_inverse else y)
            sq = math.sqrt(lam)
            out = alg.scale(z, sq) if compute_inverse \
                else alg.scale(y, 1.0 / sq)
            return maybe_unpermute(params, out)
        total = 0
        with iteration_log(params):
            for ii in range(params.max_iterations):
                x = alg.increment(
                    alg.matmul(z, y, threshold=params.threshold),
                    imat, 1.0, -1.0)
                norm_value = real_scalar(alg.norm(x))
                x = _taylor_update(x, imat, order, params.threshold)
                z = alg.matmul(x, z, threshold=params.threshold)
                y = alg.matmul(y, x, threshold=params.threshold)
                total = ii
                monitor.append(norm_value)
                if monitor.check_converged(params.be_verbose):
                    break
        finish_iterations(params, total + 1, z if compute_inverse else y,
                          monitor=monitor, solver="Square Root Solver")
        sq = math.sqrt(lam)
        out = alg.scale(z, sq) if compute_inverse else alg.scale(y, 1.0 / sq)
        return maybe_unpermute(params, out)


def _taylor_update(x, imat, order, thr):
    """The order-3/5 Taylor polynomial of the NS correction (shared by the
    eager and chunked paths; reference SquareRootSolversModule.F90:342-549).
    """
    if order == 3:
        x2 = alg.matmul(x, x, threshold=thr)
        return alg.increment(
            alg.increment(imat, x, 1.0, -0.5), x2, 1.0, 0.375)
    aa, bb = -40.0 / 35.0, 48.0 / 35.0
    cc, dd = -64.0 / 35.0, 128.0 / 35.0
    a = (aa - 1.0) / 2.0
    b = bb * (a + 1.0) - cc - a * (a + 1.0) ** 2
    c = bb - b - a * (a + 1.0)
    d = dd - b * c
    x2 = alg.matmul(x, x, threshold=thr)
    t = alg.increment(x2, x, 1.0, a)
    t2 = alg.increment(alg.increment(alg.scale(imat, b), x), t, 1.0, 1.0)
    t = alg.increment(t, imat, 1.0, c)
    x = alg.increment(alg.matmul(t2, t, threshold=thr), imat, 1.0, d)
    return alg.scale(x, 35.0 / 128.0)


def _ns_taylor_chunked(y, z, imat, order, params, monitor):
    """Taylor NS fused iterations (see density._trs4_chunked)."""
    import jax.numpy as jnp
    from .common import run_chunked
    from .density import _pin_capacity

    thr = params.threshold
    k_pin, (y, z, imatp) = _pin_capacity(params, y, z, imat,
                                         n_carry=2)

    def step(carry, imatc):
        yc, zc = carry
        x = alg.increment(alg.matmul(zc, yc, threshold=thr),
                          imatc, 1.0, -1.0)
        norm_value = jnp.real(alg.norm(x))
        x = _taylor_update(x, imatc, order, thr)
        z_new = alg.matmul(x, zc, threshold=thr)
        y_new = alg.matmul(yc, x, threshold=thr)
        return (y_new, z_new), (norm_value,)

    with iteration_log(params) as ilog:
        (y, z), _, total = run_chunked(
            step, (y, z), (imatp,), params, monitor, ilog,
            k_pin=k_pin, aux_names=("Convergence",), conv_mode="value")
    return y, z, total


def dense_square_root(mat, params: SolverParameters | None = None):
    """reference SquareRootSolversModule.F90:62-94."""
    from .eigen import dense_matrix_function
    params, _ = resolve(params)
    with solver_log(params, "Square Root Solver"):
        return dense_matrix_function(mat, lambda w: w ** 0.5, params)


def dense_inverse_square_root(mat, params: SolverParameters | None = None):
    """reference SquareRootSolversModule.F90:130-163."""
    from .eigen import dense_matrix_function
    params, _ = resolve(params)
    with solver_log(params, "Square Root Solver"):
        return dense_matrix_function(mat, lambda w: w ** -0.5, params)
