"""Fermi operator expansion
(reference Source/Fortran/FermiOperatorModule.F90).

ComputeDenseFOE (:33-242): diagonalize the working Hamiltonian, fill
occupations (step function, or Fermi-Dirac at finite inverse temperature
with a mu bisection hitting the target trace), K = V diag(occ) V^H back in
the non-orthogonal basis.

WOM_GC / WOM_C (:349-648): wave-operator minimization in the grand-canonical
/ canonical ensemble — RK2 integration in inverse temperature with adaptive
step control via step_thresh, density K = W^2.
"""
from __future__ import annotations

import math

import numpy as np

from ..parallel import algebra as alg
from ..parallel import pmatrix as PM
from .common import (resolve, solver_log, iteration_log, identity_like,
                     orthogonalize, deorthogonalize, maybe_permute,
                     maybe_unpermute, real_scalar, print_matrix_information)
from ..utils.logging import logger
from .parameters import SolverParameters


def compute_dense_foe(h, isq, trace, inv_temp: float | None = None,
                      params: SolverParameters | None = None):
    """Returns (K, energy, chemical_potential)."""
    from .eigen import eigh
    params, _ = resolve(params)
    do_smearing = inv_temp is not None
    with solver_log(params, "Density Matrix Solver",
                    "Dense FOE" if do_smearing else "Dense Step Function"):
        isqt = alg.transpose(isq).conjugate()
        wh = alg.matmul(alg.matmul(isq, h, threshold=params.threshold),
                        isqt, threshold=params.threshold)
        w, v = eigh(wh)
        eigs = np.asarray(w, dtype=np.float64)
        n = h.dim

        if do_smearing:
            left, right = float(eigs.min()), float(eigs.max())
            mu = 0.5 * (left + right)
            for _ in range(10 * params.max_iterations):
                mu = left + (right - left) / 2
                sval = inv_temp * (eigs - mu)
                occ = np.where(sval > 30,
                               0.5 * (1.0 - _erf_vec(sval)),
                               1.0 / (1.0 + np.exp(np.minimum(sval, 700))))
                sv = float(occ.sum())
                if abs(trace - sv) < 1e-8:
                    break
                if sv > trace:
                    right = mu
                else:
                    left = mu
            energy = float((occ * eigs).sum())
            occ = np.where(occ < 0, 0.0, occ)
            sqrt_occ = np.sqrt(occ)
        else:
            nocc = int(math.floor(trace))
            homo = eigs[nocc - 1]
            lumo = eigs[nocc] if nocc < n else eigs[-1]
            occ_frac = nocc + 1 - trace
            mu = homo + occ_frac * 0.5 * (lumo - homo)
            occ = np.zeros(n)
            occ[:nocc] = 1.0
            energy = float(eigs[:nocc].sum())
            if math.ceil(trace) > nocc:          # fractional occupation
                frac = trace - nocc
                occ[nocc] = frac
                energy += frac * eigs[nocc]
            sqrt_occ = np.sqrt(occ)

        if params.be_verbose:
            logger.write_header("Chemical Potential Search")
            logger.enter_sub_log()
            logger.write_element("Potential", float(mu))
            logger.exit_sub_log()

        import jax.numpy as jnp
        vs = jnp.asarray(v) * jnp.asarray(sqrt_occ, v.dtype)[None, :]
        wd = vs @ jnp.conj(vs).T
        if params.threshold > 0:
            wd = jnp.where(jnp.abs(wd) > params.threshold, wd, 0)
        wd_ps = PM.from_dense(np.asarray(wd), bs=h.bs, k=h.k, grid=h.grid,
                              dtype=h.dtype)
        k = alg.matmul(alg.matmul(isqt, wd_ps, threshold=params.threshold),
                       isq, threshold=params.threshold)
    return k, energy, float(mu)


def _erf_vec(x):
    from scipy.special import erf
    return erf(x)


def wom_gc(h, isq, chemical_potential, inv_temp,
           params: SolverParameters | None = None):
    """Grand-canonical WOM (reference WOM_GC)."""
    params, _ = resolve(params)
    with solver_log(params, "Density Matrix Solver", "WOM_GC",
                    extra={"Inverse Temperature": inv_temp,
                           "Chemical Potential": chemical_potential}):
        return _wom(h, isq, inv_temp, params, mu=chemical_potential)


def wom_c(h, isq, trace, inv_temp, params: SolverParameters | None = None):
    """Canonical WOM (reference WOM_C)."""
    params, _ = resolve(params)
    with solver_log(params, "Density Matrix Solver", "WOM_C",
                    extra={"Inverse Temperature": inv_temp,
                           "Target Trace": trace}):
        return _wom(h, isq, inv_temp, params, trace=trace)


def _compute_x(w, imat, threshold):
    """X = W (I - W^2) (reference ComputeX)."""
    w2 = alg.matmul(w, w, threshold=threshold)
    tmp = alg.increment(imat, w2, 1.0, -1.0)
    return alg.matmul(w, tmp, threshold=threshold), w2


def _gc_step(x, a, threshold):
    """K0 = -X A / 2 (reference ComputeGCStep)."""
    return alg.matmul(x, a, alpha=-0.5, threshold=threshold)


def _c_step(x, a, w, threshold):
    """K0 = -(XA - (<W,XA>/<X,W>) X)/2 (reference ComputeCStep)."""
    xa = alg.matmul(x, a, threshold=threshold)
    denom = real_scalar(alg.dot(x, w))
    num = real_scalar(alg.dot(w, xa))
    out = alg.increment(xa, x, 1.0, -num / denom)
    return alg.scale(out, -0.5)


def _wom(h, isq, inv_temp, params, mu=None, trace=None):
    """reference WOM_Implementation (FermiOperatorModule.F90:349-538)."""
    gc = mu is not None
    imat = identity_like(h)
    wh, isqt = orthogonalize(h, isq, params)
    wh, imat = maybe_permute(params, wh, imat)

    if gc:
        a = alg.increment(wh, imat, 1.0, -mu)
    else:
        a = wh
    if gc:
        w = alg.scale(imat, 1.0 / math.sqrt(2.0))
    else:
        w = alg.scale(imat, math.sqrt(trace / h.dim))

    ii = 0
    b_i = 0.0
    step = 1.0
    energy = 0.0
    korth = None
    with iteration_log(params) as ilog:
        while b_i < inv_temp:
            step = min(step, inv_temp - b_i)
            x, korth = _compute_x(w, imat, params.threshold)
            energy = real_scalar(alg.dot(wh, korth))
            k0 = _gc_step(x, a, params.threshold) if gc \
                else _c_step(x, a, w, params.threshold)
            ii += 1

            def rk_stage(step_val):
                rk1 = alg.increment(w, k0, 1.0, step_val,
                                    threshold=params.threshold)
                x1, _ = _compute_x(rk1, imat, params.threshold)
                k1 = _gc_step(x1, a, params.threshold) if gc \
                    else _c_step(x1, a, rk1, params.threshold)
                rk2 = alg.increment(
                    alg.increment(w, k0, 1.0, step_val * 0.5,
                                  threshold=params.threshold),
                    k1, 1.0, step_val * 0.5, threshold=params.threshold)
                err_val = real_scalar(
                    alg.norm(alg.increment(rk1, rk2, 1.0, -1.0)))
                return rk1, rk2, err_val

            rk1, rk2, err = rk_stage(step)
            ii += 1
            while err > 1.1 * params.step_thresh:
                step = step * (params.step_thresh / err) ** 0.5
                rk1, rk2, err = rk_stage(step)
                ii += 1

            err2 = real_scalar(
                alg.norm(alg.increment(rk2, w, 1.0, -1.0)))
            if err2 < params.converge_diff:
                logger.write_comment("Early Exit Triggered")
                break
            w = rk2
            b_i_old = b_i
            b_i = b_i + step
            step = step * (params.step_thresh / err) ** 0.5
            ilog.step(**{"Beta": b_i_old, "Energy": energy,
                         "Norm of Change": err2})

    korth = alg.matmul(w, w, threshold=params.threshold)
    energy = real_scalar(alg.dot(wh, korth))
    if params.be_verbose:
        logger.write_element("Total_Iterations", ii)
        print_matrix_information(w)
    korth = maybe_unpermute(params, korth)
    k = deorthogonalize(korth, isq, isqt, params)
    return k, energy
