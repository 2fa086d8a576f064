"""Real 2x2 embedding of complex matrices (core/cplx.py) — the TPU path
for complex data.  f(E(C)) = E(f(C)) for every solver built from
multiplies and real-coefficient additions; verified here against the
native complex path (CPU supports both)."""
import numpy as np
import pytest

from ntpoly_tpu.core import cplx
from ntpoly_tpu.parallel import pmatrix as PM
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.solvers import exponential, sign, squareroot
from ntpoly_tpu.solvers.parameters import SolverParameters

from conftest import rel_error

DIM, BS = 24, 4


@pytest.fixture
def grid():
    return ProcessGrid(2, 2, 1)


def hermitian(rng, spd=False):
    h = rng.random((DIM, DIM)) + 1j * rng.random((DIM, DIM))
    h = 0.5 * (h + h.conj().T)
    if spd:
        h = h @ h.conj().T + np.eye(DIM)
    return h


def test_embed_extract_roundtrip(rng, grid):
    h = hermitian(rng)
    m = PM.from_dense(h, bs=BS, grid=grid)
    me = cplx.embed(m)
    assert me.dim == 2 * DIM
    # embedding structure: [[A, -B], [B, A]]
    d = np.asarray(PM.to_dense(me))
    assert rel_error(d[:DIM, :DIM], h.real) < 1e-14
    assert rel_error(d[DIM:, :DIM], h.imag) < 1e-14
    assert rel_error(d[:DIM, DIM:], -h.imag) < 1e-14
    back = cplx.extract(me)
    assert rel_error(np.asarray(PM.to_dense(back)), h) < 1e-14


def test_embedding_is_ring_homomorphism(rng, grid):
    from ntpoly_tpu.parallel import algebra as alg
    a = hermitian(rng)
    b = hermitian(rng)
    ma = PM.from_dense(a, bs=BS, grid=grid)
    mb = PM.from_dense(b, bs=BS, grid=grid)
    prod_then_embed = cplx.embed(alg.matmul(ma, mb))
    embed_then_prod = alg.matmul(cplx.embed(ma), cplx.embed(mb))
    assert rel_error(np.asarray(PM.to_dense(embed_then_prod)),
                     np.asarray(PM.to_dense(prod_then_embed))) < 1e-13


@pytest.mark.parametrize("solver", ["sign", "isq", "exp"])
def test_solver_commutes_with_embedding(rng, grid, solver):
    """f(E(C)) == E(f(C)): run the solver natively on the complex matrix
    and on its real embedding; extract and compare."""
    params = SolverParameters(converge_diff=1e-10, threshold=1e-12)
    if solver == "sign":
        h = hermitian(rng) - 0.7 * np.eye(DIM)
        fn = lambda m: sign.sign_function(m, params)
    elif solver == "isq":
        h = hermitian(rng, spd=True)
        fn = lambda m: squareroot.inverse_square_root(m, params)
    else:
        h = 0.1 * hermitian(rng)
        fn = lambda m: exponential.compute_exponential(m, params)
    m = PM.from_dense(h, bs=BS, grid=grid)
    native_result = np.asarray(PM.to_dense(fn(m)))
    embedded_result = cplx.extract(fn(cplx.embed(m)))
    assert rel_error(np.asarray(PM.to_dense(embedded_result)),
                     native_result) < 1e-6
