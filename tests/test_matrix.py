"""Local (single-device) matrix tests vs scipy
(reference UnitTests/test_matrix.py, 468 LoC — runs only at nproc=1)."""
import numpy as np
import pytest
from scipy.io import mmread, mmwrite
from scipy.sparse import csr_matrix

import ntpoly_tpu as nt
from conftest import rel_error


def make(rng, rows=8, cols=7, density=0.5, is_complex=False):
    m = rng.random((rows, cols)) * (rng.random((rows, cols)) < density)
    if is_complex:
        m = m + 1j * (rng.random((rows, cols)) * (m != 0))
    return m


def params(is_complex):
    return (nt.Matrix_lsc, nt.TripletList_c, nt.MatrixMemoryPool_c) \
        if is_complex else \
        (nt.Matrix_lsr, nt.TripletList_r, nt.MatrixMemoryPool_r)


@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
def test_read_write(tmp_path, rng, is_complex):
    SMatrix, _, _ = params(is_complex)
    m = make(rng, is_complex=is_complex)
    mmwrite(str(tmp_path / "in.mtx"), csr_matrix(m))
    a = SMatrix(str(tmp_path / "in.mtx"))
    assert (a.GetRows(), a.GetColumns()) == m.shape
    a.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(), m) < 1e-14


@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
def test_from_triplets(tmp_path, rng, is_complex):
    SMatrix, TList, _ = params(is_complex)
    m = make(rng, 6, 6, is_complex=is_complex)
    tl = TList(0)
    TripletT = nt.Triplet_c if is_complex else nt.Triplet_r
    for i, j in zip(*np.nonzero(m)):
        tl.Append(TripletT(int(i) + 1, int(j) + 1, m[i, j]))
    a = SMatrix(tl, 6, 6)
    a.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(), m) < 1e-14


@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
def test_addition(tmp_path, rng, is_complex):
    SMatrix, _, _ = params(is_complex)
    a, b = (make(rng, 7, 7, is_complex=is_complex) for _ in range(2))
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(a))
    mmwrite(str(tmp_path / "b.mtx"), csr_matrix(b))
    ma = SMatrix(str(tmp_path / "a.mtx"))
    mb = SMatrix(str(tmp_path / "b.mtx"))
    mb.Increment(ma, 1.25, 0.0)
    mb.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(),
                     b + 1.25 * a) < 1e-14


@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
def test_dot(tmp_path, rng, is_complex):
    SMatrix, _, _ = params(is_complex)
    a, b = (make(rng, 7, 7, is_complex=is_complex) for _ in range(2))
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(a))
    mmwrite(str(tmp_path / "b.mtx"), csr_matrix(b))
    ma = SMatrix(str(tmp_path / "a.mtx"))
    mb = SMatrix(str(tmp_path / "b.mtx"))
    got = mb.Dot(ma)
    ref = np.sum(np.conj(b) * a) if is_complex else np.sum(a * b)
    assert abs(got - ref) < 1e-12


@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
def test_transpose(tmp_path, rng, is_complex):
    SMatrix, _, _ = params(is_complex)
    m = make(rng, 8, 5, is_complex=is_complex)
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(m))
    ma = SMatrix(str(tmp_path / "a.mtx"))
    mt = SMatrix(ma.GetRows(), ma.GetColumns())
    mt.Transpose(ma)
    mt.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(), m.T) \
        < 1e-14


def test_conjugate_transpose(tmp_path, rng):
    m = make(rng, 6, 9, is_complex=True)
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(m))
    ma = nt.Matrix_lsc(str(tmp_path / "a.mtx"))
    mt = nt.Matrix_lsc(ma.GetRows(), ma.GetColumns())
    mt.Transpose(ma)
    mt.Conjugate()
    mt.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(),
                     m.conj().T) < 1e-14


@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
def test_pairwise(tmp_path, rng, is_complex):
    SMatrix, _, _ = params(is_complex)
    a, b = (make(rng, 7, 7, is_complex=is_complex) for _ in range(2))
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(a))
    mmwrite(str(tmp_path / "b.mtx"), csr_matrix(b))
    ma = SMatrix(str(tmp_path / "a.mtx"))
    mb = SMatrix(str(tmp_path / "b.mtx"))
    mc = SMatrix(ma.GetColumns(), ma.GetRows())
    mc.PairwiseMultiply(ma, mb)
    mc.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(), a * b) \
        < 1e-14


@pytest.mark.parametrize("ta,tb", [(False, False), (False, True),
                                   (True, False), (True, True)],
                         ids=["nn", "nt", "tn", "tt"])
@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
def test_multiply(tmp_path, rng, ta, tb, is_complex):
    SMatrix, _, MPool = params(is_complex)
    a = make(rng, 6, 4, is_complex=is_complex)
    b = make(rng, 4, 7, is_complex=is_complex)
    opa = a.T if ta else a
    opb = b.T if tb else b
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(opa))
    mmwrite(str(tmp_path / "b.mtx"), csr_matrix(opb))
    ma = SMatrix(str(tmp_path / "a.mtx"))
    mb = SMatrix(str(tmp_path / "b.mtx"))
    mc = SMatrix(7, 6)
    pool = MPool(7, 6)
    alpha, beta = 1.5, 0.0
    mc.Gemm(ma, mb, ta, tb, alpha, beta, 0.0, pool)
    mc.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(),
                     alpha * a @ b) < 1e-13


def test_extract_row_column(tmp_path, rng):
    m = make(rng, 8, 5)
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(m))
    ma = nt.Matrix_lsr(str(tmp_path / "a.mtx"))
    row = nt.Matrix_lsr(ma.GetColumns(), 1)
    ma.ExtractRow(3, row)
    row.WriteToMatrixMarket(str(tmp_path / "row.mtx"))
    got = np.zeros((1, 5))
    got_m = mmread(str(tmp_path / "row.mtx")).todense()
    assert rel_error(got_m, m[3:4, :]) < 1e-14
    col = nt.Matrix_lsr(1, ma.GetRows())
    ma.ExtractColumn(2, col)
    col.WriteToMatrixMarket(str(tmp_path / "col.mtx"))
    assert rel_error(mmread(str(tmp_path / "col.mtx")).todense(),
                     m[:, 2:3]) < 1e-14


def test_diagonal_scale(tmp_path, rng):
    m = make(rng, 6, 6)
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(m))
    ma = nt.Matrix_lsr(str(tmp_path / "a.mtx"))
    d = rng.random(6)
    tl = nt.TripletList_r(0)
    for i, v in enumerate(d):
        tl.Append(nt.Triplet_r(i + 1, i + 1, v))
    ma.DiagonalScale(tl)
    ma.WriteToMatrixMarket(str(tmp_path / "out.mtx"))
    assert rel_error(mmread(str(tmp_path / "out.mtx")).todense(),
                     m * d[None, :]) < 1e-14


def test_scale_and_triplet_roundtrip(tmp_path, rng):
    m = make(rng, 7, 7)
    mmwrite(str(tmp_path / "a.mtx"), csr_matrix(m))
    ma = nt.Matrix_lsr(str(tmp_path / "a.mtx"))
    ma.Scale(0.5)
    tl = nt.TripletList_r(0)
    ma.MatrixToTripletList(tl)
    got = np.zeros((7, 7))
    for k in range(tl.GetSize()):
        t = tl.GetTripletAt(k)
        got[t.index_row - 1, t.index_column - 1] = t.point_value
    assert rel_error(got, 0.5 * m) < 1e-14
