"""Chemistry-workload tests (reference UnitTests/test_chemistry.py, 609 LoC):
the purification family through the shared basic_solver harness — density
vs scipy generalized-eigensolve, energy vs occupied-eigenvalue sum, chemical
potential inside the HOMO-LUMO gap — plus finite-temperature solvers,
McWeeny/EDM, and geometry extrapolation.  Real and complex variants.
"""
import numpy as np
import pytest
import scipy.linalg as sla
from scipy.io import mmread, mmwrite
from scipy.sparse import csr_matrix

import ntpoly_tpu as nt
from conftest import THRESHOLD, EXTRAP_THRESHOLD, rel_error, \
    solver_grid_sweep

DIM = 16
NEL = 5.0


@pytest.fixture(scope="module", autouse=True, params=solver_grid_sweep(),
                ids=lambda s: "x".join(map(str, s)))
def grid(request):
    """Swept over grid shapes incl. slices>1 (reference
    UnitTests/CMakeLists.txt:42-52)."""
    nt.ConstructGlobalProcessGrid(*request.param)
    yield
    nt.DestructGlobalProcessGrid()


@pytest.fixture(autouse=True)
def yaml_log(tmp_path):
    """Logger active for every test; output must re-parse as YAML
    (reference UnitTests/test_solvers.py:58-70)."""
    import yaml
    log_file = tmp_path / "log.yaml"
    nt.ActivateLogger(str(log_file))
    yield
    nt.DeactivateLogger()
    if log_file.exists() and log_file.stat().st_size:
        with open(log_file) as f:
            assert yaml.safe_load(f) is not None


class System:
    """A fake molecule: gapped Hermitian H + SPD overlap S."""

    def __init__(self, rng, is_complex=False, dim=DIM, nel=int(NEL)):
        h = rng.random((dim, dim))
        if is_complex:
            h = h + 1j * rng.random((dim, dim))
        h = 0.5 * (h + h.conj().T)
        w, v = np.linalg.eigh(h)
        w[nel:] += (w[-1] - w[0])          # open a gap after orbital nel
        self.h = (v * w) @ v.conj().T
        s = rng.random((dim, dim))
        if is_complex:
            s = s + 1j * rng.random((dim, dim))
        self.s = 0.1 * (s @ s.conj().T) + np.eye(dim)
        self.is_complex = is_complex
        self.dim, self.nel = dim, nel
        # scipy oracle
        self.isq = np.asarray(sla.funm(self.s, lambda x: 1 / np.sqrt(x)))
        worth = self.isq @ self.h @ self.isq
        self.ww, self.vv = np.linalg.eigh(worth)
        occ = self.vv[:, :nel]
        self.density = self.isq @ (occ @ occ.conj().T) @ self.isq
        self.energy = float(self.ww[:nel].sum())
        self.homo, self.lumo = self.ww[nel - 1], self.ww[nel]
        self.worth = worth

    def matrices(self, tmp_path):
        mmwrite(str(tmp_path / "h.mtx"), csr_matrix(self.h))
        mmwrite(str(tmp_path / "s.mtx"), csr_matrix(self.s))
        fock = nt.Matrix_ps(str(tmp_path / "h.mtx"))
        overlap = nt.Matrix_ps(str(tmp_path / "s.mtx"))
        return fock, overlap


def solver_params(load_balance_dim=None):
    sp = nt.SolverParameters()
    sp.SetConvergeDiff(1e-10)
    sp.SetVerbosity(True)
    if load_balance_dim:
        perm = nt.Permutation(load_balance_dim)
        perm.SetRandomPermutation()
        sp.SetLoadBalance(perm)
    return sp


def result_of(tmp_path, mat):
    mat.WriteToMatrixMarket(str(tmp_path / "res.mtx"))
    return np.asarray(mmread(str(tmp_path / "res.mtx")).todense())


def basic_solver(tmp_path, rng, routine, is_complex=False, cpcheck=True,
                 load_balance=False, extra_args=()):
    sys_ = System(rng, is_complex)
    fock, overlap = sys_.matrices(tmp_path)
    isq = nt.Matrix_ps(fock.GetActualDimension())
    density = nt.Matrix_ps(fock.GetActualDimension())
    sp = solver_params(fock.GetLogicalDimension() if load_balance else None)
    nt.SquareRootSolvers.InverseSquareRoot(overlap, isq, sp)
    result = routine(fock, isq, NEL, density, *extra_args, sp)
    energy, cp = result if isinstance(result, tuple) else (result, None)
    assert rel_error(result_of(tmp_path, density), sys_.density) <= THRESHOLD
    assert abs(energy - sys_.energy) <= THRESHOLD
    if cpcheck and cp is not None:
        assert sys_.homo < cp < sys_.lumo


@pytest.mark.parametrize("is_complex", [False, True], ids=["r", "c"])
@pytest.mark.parametrize("method", ["PM", "TRS2", "TRS4", "HPCP"])
def test_purification(tmp_path, rng, method, is_complex):
    basic_solver(tmp_path, rng, getattr(nt.DensityMatrixSolvers, method),
                 is_complex=is_complex)


def test_trs2_load_balanced(tmp_path, rng):
    basic_solver(tmp_path, rng, nt.DensityMatrixSolvers.TRS2,
                 load_balance=True)


def test_scale_and_fold(tmp_path, rng):
    sys_ = System(rng)
    fock, overlap = sys_.matrices(tmp_path)
    isq = nt.Matrix_ps(fock.GetActualDimension())
    density = nt.Matrix_ps(fock.GetActualDimension())
    sp = solver_params()
    nt.SquareRootSolvers.InverseSquareRoot(overlap, isq, sp)
    energy = nt.DensityMatrixSolvers.ScaleAndFold(
        fock, isq, NEL, density, sys_.homo, sys_.lumo, sp)
    assert rel_error(result_of(tmp_path, density), sys_.density) <= THRESHOLD
    assert abs(energy - sys_.energy) <= THRESHOLD


def test_dense_density(tmp_path, rng):
    basic_solver(tmp_path, rng, nt.DensityMatrixSolvers.DenseDensity)


def test_foe_finite_temperature(tmp_path, rng):
    beta = 50.0
    sys_ = System(rng)
    fock, overlap = sys_.matrices(tmp_path)
    isq = nt.Matrix_ps(fock.GetActualDimension())
    density = nt.Matrix_ps(fock.GetActualDimension())
    sp = solver_params()
    nt.SquareRootSolvers.InverseSquareRoot(overlap, isq, sp)
    energy, cp = nt.FermiOperator.ComputeDenseFOE(fock, isq, NEL, density,
                                                  beta, sp)
    # Fermi-Dirac oracle with bisected mu
    from scipy.optimize import brentq
    mu = brentq(lambda m: (1 / (1 + np.exp(beta * (sys_.ww - m)))).sum()
                - NEL, sys_.ww[0] - 5, sys_.ww[-1] + 5)
    occ = 1 / (1 + np.exp(beta * (sys_.ww - mu)))
    ref = sys_.isq @ ((sys_.vv * occ) @ sys_.vv.conj().T) @ sys_.isq
    assert rel_error(result_of(tmp_path, density), ref) <= THRESHOLD


@pytest.mark.parametrize("mode", ["gc", "c"])
def test_wom(tmp_path, rng, mode):
    beta = 50.0
    sys_ = System(rng)
    fock, overlap = sys_.matrices(tmp_path)
    isq = nt.Matrix_ps(fock.GetActualDimension())
    density = nt.Matrix_ps(fock.GetActualDimension())
    sp = solver_params()
    sp.SetStepThreshold(1e-4)
    nt.SquareRootSolvers.InverseSquareRoot(overlap, isq, sp)
    mu_mid = sys_.homo + 0.5 * (sys_.lumo - sys_.homo)
    if mode == "gc":
        energy = nt.FermiOperator.WOM_GC(fock, isq, density, mu_mid, beta,
                                         sp)
        occ = 1 / (1 + np.exp(beta * (sys_.ww - mu_mid)))
    else:
        energy = nt.FermiOperator.WOM_C(fock, isq, density, NEL, beta, sp)
        from scipy.optimize import brentq
        mu = brentq(lambda m: (1 / (1 + np.exp(beta * (sys_.ww - m)))).sum()
                    - NEL, sys_.ww[0] - 5, sys_.ww[-1] + 5)
        occ = 1 / (1 + np.exp(beta * (sys_.ww - mu)))
    ref = sys_.isq @ ((sys_.vv * occ) @ sys_.vv.conj().T) @ sys_.isq
    assert rel_error(result_of(tmp_path, density), ref) <= THRESHOLD
    ref_energy = float(np.real((occ * sys_.ww).sum()))
    assert abs(energy - ref_energy) <= THRESHOLD


def test_mcweeny_step(tmp_path, rng):
    sys_ = System(rng)
    d = sys_.density + 0.01 * np.eye(DIM)
    mmwrite(str(tmp_path / "d.mtx"), csr_matrix(d))
    mmwrite(str(tmp_path / "s.mtx"), csr_matrix(sys_.s))
    dmat = nt.Matrix_ps(str(tmp_path / "d.mtx"))
    smat = nt.Matrix_ps(str(tmp_path / "s.mtx"))
    dout = nt.Matrix_ps(dmat.GetActualDimension())
    nt.DensityMatrixSolvers.McWeenyStep(dmat, dout)
    ref = 3 * d @ d - 2 * d @ d @ d
    assert rel_error(result_of(tmp_path, dout), ref) <= THRESHOLD
    nt.DensityMatrixSolvers.McWeenyStep(dmat, smat, dout)
    ds = d @ sys_.s
    ref = 3 * ds @ d - 2 * ds @ ds @ d
    assert rel_error(result_of(tmp_path, dout), ref) <= THRESHOLD


def test_energy_density_matrix(tmp_path, rng):
    sys_ = System(rng)
    fock, _ = sys_.matrices(tmp_path)
    mmwrite(str(tmp_path / "d.mtx"), csr_matrix(sys_.density))
    dmat = nt.Matrix_ps(str(tmp_path / "d.mtx"))
    edm = nt.Matrix_ps(fock.GetActualDimension())
    nt.DensityMatrixSolvers.EnergyDensityMatrix(fock, dmat, edm)
    ref = sys_.density @ sys_.h @ sys_.density
    assert rel_error(result_of(tmp_path, edm), ref) <= THRESHOLD


def test_purification_extrapolate(tmp_path, rng):
    """Re-purify against a shrunk overlap (the physical direction the
    iteration converges for; see reference geometry files F1/S1/S2/D2)."""
    sys_ = System(rng)
    s2 = sys_.s * 0.95
    mmwrite(str(tmp_path / "d.mtx"), csr_matrix(sys_.density))
    mmwrite(str(tmp_path / "s2.mtx"), csr_matrix(s2))
    dmat = nt.Matrix_ps(str(tmp_path / "d.mtx"))
    s2mat = nt.Matrix_ps(str(tmp_path / "s2.mtx"))
    dnew = nt.Matrix_ps(dmat.GetActualDimension())
    nt.GeometryOptimization.PurificationExtrapolate(dmat, s2mat, NEL, dnew,
                                                    solver_params())
    got = result_of(tmp_path, dnew)
    # idempotent wrt the new overlap, with the right electron count
    assert rel_error(got @ s2 @ got, got) <= EXTRAP_THRESHOLD
    assert abs(np.trace(got @ s2) - NEL) <= EXTRAP_THRESHOLD


def test_lowdin_extrapolate(tmp_path, rng):
    sys_ = System(rng)
    s2 = sys_.s + 0.01 * np.eye(DIM)
    mmwrite(str(tmp_path / "d.mtx"), csr_matrix(sys_.density))
    mmwrite(str(tmp_path / "s.mtx"), csr_matrix(sys_.s))
    mmwrite(str(tmp_path / "s2.mtx"), csr_matrix(s2))
    dmat = nt.Matrix_ps(str(tmp_path / "d.mtx"))
    smat = nt.Matrix_ps(str(tmp_path / "s.mtx"))
    s2mat = nt.Matrix_ps(str(tmp_path / "s2.mtx"))
    dnew = nt.Matrix_ps(dmat.GetActualDimension())
    nt.GeometryOptimization.LowdinExtrapolate(dmat, smat, s2mat, dnew,
                                              solver_params())
    isq2 = np.asarray(sla.funm(s2, lambda x: 1 / np.sqrt(x)))
    worth2 = isq2 @ sys_.h @ isq2
    w2, v2 = np.linalg.eigh(worth2)
    occ = v2[:, :int(NEL)]
    ref = isq2 @ (occ @ occ.conj().T) @ isq2
    assert rel_error(result_of(tmp_path, dnew), ref) <= EXTRAP_THRESHOLD
