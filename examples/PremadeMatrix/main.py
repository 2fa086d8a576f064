"""Compute a density matrix from premade Hamiltonian / Overlap files.

The canonical NTPoly workflow (reference Examples/PremadeMatrix/main.py,
main.f90:74-120): read H and S from Matrix Market files, compute the
inverse square root of the overlap, then run TRS2 purification for the
density matrix, writing the result to file.  The solver runs with verbose
YAML logging and a random load-balancing permutation, exactly like the
reference example.
"""
import argparse

import ntpoly_tpu as nt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hamiltonian", required=True)
    p.add_argument("--overlap", required=True)
    p.add_argument("--density", required=True)
    p.add_argument("--process_rows", type=int, default=1)
    p.add_argument("--process_columns", type=int, default=1)
    p.add_argument("--process_slices", type=int, default=1)
    p.add_argument("--number_of_electrons", type=float, required=True)
    p.add_argument("--threshold", type=float, default=1e-6)
    p.add_argument("--converge_overlap", type=float, default=1e-3)
    p.add_argument("--converge_density", type=float, default=1e-5)
    args = p.parse_args()

    # Setup the process grid (a rows x cols x slices device mesh).
    nt.ConstructGlobalProcessGrid(
        args.process_rows, args.process_columns, args.process_slices)
    if nt.GetGlobalIsRoot():
        nt.ActivateLogger()
    nt.WriteGridInfo()

    # Read in the matrices from file.
    hamiltonian = nt.Matrix_ps(args.hamiltonian)
    overlap = nt.Matrix_ps(args.overlap)
    isq_overlap = nt.Matrix_ps(hamiltonian.GetActualDimension())
    density = nt.Matrix_ps(hamiltonian.GetActualDimension())

    # Set up the solver parameters.
    permutation = nt.Permutation(hamiltonian.GetLogicalDimension())
    permutation.SetRandomPermutation()
    solver_parameters = nt.SolverParameters()
    solver_parameters.SetConvergeDiff(args.converge_overlap)
    solver_parameters.SetThreshold(args.threshold)
    solver_parameters.SetLoadBalance(permutation)
    solver_parameters.SetVerbosity(True)

    # Orthogonalization: S^{-1/2}.
    nt.SquareRootSolvers.InverseSquareRoot(
        overlap, isq_overlap, solver_parameters)

    # Density matrix via TRS2 purification.
    solver_parameters.SetConvergeDiff(args.converge_density)
    energy, chemical_potential = nt.DensityMatrixSolvers.TRS2(
        hamiltonian, isq_overlap, args.number_of_electrons, density,
        solver_parameters)
    if nt.GetGlobalIsRoot():
        print("Energy:", energy)
        print("Chemical potential:", chemical_potential)

    density.WriteToMatrixMarket(args.density)

    if nt.GetGlobalIsRoot():
        nt.DeactivateLogger()
    nt.DestructGlobalProcessGrid()


if __name__ == "__main__":
    main()
