"""Inverting an overlap matrix computed panel-by-panel.

Demonstrates how to divide up a matrix the way the device mesh does
(reference Examples/OverlapMatrix/ReadMe.md: each process computes the
elements of its own panel).  Here each (row, column) panel of the process
grid computes its own patch of a Gaussian overlap matrix
S_ij = exp(-|x_i - x_j|^2), the patches are filled into the distributed
matrix, and the inverse square root is computed.
"""
import argparse

import numpy as np

import ntpoly_tpu as nt


def panel_ranges(dim, n_parts, index):
    """The contiguous row range panel `index` of `n_parts` owns."""
    base = dim // n_parts
    start = base * index
    end = dim if index == n_parts - 1 else start + base
    return start, end


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--basis_functions", type=int, default=64)
    p.add_argument("--process_rows", type=int, default=1)
    p.add_argument("--process_columns", type=int, default=1)
    p.add_argument("--process_slices", type=int, default=1)
    p.add_argument("--threshold", type=float, default=1e-6)
    p.add_argument("--convergence_threshold", type=float, default=1e-7)
    p.add_argument("--output_file", required=True)
    args = p.parse_args()

    nt.ConstructGlobalProcessGrid(
        args.process_rows, args.process_columns, args.process_slices)
    if nt.GetGlobalIsRoot():
        nt.ActivateLogger()

    dim = args.basis_functions
    x = np.linspace(0.0, 10.0, dim)

    # Each grid panel computes only its own patch of the overlap — the
    # analogue of each MPI rank computing its local elements.
    tlist = nt.TripletList_r()
    t = nt.Triplet_r()
    for prow in range(nt.GetGlobalNumRows()):
        r0, r1 = panel_ranges(dim, nt.GetGlobalNumRows(), prow)
        for pcol in range(nt.GetGlobalNumColumns()):
            c0, c1 = panel_ranges(dim, nt.GetGlobalNumColumns(), pcol)
            for i in range(r0, r1):
                for j in range(c0, c1):
                    v = np.exp(-((x[i] - x[j]) ** 2))
                    if v > args.threshold:
                        t.index_row = i + 1
                        t.index_column = j + 1
                        t.point_value = float(v)
                        tlist.Append(t)

    overlap = nt.Matrix_ps(dim)
    overlap.FillFromTripletList(tlist)

    solver_parameters = nt.SolverParameters()
    solver_parameters.SetConvergeDiff(args.convergence_threshold)
    solver_parameters.SetThreshold(args.threshold)
    solver_parameters.SetVerbosity(True)

    isq = nt.Matrix_ps(dim)
    nt.SquareRootSolvers.InverseSquareRoot(overlap, isq, solver_parameters)

    isq.WriteToMatrixMarket(args.output_file)

    if nt.GetGlobalIsRoot():
        nt.DeactivateLogger()
    nt.DestructGlobalProcessGrid()


if __name__ == "__main__":
    main()
