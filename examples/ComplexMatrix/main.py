"""Complex (Hermitian) matrices: exponential of a directed graph.

A directed graph's adjacency matrix A is not symmetric, so its functions
cannot be computed with Hermitian machinery directly.  The Guo trick
(reference Examples/ComplexMatrix/main.py ConstructGuoMatrix) builds the
Hermitian matrix G = (A + A^T)/2 + i (A - A^T)/2 whose exponential encodes
directed communicability, then computes exp(G) with the Chebyshev
scale-and-square exponential on the complex datatype.
"""
import argparse

import numpy as np

import ntpoly_tpu as nt


def generate_digraph(n, seed=5, prob=0.08):
    """Random one-way directed graph as triplets."""
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < prob).astype(float)
    np.fill_diagonal(a, 0.0)
    # strip reciprocated edges so the graph is genuinely directed
    both = (a > 0) & (a.T > 0)
    a[both] = 0.0
    return a


def construct_guo_matrix(a):
    """Hermitian embedding of a nonsymmetric matrix (Guo):
    G = (A + A^T)/2 + i (A - A^T)/2, built through the complex triplet
    interface."""
    n = a.shape[0]
    g = 0.5 * (a + a.T) + 0.5j * (a - a.T)
    i, j = np.nonzero(np.abs(g) > 0)
    tlist = nt.TripletList_c()
    t = nt.Triplet_c()
    for r, c in zip(i, j):
        t.index_row = int(r) + 1
        t.index_column = int(c) + 1
        t.point_value = complex(g[r, c])
        tlist.Append(t)
    gmat = nt.Matrix_ps(n)
    gmat.FillFromTripletList(tlist)
    return gmat


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--number_of_nodes", type=int, default=48)
    p.add_argument("--process_rows", type=int, default=1)
    p.add_argument("--process_columns", type=int, default=1)
    p.add_argument("--process_slices", type=int, default=1)
    p.add_argument("--threshold", type=float, default=1e-7)
    p.add_argument("--exponential_file", required=True)
    args = p.parse_args()

    nt.ConstructGlobalProcessGrid(
        args.process_rows, args.process_columns, args.process_slices)
    if nt.GetGlobalIsRoot():
        nt.ActivateLogger()

    a = generate_digraph(args.number_of_nodes)
    gmat = construct_guo_matrix(a)

    solver_parameters = nt.SolverParameters()
    solver_parameters.SetThreshold(args.threshold)

    omat = nt.Matrix_ps(args.number_of_nodes)
    nt.ExponentialSolvers.ComputeExponential(gmat, omat, solver_parameters)

    omat.WriteToMatrixMarket(args.exponential_file)

    if nt.GetGlobalIsRoot():
        nt.DeactivateLogger()
    nt.DestructGlobalProcessGrid()


if __name__ == "__main__":
    main()
