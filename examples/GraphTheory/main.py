"""Network centrality via the matrix resolvent.

Builds a ring network with random long-range links and computes the Katz
resolvent (I - a*A)^{-1} with the Hotelling inverse solver (reference
Examples/GraphTheory/main.py: same network construction and
resolvent-by-Invert flow).  The entries of the result rank node-to-node
communicability.
"""
import argparse
import random

import ntpoly_tpu as nt


def build_network(n, extra_connections, seed=17):
    rng = random.Random(seed)
    tlist = nt.TripletList_r()
    t = nt.Triplet_r()
    # self-connections
    for node in range(n):
        t.index_row = node + 1
        t.index_column = node + 1
        t.point_value = 1.0
        tlist.Append(t)
    # nearest neighbors on the ring
    for node in range(n):
        t.index_row = node + 1
        t.point_value = 0.1
        for nb in (node - 1, node + 1):
            if 0 <= nb < n:
                t.index_column = nb + 1
                tlist.Append(t)
    # random extra links (each node used at most once, no self/adjacent)
    used = set()
    count = 0
    while count < extra_connections:
        src = rng.randint(0, n - 1)
        dst = rng.randint(0, n - 1)
        if (src in used or dst in used or abs(src - dst) <= 1):
            continue
        used.update((src, dst))
        count += 1
        for r, c in ((src, dst), (dst, src)):
            t.index_row = r + 1
            t.index_column = c + 1
            t.point_value = 0.1
            tlist.Append(t)
    return tlist


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_file", required=True)
    p.add_argument("--process_rows", type=int, default=1)
    p.add_argument("--process_columns", type=int, default=1)
    p.add_argument("--process_slices", type=int, default=1)
    p.add_argument("--threshold", type=float, default=1e-6)
    p.add_argument("--convergence_threshold", type=float, default=1e-8)
    p.add_argument("--attenuation", type=float, default=0.7)
    p.add_argument("--number_of_nodes", type=int, default=128)
    p.add_argument("--extra_connections", type=int, default=10)
    args = p.parse_args()

    nt.ConstructGlobalProcessGrid(
        args.process_rows, args.process_columns, args.process_slices)
    if nt.GetGlobalIsRoot():
        nt.ActivateLogger()

    solver_parameters = nt.SolverParameters()
    solver_parameters.SetThreshold(args.threshold)
    solver_parameters.SetConvergeDiff(args.convergence_threshold)
    solver_parameters.SetVerbosity(True)

    network = nt.Matrix_ps(args.number_of_nodes)
    network.FillFromTripletList(
        build_network(args.number_of_nodes, args.extra_connections))

    # Katz resolvent: invert I - attenuation * A.
    resolvent_arg = nt.Matrix_ps(args.number_of_nodes)
    resolvent_arg.FillIdentity()
    resolvent_arg.Increment(network, alpha=-args.attenuation)

    result = nt.Matrix_ps(args.number_of_nodes)
    nt.InverseSolvers.Invert(resolvent_arg, result, solver_parameters)

    result.WriteToMatrixMarket(args.output_file)

    if nt.GetGlobalIsRoot():
        nt.DeactivateLogger()
    nt.DestructGlobalProcessGrid()


if __name__ == "__main__":
    main()
