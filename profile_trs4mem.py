"""Round-5 probe: does the fused-increment TRS4 chunk program fit HBM at
2^20 rows?

r4's chunked scan compiled to 19.3 GB (15.75 available) and the flagship
fell back to the eager loop with its per-op dispatch tax (VERDICT r4
weak #1).  Round 5 fused the three-term merges (increment_n) — the
two-op chains materialized one extra full-capacity matrix per link —
and this probe measures whether the chunk program now fits, and what a
warm solve costs at each iters_per_sync.

Usage (serialize on the exclusive tunnel chip!):
    python profile_trs4mem.py --dim 1048576 --ips 1 3 9
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1048576)
    ap.add_argument("--ips", type=int, nargs="+", default=[1, 3])
    ap.add_argument("--k_out", type=int, default=5)
    ap.add_argument("--iters", type=int, default=9)
    args = ap.parse_args()

    import jax
    from ntpoly_tpu.parallel.grid import ProcessGrid
    from ntpoly_tpu.parallel import pmatrix as PM
    from ntpoly_tpu.solvers import density
    from ntpoly_tpu.solvers.parameters import SolverParameters
    from bench import _gapped_fn, _sync

    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs = args.dim, 128
    h = PM.banded(dim, 16, _gapped_fn(), bs=bs, grid=grid,
                  dtype=np.float32)
    isq = PM.identity(dim, bs=bs, dtype=np.float32, grid=grid)
    _sync(h)
    nel = dim // 2
    out = {}
    for ips in args.ips:
        params = SolverParameters(
            converge_diff=1e-3, threshold=1e-7, iters_per_sync=ips,
            compensated_scalars=True, convergence_metric="energy",
            k_out=args.k_out,
            matmul_method="pallas_band", on_overflow="warn",
            max_iterations=args.iters)
        try:
            t0 = time.perf_counter()
            rho, energy, mu = density.trs4(h, isq, float(nel), params)
            _sync(rho)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            rho, energy, mu = density.trs4(h, isq, float(nel), params)
            _sync(rho)
            warm = time.perf_counter() - t0
            out[ips] = {"ok": True, "cold_s": round(cold, 2),
                        "warm_s": round(warm, 2),
                        "energy": float(energy),
                        "rho_nnz": int(rho.nnz)}
            del rho
        except Exception as e:
            msg = str(e)
            out[ips] = {"ok": False, "error": type(e).__name__,
                        "detail": msg[:2000]}
        print(json.dumps({str(ips): out[ips]}), flush=True)
    print(json.dumps({"dim": dim, "k_out": args.k_out,
                      "results": {str(k): v for k, v in out.items()}}))


if __name__ == "__main__":
    main()
