"""Round-5 probe: does the fused-chunk TRS4 scan now FIT at 2^20 rows?

r4 ran the 2^20 flagship EAGER (iters_per_sync=1) because the chunk
program's live set exceeded HBM (19.3 GB vs 15.75 available) — the
two-op increment chains each materialized one extra full-capacity
matrix.  r5's increment_n fused those merges; this measures whether the
chunk program compiles + runs inside HBM now, and what the per-iteration
wall becomes at iters_per_sync in {1, 4, 8}.

Run standalone on the TPU; results land in PROFILE_r05_trs4mem.json.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np
import jax

from bench import _gapped_fn, _sync, _solve_stats
from ntpoly_tpu.parallel import pmatrix as PM
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.solvers import density
from ntpoly_tpu.solvers.parameters import SolverParameters
from ntpoly_tpu.utils.logging import activate_logger, deactivate_logger


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs = 1048576, 128
    h = PM.banded(dim, 16, _gapped_fn(), bs=bs, grid=grid,
                  dtype=np.float32)
    isq = PM.identity(dim, bs=bs, dtype=np.float32, grid=grid)
    nel = dim // 2
    results = {"dim": dim}
    sweep = [int(x) for x in os.environ.get(
        "NTX_TRS4_CHUNKS", "8,4,1").split(",")]
    for ips in sweep:
        params = SolverParameters(converge_diff=1e-3, threshold=1e-7,
                                  iters_per_sync=ips,
                                  compensated_scalars=True,
                                  convergence_metric="idempotency",
                                  k_out=5, matmul_method="pallas_band",
                                  on_overflow="warn", be_verbose=True)
        try:
            warm = params.copy()
            warm.be_verbose = False
            warm.max_iterations = max(2, ips)
            t0 = time.perf_counter()
            _sync(density.trs4(h, isq, float(nel), warm)[0])
            compile_s = time.perf_counter() - t0
            log = os.path.join(tempfile.mkdtemp(), f"trs4_c{ips}.yaml")
            activate_logger(log)
            t0 = time.perf_counter()
            rho, energy, mu = density.trs4(h, isq, float(nel), params)
            _sync(rho)
            wall = time.perf_counter() - t0
            deactivate_logger()
            iters, _ = _solve_stats(log)
            results[f"ips{ips}"] = {
                "wall_s": wall, "iterations": iters,
                "s_per_iteration": wall / iters if iters else None,
                "compile_plus_warm_s": compile_s,
                "rho_nnz": int(rho.nnz), "energy": float(energy)}
            print(f"ips={ips}: wall={wall:.2f}s iters={iters} "
                  f"s/it={wall/max(iters,1):.3f} warm={compile_s:.1f}s",
                  flush=True)
            del rho
        except Exception as e:
            results[f"ips{ips}"] = {"error": f"{type(e).__name__}: "
                                             f"{str(e)[:300]}"}
            print(f"ips={ips} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)
    with open("PROFILE_r05_trs4mem.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PROFILE_r05_trs4mem.json", flush=True)


if __name__ == "__main__":
    main()
