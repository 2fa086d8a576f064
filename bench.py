"""Headline benchmark: threshold-filtered SpGEMM throughput per chip.

Runs the core primitive (block-sparse X @ X with threshold truncation, the
inner loop of every solver) on a banded tight-binding Hamiltonian at scale,
on whatever accelerator JAX finds (TPU in production, CPU under tests).

Prints ONE JSON line:
  {"metric": "spgemm_nnz_per_s", "value": N, "unit": "nnz/s",
   "vs_baseline": N}

nnz/s counts nonzeros processed per multiply (nnz(A) + nnz(B) + nnz(C)),
the accounting NTPoly's linear-scaling claims use.  vs_baseline is measured
against the driver target of 1e9 nnz/s per chip (BASELINE.md — the
reference publishes no in-repo numbers).

Synchronization note: on the tunneled TPU backend ``block_until_ready``
returns at enqueue, so timing uses a scalar readback barrier.
"""
import json
import time

import numpy as np


def _sync(mat):
    """Force device completion: tiny scalar readback."""
    import jax.numpy as jnp
    return float(jnp.sum(mat.blocks[0, 0, 0, 0]))


def main():
    import jax

    from ntpoly_tpu.parallel import algebra as alg
    from ntpoly_tpu.parallel import pmatrix as PM
    from ntpoly_tpu.parallel.grid import ProcessGrid
    from __graft_entry__ import _chain_hamiltonian

    on_cpu = jax.devices()[0].platform == "cpu"
    dim = 4096 if on_cpu else 16384
    bs = 128
    bandwidth = 160
    threshold = 1e-6

    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    i, j, v = _chain_hamiltonian(dim, bandwidth=bandwidth)
    # k=1 lets the fill pick the tight per-row block capacity.
    h = PM.empty(dim, bs=bs, dtype=np.float32, grid=grid, k=1)
    h = PM.fill_from_triplets(h, i, j, v.astype(np.float32))
    k_out = 2 * h.k + 1          # X@X doubles the band

    def one(x):
        return alg.matmul(x, x, threshold=threshold, k_out=k_out)

    c = one(h)
    _sync(c)                      # compile + settle

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        c = one(h)
    _sync(c)
    dt = (time.perf_counter() - t0) / reps

    nnz_a = int(h.nnz)
    nnz_c = int(c.nnz)
    nnz_per_s = (2 * nnz_a + nnz_c) / dt
    print(json.dumps({
        "metric": "spgemm_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_per_s / 1.0e9,
    }))


if __name__ == "__main__":
    main()
