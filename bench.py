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

    import jax
    import jax.numpy as jnp

    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    i, j, v = _chain_hamiltonian(dim, bandwidth=bandwidth)
    # k=1 lets the fill pick the tight per-row block capacity.
    h = PM.empty(dim, bs=bs, dtype=np.float32, grid=grid, k=1)
    h = PM.fill_from_triplets(h, i, j, v.astype(np.float32))
    # Size the output capacity to the exact structural fill-in (NTPoly
    # sizes its memory pool the same way, GemmMatrix.f90:48-56).
    k_out = alg.fill_bound(h, h)

    reps = 20

    # A compiled chain of multiplies — how every solver iteration runs
    # (lax.while_loop / scan around matmul), so per-call dispatch latency
    # is paid once, not per multiply.  Per-step alpha defeats CSE.
    @jax.jit
    def chain(x):
        def step(carry, aa):
            c = alg.matmul(x, x, alpha=aa, threshold=threshold,
                           k_out=k_out, on_overflow="truncate")
            return carry + c.blocks[0, 0, 0, 0, 0], None
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.linspace(1.0, 2.0, reps,
                                           dtype=jnp.float32))
        return tot

    c = alg.matmul(h, h, threshold=threshold, k_out=k_out,
                   on_overflow="truncate")
    float(chain(h))               # compile + settle

    t0 = time.perf_counter()
    tot = chain(h)
    float(tot)                    # scalar readback barrier
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
