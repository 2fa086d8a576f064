"""Ad-hoc: where does the SpGEMM multiply spend its time on TPU?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import _chain, _fill
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.ops import spgemm_pallas


def timeit(fn, reps=20):
    fn()  # compile
    t0 = time.perf_counter()
    r = fn()
    jax.block_until_ready(r)
    # scalar readback barrier (tunneled backend)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0)
    return dt


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs = 16384, 128
    h = _fill(dim, bs, grid, *_chain(dim, bandwidth=160))
    k_out = alg.fill_bound(h, h)
    print(f"h.k={h.k} k_out={k_out} nb={h.nb} nnz={int(h.nnz)}")
    thr = 1e-6
    reps = 20

    def chain_method(method):
        @jax.jit
        def chain(x):
            def step(carry, aa):
                c = alg.matmul(x, x, alpha=aa, threshold=thr, k_out=k_out,
                               on_overflow="truncate", method=method)
                return carry + c.blocks[0, 0, 0, 0, 0], None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., reps, jnp.float32))
            return tot
        return chain

    c = alg.matmul(h, h, threshold=thr, k_out=k_out, on_overflow="truncate")
    nnz = 2 * int(h.nnz) + int(c.nnz)
    for m in ["pallas", "cand", "acc", "dense"]:
        try:
            fn = chain_method(m)
            dt = timeit(lambda: fn(h)) / reps
            print(f"method={m:7s}  {dt*1e3:8.3f} ms/mult  "
                  f"{nnz/dt/1e9:8.2f} Gnnz/s")
        except Exception as e:
            print(f"method={m}: {type(e).__name__} {str(e)[:200]}")

    # structure pass alone
    ac = h.col_ids[0, :, :]  # [nb, k] panel (pc=1)
    @jax.jit
    def splan(acols):
        def step(carry, _):
            plan, occ, ucnt = spgemm_pallas.structure_plan(acols, acols,
                                                           k_out)
            return carry + ucnt[0], None
        tot, _ = jax.lax.scan(step, jnp.int32(0), None, length=reps)
        return tot
    dt = timeit(lambda: splan(ac)) / reps
    print(f"structure_plan alone: {dt*1e3:8.3f} ms")

    # kernel alone (plan precomputed outside the timed region)
    ab = h.blocks[0]
    @jax.jit
    def kern(acols, ablocks):
        def step(carry, aa):
            cc, cb, _ = spgemm_pallas.spgemm_pallas(
                acols, ablocks * aa, acols, ablocks, k_out=k_out,
                threshold=thr, alpha=1.0)
            return carry + cb[0, 0, 0, 0], None
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.linspace(1., 2., reps, jnp.float32))
        return tot
    dt = timeit(lambda: kern(ac, ab)) / reps
    print(f"pallas kernel(+plan): {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
