"""Ad-hoc: time the v2 pipelined pallas kernel on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import _chain, _fill
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel.grid import ProcessGrid


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs = 16384, 128
    h = _fill(dim, bs, grid, *_chain(dim, bandwidth=160))
    k_out = alg.fill_bound(h, h)
    print(f"h.k={h.k} k_out={k_out} nb={h.nb} nnz={int(h.nnz)}")
    thr = 1e-6
    reps = 20

    c = alg.matmul(h, h, threshold=thr, k_out=k_out, on_overflow="truncate")
    nnz = 2 * int(h.nnz) + int(c.nnz)

    for m in ["pallas"]:
        @jax.jit
        def chain(x):
            def step(carry, aa):
                cc = alg.matmul(x, x, alpha=aa, threshold=thr, k_out=k_out,
                                on_overflow="truncate", method=m)
                return carry + cc.blocks[0, 0, 0, 0, 0], None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., reps, jnp.float32))
            return tot
        float(chain(h))
        t0 = time.perf_counter()
        float(chain(h))
        dt = (time.perf_counter() - t0) / reps
        print(f"method={m:7s}  {dt*1e3:8.3f} ms/mult  "
              f"{nnz/dt/1e9:8.2f} Gnnz/s")


if __name__ == "__main__":
    main()
