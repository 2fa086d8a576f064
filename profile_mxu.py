"""Calibrate sustained MXU rates at the shapes SpGEMM could use."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def bench_op(name, fn, x, flops, reps=20):
    @jax.jit
    def chain(a):
        def step(c, aa):
            return c + fn(a * aa), None
        tot, _ = lax.scan(step, jnp.zeros((), jnp.float32),
                          jnp.linspace(1., 2., reps, jnp.float32))
        return tot
    float(chain(x))
    t0 = time.perf_counter()
    float(chain(x))
    dt = (time.perf_counter() - t0) / reps
    log(f"{name}: {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TFLOP/s")


def main():
    log(f"devices: {jax.devices()}")
    H = lax.Precision.HIGHEST
    D = lax.Precision.DEFAULT

    def bmm(b, m, k, n, prec, tag):
        y = jnp.ones((b, k, n), jnp.float32)
        x = jnp.ones((b, m, k), jnp.float32)
        bench_op(f"bmm{b}x({m},{k})@({k},{n})-{tag}",
                 lambda a: jnp.sum(jnp.einsum('bij,bjk->bik', a, y,
                                              precision=prec)),
                 x, 2 * b * m * k * n)

    bmm(128, 128, 640, 1152, H, "HIGHEST")   # aligned-panel dot
    bmm(128, 128, 640, 640, H, "HIGHEST")    # narrower RHS
    bmm(128, 256, 1280, 1152, H, "HIGHEST")  # 2-row-group aligned
    bmm(640, 128, 128, 640, D, "DEFAULT")    # bf16 at current shape
    n = 2048
    x = jnp.ones((n, n), jnp.float32)
    bench_op("square2048-HIGHEST",
             lambda a: jnp.sum(jnp.matmul(a, a, precision=H)), x, 2 * n**3)


if __name__ == "__main__":
    main()
