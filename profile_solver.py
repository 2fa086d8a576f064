"""Round-4 profile: slope-timed FULL solver iterations (r3 VERDICT weak #4).

r3's solver wall-times were tunnel-dispatch dominated (trs4_100k logged
2.05 s/iteration wall while its compute was ~10x smaller), so per-chip
solver pace was unevidenced.  This applies profile_v4.py's slope
methodology to one complete TRS4 iteration — 2 SpGEMMs, 4 increments,
3 dots, the sigma select — as one scanned body at the 10k and 100k
bench shapes, and records the iteration pace next to the sum of its
kernel-level parts.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _gapped_fn
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel import pmatrix as PM
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.solvers.common import pad_capacity, select_matrix



def consume(out):
    tot = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        tot += jnp.sum(jnp.abs(leaf)).astype(jnp.float32) * 1e-30
    return tot


def slope_time(make_run, reps):
    t = {}
    for n in (reps, 3 * reps):
        fn = make_run(n)
        fn()  # compile
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        t[n] = min(times)
    return (t[3 * reps] - t[reps]) / (2 * reps)


def profile_shape(dim, bs, results, reps):
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    thr = 1e-7
    h = PM.banded(dim, 16, _gapped_fn(), bs=bs, grid=grid,
                  dtype=np.float32)
    imat = PM.identity(dim, bs=bs, dtype=np.float32, grid=grid)
    e_min, e_max = alg.gershgorin_bounds(h)
    e_min, e_max = float(e_min), float(e_max)
    x0 = alg.increment(h, imat, alpha=-1.0 / (e_max - e_min),
                       beta=e_max / (e_max - e_min))
    k_pin = min(h.panel_nb, 8)    # the bench's pin
    x0 = pad_capacity(x0, k_pin)
    whp = pad_capacity(h, k_pin)
    imatp = pad_capacity(imat, k_pin)
    trace = jnp.float32(dim // 2)
    shape_key = f"dim{dim}"
    rec = results.setdefault(shape_key, {})
    rec["config"] = dict(dim=dim, bs=bs, k=int(h.k), k_pin=int(k_pin),
                         nnz=int(h.nnz))
    print(f"--- dim={dim} bs={bs} k={h.k} k_pin={k_pin}", flush=True)

    def trs4_step(xc, whc, imatc):
        """One full TRS4 iteration (the _trs4_chunked step body under the
        pinned-capacity policy the solver installs)."""
        with alg.capacity_policy(k_out=k_pin, on_overflow="truncate"):
            x2 = alg.matmul(xc, xc, threshold=thr)
            fx = alg.increment(x2, xc, -3.0, 4.0, threshold=thr)
            gx = alg.increment(
                alg.increment(imatc, xc, 1.0, -2.0, threshold=thr),
                x2, 1.0, 1.0, threshold=thr)
            trace_fx = jnp.real(alg.dot(x2, fx))
            trace_gx = jnp.real(alg.dot(x2, gx))
            sigma = jnp.where(jnp.abs(trace_gx) < 1e-14, 3.0,
                              (trace - trace_fx) / trace_gx)
            poly = alg.increment(fx, gx, 1.0, sigma, threshold=thr)
            x_mid = alg.matmul(x2, poly, threshold=thr)
            x_hi = alg.increment(xc, x2, 2.0, -1.0, threshold=thr)
            x_new = select_matrix(
                sigma > 6.0, x_hi, select_matrix(sigma < 0.0, x2, x_mid))
            energy = jnp.real(alg.dot(x_new, whc))
        return x_new, energy

    def make_iter_run(n):
        # operands ride as jit ARGUMENTS — closed-over operands become
        # HLO constants and overflow the tunnel's compile request limit
        @jax.jit
        def run(x0_in, whp_in, imatp_in):
            def step(carry, aa):
                x_in = x0_in.with_data(x0_in.col_ids, x0_in.blocks * aa)
                x_new, energy = trs4_step(x_in, whp_in, imatp_in)
                return carry + consume((x_new.blocks, energy)), None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
            return tot
        return lambda: run(x0, whp, imatp)

    dt_iter = slope_time(make_iter_run, reps)
    rec["trs4_iteration_ms"] = dt_iter * 1e3
    print(f"trs4 full iteration: {dt_iter*1e3:.2f} ms", flush=True)

    # kernel-level parts, same policy and shapes
    def part(name, body):
        def make_run(n):
            @jax.jit
            def run(x0_in, whp_in):
                def step(carry, aa):
                    x_in = x0_in.with_data(x0_in.col_ids,
                                           x0_in.blocks * aa)
                    with alg.capacity_policy(k_out=k_pin,
                                             on_overflow="truncate"):
                        out = body(x_in, whp_in)
                    return carry + consume(out), None
                tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                      jnp.linspace(1., 2., n, jnp.float32))
                return tot
            return lambda: run(x0, whp)
        dt = slope_time(make_run, 4 * reps)
        rec[name] = dt * 1e3
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt

    dt_mm = part("matmul_ms", lambda x, w: alg.matmul(
        x, x, threshold=thr).blocks)
    dt_inc = part("increment_ms", lambda x, w: alg.increment(
        x, w, -3.0, 4.0, threshold=thr).blocks)
    dt_dot = part("dot_ms", lambda x, w: alg.dot(x, w))
    parts_sum = 2 * dt_mm + 4 * dt_inc + 3 * dt_dot
    rec["sum_of_parts_ms"] = parts_sum * 1e3
    rec["iteration_vs_parts"] = dt_iter / parts_sum
    print(f"sum of parts (2mm+4inc+3dot): {parts_sum*1e3:.2f} ms "
          f"(iteration/parts = {dt_iter/parts_sum:.2f})", flush=True)


def main():
    results = {}
    profile_shape(10240, 128, results, reps=40)
    profile_shape(102400, 128, results, reps=8)
    with open("PROFILE_r04_solver.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PROFILE_r04_solver.json", flush=True)


if __name__ == "__main__":
    main()
