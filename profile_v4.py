"""Round-3 kernel profile on the real chip (recorded evidence).

Methodology — the tunneled backend has a LARGE and VARIABLE fixed
dispatch+readback cost per program call (20-80 ms), so:
  * every stage is a jitted lax.scan whose operands are scaled by the
    per-step scalar first (no loop-invariant hoisting), and whose full
    output feeds the carry through a fused jnp.sum (no DCE);
  * per-iteration time is the SLOPE between a REPS-step and a
    3*REPS-step run of the same program: (t3 - t1) / (2*REPS), which
    cancels the dispatch floor exactly;  each measured as min of 4 runs.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _chain, _fill
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.ops import spgemm_pallas
from ntpoly_tpu.core import bell
from ntpoly_tpu.config import EMPTY

REPS = 40


def consume(out):
    tot = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        tot += jnp.sum(jnp.abs(leaf)).astype(jnp.float32) * 1e-30
    return tot


def slope_time(make_run):
    """make_run(n) -> jitted callable; returns per-iteration seconds."""
    t = {}
    for n in (REPS, 3 * REPS):
        fn = make_run(n)
        fn()  # compile
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        t[n] = min(times)
    return (t[3 * REPS] - t[REPS]) / (2 * REPS)


def scanner(body, *args):
    def make_run(n):
        @jax.jit
        def run():
            def step(carry, aa):
                out = body(args[0] * aa, *args[1:])
                return carry + consume(out), None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
            return tot
        return run
    return make_run


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs = 16384, 128
    h = _fill(dim, bs, grid, *_chain(dim, bandwidth=160))
    k_out = int(alg.fill_bound(h, h))
    thr = 1e-6
    ac = h.col_ids[0]
    ab = h.blocks[0]
    nb, ka = ac.shape
    kb = ka
    print(f"nb={nb} k={ka} k_out={k_out} nnz={int(h.nnz)}", flush=True)
    results = {"shape": dict(dim=dim, bs=bs, nb=nb, k=ka, k_out=k_out,
                             nnz=int(h.nnz))}

    def rec(name, dt):
        results[name] = dt * 1e3
        print(f"{name:30s} {dt*1e3:9.3f} ms/it", flush=True)

    # roofline: stream the gathered-B volume (fused read, no write)
    big = jnp.zeros((nb, ka, bs, kb * bs), jnp.float32)   # 209 MB
    rec("hbm_read_209MB", slope_time(scanner(lambda b: b + 1.0, big)))

    bg = jnp.zeros((nb, ka, bs, kb * bs), jnp.float32)
    rec("matmul_HIGHEST_13.4GF", slope_time(scanner(
        lambda a, b: jnp.einsum('rsij,rsjk->rsik', a, b,
                                precision=jax.lax.Precision.HIGHEST),
        ab, bg)))

    plan, occp, ucnt = jax.jit(
        spgemm_pallas.structure_plan, static_argnames="k_out")(ac, ac, k_out)

    def plan_make(n):
        @jax.jit
        def run():
            def step(carry, aa):
                z = (aa > 1e9).astype(jnp.int32)
                out = spgemm_pallas.structure_plan(ac + z, ac, k_out)
                return carry + consume(out), None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(n, dtype=jnp.float32))
            return tot
        return run
    rec("structure_plan", slope_time(plan_make))

    b_panel = jnp.swapaxes(ab, -3, -2).reshape(nb, bs, kb * bs)
    scal = jnp.asarray([1.0, thr], jnp.float32)
    rec("pallas_kernel_incl_prune", slope_time(scanner(
        lambda ablk, bpan: spgemm_pallas._call_kernel(
            ac, plan, scal, ablk, bpan, kb=kb, nbk=nb, k_out=k_out,
            interpret=False), ab, b_panel)))

    cb_shape = jnp.ones((nb, k_out, bs, bs), jnp.float32)
    rec("OLD_compact_epilogue", slope_time(scanner(
        lambda cb: bell.compact(occp, cb, k_out, thr), cb_shape)))
    rec("NEW_norms_epilogue", slope_time(scanner(
        lambda cb: jnp.where(jnp.sum(jnp.abs(cb), (-1, -2)) > 0,
                             occp, EMPTY), cb_shape)))

    rec("full_pallas", slope_time(scanner(
        lambda ablk: spgemm_pallas.spgemm_pallas(
            ac, ablk, ac, ab, k_out=k_out, threshold=thr, alpha=1.0), ab)))
    rec("full_cand", slope_time(scanner(
        lambda ablk: bell.spgemm_candidates(
            ac, ablk, ac, ab, col_offset=0, k_out=k_out, threshold=thr,
            alpha=1.0, row_chunk=16), ab)))

    summa_times = {}
    for method in ["pallas", "cand", "acc"]:
        def make_run(n, m=method):
            @jax.jit
            def run():
                def step(carry, aa):
                    hm = h.with_data(h.col_ids, h.blocks * aa)
                    c = alg.matmul(hm, h, threshold=thr, k_out=k_out,
                                   on_overflow="truncate", method=m)
                    return carry + consume((c.col_ids, c.blocks)), None
                tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                      jnp.linspace(1., 2., n, jnp.float32))
                return tot
            return run
        dt = slope_time(make_run)
        summa_times[method] = dt
        rec(f"summa_{method}", dt)

    c = alg.matmul(h, h, threshold=thr, k_out=k_out, on_overflow="truncate",
                   method="pallas")
    nnz = 2 * int(h.nnz) + int(c.nnz)
    results["nnz_per_multiply"] = nnz
    results["est_nnz_per_s"] = nnz / summa_times["pallas"]
    print(f"nnz={nnz}  summa_pallas -> "
          f"{results['est_nnz_per_s']/1e9:.1f} Gnnz/s", flush=True)

    with open("PROFILE_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PROFILE_r03.json", flush=True)


if __name__ == "__main__":
    main()
