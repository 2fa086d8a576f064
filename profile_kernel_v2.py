"""v1 (gather BlockSpec) vs v2 (manual double-buffered DMA) kernel timing
on the real chip, plus the component roofline. Appends to PROFILE_r03.json.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _chain, _fill
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.ops import spgemm_pallas as sp

REPS = 40


def slope_time(make_run):
    t = {}
    for n in (REPS, 3 * REPS):
        fn = make_run(n)
        fn()
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        t[n] = min(times)
    return (t[3 * REPS] - t[REPS]) / (2 * REPS)


def consume(out):
    tot = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        tot += jnp.sum(jnp.abs(leaf)).astype(jnp.float32) * 1e-30
    return tot


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
    print(f"nb={nb} k={ka} k_out={k_out}", flush=True)
    plan, occp, ucnt = jax.jit(
        sp.structure_plan, static_argnames="k_out")(ac, ac, k_out)
    b_panel = jnp.swapaxes(ab, -3, -2).reshape(nb, bs, kb * bs)
    scal = jnp.asarray([1.0, thr], jnp.float32)

    results = {}
    t1 = slope_time(scanner(
        lambda a, b: sp._call_kernel(ac, plan, scal, a, b, kb=kb, nbk=nb,
                                     k_out=k_out, interpret=False),
        ab, b_panel))
    results["kernel_v1_ms"] = t1 * 1e3
    print(f"kernel v1 {t1*1e3:8.3f} ms", flush=True)
    t2 = slope_time(scanner(
        lambda a, b: sp._call_kernel_v2(ac, plan, scal, a, b, kb=kb,
                                        nbk=nb, k_out=k_out),
        ab, b_panel))
    results["kernel_v2_ms"] = t2 * 1e3
    print(f"kernel v2 {t2*1e3:8.3f} ms", flush=True)

    # correctness on-chip
    v1 = sp._call_kernel(ac, plan, scal, ab, b_panel, kb=kb, nbk=nb,
                         k_out=k_out, interpret=False)
    v2 = sp._call_kernel_v2(ac, plan, scal, ab, b_panel, kb=kb, nbk=nb,
                            k_out=k_out)
    err = float(jnp.max(jnp.abs(v1 - v2)))
    results["v1_v2_max_diff"] = err
    print(f"max diff {err:.3e}", flush=True)

    data = {}
    if os.path.exists("PROFILE_r03.json"):
        data = json.load(open("PROFILE_r03.json"))
    data.update(results)
    json.dump(data, open("PROFILE_r03.json", "w"), indent=1)
    print("updated PROFILE_r03.json", flush=True)


if __name__ == "__main__":
    main()
