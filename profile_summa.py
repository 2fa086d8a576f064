"""Where do 10 ms go between direct spgemm_pallas (~1 ms) and the bench's
alg.matmul chain (11.8 ms)?  A/B each wrapper layer on the real chip."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from bench import _chain, _fill
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.ops import spgemm_pallas as sp
from ntpoly_tpu.core import bell
from ntpoly_tpu.config import EMPTY

REPS = 30


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


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs = 16384, 128
    h = _fill(dim, bs, grid, *_chain(dim, bandwidth=160))
    k_out = int(alg.fill_bound(h, h))
    thr = 1e-6
    ac, ab = h.col_ids[0], h.blocks[0]
    nb, ka = ac.shape
    kb = ka
    print(f"nb={nb} k={ka} k_out={k_out}", flush=True)
    plan, occp, _ = jax.jit(
        sp.structure_plan, static_argnames="k_out")(ac, ac, k_out)
    b_panel = jnp.swapaxes(ab, -3, -2).reshape(nb, bs, kb * bs)
    scal = jnp.asarray([1.0, thr], jnp.float32)
    results = {}

    def rec(name, dt):
        results[name] = dt * 1e3
        print(f"{name:34s} {dt*1e3:9.3f} ms/it", flush=True)

    def scan_make(body):
        def make_run(n):
            @jax.jit
            def run():
                def step(carry, aa):
                    return carry + consume(body(aa)), None
                tot, _ = lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
                return tot
            return run
        return make_run

    # A: direct kernel v1 / v2
    rec("A_kernel_v1", slope_time(scan_make(
        lambda aa: sp._call_kernel(ac, plan, scal, ab * aa, b_panel,
                                   kb=kb, nbk=nb, k_out=k_out,
                                   interpret=False))))
    rec("A_kernel_v2", slope_time(scan_make(
        lambda aa: sp._call_kernel_v2(ac, plan, scal, ab * aa, b_panel,
                                      kb=kb, nbk=nb, k_out=k_out))))

    # B: full spgemm_pallas (plan recomputed per step; z defeats hoist)
    def full_sp(aa):
        z = (aa > 1e9).astype(jnp.int32)
        return sp.spgemm_pallas(ac + z, ab * aa, ac, ab, k_out=k_out,
                                threshold=thr, alpha=1.0)
    rec("B_full_spgemm_pallas", slope_time(scan_make(full_sp)))

    # C: spgemm_pallas under shard_map (mirrors _summa's local_fn)
    def via_shardmap(aa):
        def local_fn(acl, abl, bcl, bbl):
            agc = lax.all_gather(acl[0], "cols", axis=0)
            agb = lax.all_gather(abl[0], "cols", axis=0)
            agc = jnp.moveaxis(agc, 0, 1).reshape(nb, ka)
            agb = jnp.moveaxis(agb, 0, 1).reshape(nb, ka, bs, bs)
            bgc = lax.all_gather(bcl[0], "rows", axis=0, tiled=True)
            bgb = lax.all_gather(bbl[0], "rows", axis=0, tiled=True)
            cc, cb, _ = sp.spgemm_pallas(agc, agb, bgc, bgb, k_out=k_out,
                                         threshold=thr, alpha=1.0)
            stats = jnp.stack([jnp.int32(0),
                               jnp.max(bell.used_slots(cc))])
            stats = lax.pmax(stats, ("rows", "cols", "slices"))
            return cc[None], cb[None], stats
        spec_c = P("cols", "rows", None)
        spec_b = P("cols", "rows", None, None, None)
        hb = h.blocks * aa
        return jax.shard_map(
            local_fn, mesh=grid.mesh,
            in_specs=(spec_c, spec_b, spec_c, spec_b),
            out_specs=(spec_c, spec_b, P(None)), check_vma=False,
        )(h.col_ids, hb, h.col_ids, h.blocks)
    rec("C_shardmap_pallas", slope_time(scan_make(via_shardmap)))

    # D: the real alg.matmul
    def via_matmul(aa):
        hm = h.with_data(h.col_ids, h.blocks * aa)
        c = alg.matmul(hm, h, threshold=thr, k_out=k_out,
                       on_overflow="truncate", method="pallas")
        return (c.col_ids, c.blocks)
    rec("D_alg_matmul", slope_time(scan_make(via_matmul)))

    json.dump(results, open("PROFILE_r03_summa.json", "w"), indent=1)
    print("wrote PROFILE_r03_summa.json", flush=True)


if __name__ == "__main__":
    main()
