"""Per-stage SpGEMM profile on the real chip (round 3 evidence).

Methodology (two prior harnesses got this wrong):
  * the tunneled backend has ~50 ms fixed dispatch+readback latency per
    program call, so every stage runs as a jitted lax.scan of REPS=50
    iterations and an EMPTY scan is timed as the floor to subtract;
  * scan operands are scaled by the per-step scalar *before* the op under
    test, so XLA cannot hoist the work out of the loop;
  * each timed program runs 5 times; we report the min (the tunnel adds
    noise, never removes work).
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

REPS = 50


def timeit(fn, *args):
    fn(*args)  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    return min(times)


def scan_over(body):
    @jax.jit
    def run(blocks, *rest):
        def step(carry, aa):
            out = body(blocks * aa, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.ravel(leaf)[0].astype(jnp.float32), None
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.linspace(1., 2., REPS, jnp.float32))
        return tot
    return run


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs = 16384, 128
    h = _fill(dim, bs, grid, *_chain(dim, bandwidth=160))
    k_out = int(alg.fill_bound(h, h))
    thr = 1e-6
    ac = h.col_ids[0]          # [nb, k]
    ab = h.blocks[0]           # [nb, k, bs, bs]
    nb, ka = ac.shape
    kb = ka
    print(f"nb={nb} k={ka} k_out={k_out} nnz={int(h.nnz)}", flush=True)
    results = {}
    floor = timeit(scan_over(lambda b: b), jnp.zeros((8, 128)))
    print(f"{'dispatch_floor_total_ms':34s} {floor*1e3:9.2f} ms", flush=True)
    results["dispatch_floor_total_ms"] = floor * 1e3

    def rec(name, total):
        dt = max(total - floor, 0.0) / REPS
        results[name] = dt * 1e3
        print(f"{name:34s} {dt*1e3:9.3f} ms/it   (total {total*1e3:7.1f})",
              flush=True)

    # ---- roofline reference points ----------------------------------------
    big = jnp.zeros((nb, ka, bs, kb * bs), jnp.float32)   # 209 MB
    rec("hbm_rw_209MB_each_way", timeit(scan_over(lambda b: b + 1.0), big))

    bg = jnp.zeros((nb, ka, bs, kb * bs), jnp.float32)
    rec("batched_matmul_HIGHEST",
        timeit(scan_over(lambda a, b: jnp.einsum(
            'rsij,rsjk->rsik', a, b,
            precision=jax.lax.Precision.HIGHEST)), ab, bg))
    rec("batched_matmul_DEFAULT",
        timeit(scan_over(lambda a, b: jnp.einsum(
            'rsij,rsjk->rsik', a, b,
            precision=jax.lax.Precision.DEFAULT)), ab, bg))

    # ---- structure pass (comparison-based rewrite) ------------------------
    @jax.jit
    def plan_scan(acols):
        def step(carry, aa):
            z = (aa > 1e9).astype(jnp.int32)      # runtime zero, no folding
            plan, occ, ucnt = spgemm_pallas.structure_plan(
                acols + z, acols, k_out)
            return carry + plan[0, 0] + occ[0, 0] + ucnt[0], None
        tot, _ = jax.lax.scan(step, jnp.int32(0),
                              jnp.arange(REPS, dtype=jnp.float32))
        return tot
    rec("structure_plan_v3", timeit(plan_scan, ac))

    # ---- numeric pass (pallas kernel, plan precomputed) --------------------
    plan, occp, ucnt = jax.jit(
        spgemm_pallas.structure_plan, static_argnames="k_out")(ac, ac, k_out)
    b_panel = jnp.swapaxes(ab, -3, -2).reshape(nb, bs, kb * bs)

    def kern_only(ablk, bpan):
        return spgemm_pallas._call_kernel(
            ac, plan, ablk, bpan, kb=kb, nbk=nb, k_out=k_out,
            interpret=False)
    rec("pallas_kernel_only", timeit(scan_over(kern_only), ab, b_panel))

    # ---- epilogue ----------------------------------------------------------
    cb_shape = jnp.ones((nb, k_out, bs, bs), jnp.float32)
    rec("compact_epilogue",
        timeit(scan_over(lambda cb: bell.compact(occp, cb, k_out, thr)),
               cb_shape))

    def cheap_epi(cb):
        cbz = jnp.where(jnp.abs(cb) > thr, cb, 0)
        nz = jnp.sum(jnp.abs(cbz), axis=(-1, -2)) > 0
        cc = jnp.where(nz, occp, EMPTY)
        return cc, cbz
    rec("cheap_epilogue", timeit(scan_over(cheap_epi), cb_shape))

    # ---- full paths --------------------------------------------------------
    def full_pallas(ablk):
        cc, cb, _ = spgemm_pallas.spgemm_pallas(
            ac, ablk, ac, ab, k_out=k_out, threshold=thr, alpha=1.0)
        return cb
    rec("full_pallas_direct", timeit(scan_over(full_pallas), ab))

    def full_cand(ablk):
        return bell.spgemm_candidates(
            ac, ablk, ac, ab, col_offset=0, k_out=k_out, threshold=thr,
            alpha=1.0, row_chunk=16)
    rec("full_cand_direct", timeit(scan_over(full_cand), ab))

    # ---- through the _summa shard_map wrapper ------------------------------
    for method in ["pallas", "cand", "acc"]:
        @jax.jit
        def via_summa(blocks, m=method):
            def step(carry, aa):
                hm = h.with_data(h.col_ids, blocks * aa)
                c = alg.matmul(hm, h, threshold=thr, k_out=k_out,
                               on_overflow="truncate", method=m)
                return carry + c.blocks[0, 0, 0, 0, 0], None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., REPS, jnp.float32))
            return tot
        rec(f"summa_{method}", timeit(via_summa, h.blocks))

    with open("PROFILE_r03_stage1.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PROFILE_r03_stage1.json", flush=True)


if __name__ == "__main__":
    main()
