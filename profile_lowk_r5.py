"""Round-5 profile: the banded LOW-K shape against its stream floor.

r4 ended at 17.6 ms end-to-end vs a 3.0 ms same-bytes stream floor
(PROFILE_r04_lowk.json) with two named costs: ~6 ms fixed VMEM traffic
in kernel v4 (full-k_out zero/flush/transpose passes) and ~6 ms of XLA
glue dominated by the per-multiply B-panel mask+transpose re-pack that
re-streamed all of B.  The r5 kernel takes B in NATIVE layout (panel
form packed in-kernel per window) and narrows the accumulator to the
band span with a fused per-slice epilogue.  This measures the result.

Methodology = profile_lowk.py (r4): slope timing over anti-hoist scan
chains, operands as jit arguments, outputs consumed by fused sums.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _chain_fn
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel import pmatrix as PM
from ntpoly_tpu.parallel.grid import ProcessGrid
from ntpoly_tpu.ops import spgemm_pallas
from ntpoly_tpu.config import EMPTY

REPS = 10


def consume(out):
    tot = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        tot += jnp.sum(jnp.abs(leaf)).astype(jnp.float32) * 1e-30
    return tot


def slope_time(make_run):
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
        def run(*ops):
            def step(carry, aa):
                out = body(ops[0] * aa, *ops[1:])
                return carry + consume(out), None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
            return tot
        return lambda: run(*args)
    return make_run


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    dim, bs, band = 524288, 128, 24
    shp = os.environ.get("NTX_LOWK_SHAPE")
    if shp:                       # "dim,band" override (e.g. the 16k
        dim, band = map(int, shp.split(","))   # headline shape 16384,160)
    h = PM.banded(dim, band, _chain_fn(dim), bs=bs, grid=grid,
                  dtype=np.float32)
    k_out = int(alg.fill_bound(h, h))
    thr = 1e-6
    ac = h.col_ids[0]
    ab = h.blocks[0]
    nb, ka = ac.shape
    kb = ka
    c = alg.matmul(h, h, threshold=thr, k_out=k_out, on_overflow="truncate")
    nnz = 2 * int(h.nnz) + int(c.nnz)
    print(f"nb={nb} k={ka} k_out={k_out} span="
          f"{spgemm_pallas._v4_span(ka, kb, k_out)} nnz={nnz}", flush=True)
    results = {"shape": dict(dim=dim, bs=bs, band=band, nb=nb, k=ka,
                             k_out=k_out, nnz=int(h.nnz),
                             nnz_processed=nnz)}

    def rec(name, dt):
        results[name] = dt * 1e3
        print(f"{name}: {dt*1e3:.3f} ms  ({nnz/dt/1e9:.2f}e9 nnz/s)",
              flush=True)

    _sections = os.environ.get("NTX_LOWK_SECTIONS", "all")

    def want(tag):
        return _sections == "all" or tag in _sections.split(",")

    # end-to-end matmul: default path ('high' since r5), auto dispatch
    def mm(blocks, prec):
        hh = h.with_data(h.col_ids, blocks[None])
        out = alg.matmul(hh, hh, threshold=thr, k_out=k_out,
                         on_overflow="truncate", precision=prec)
        return out.blocks
    if want("e2e"):
        rec("matmul_e2e_high_default",
            slope_time(scanner(lambda b: mm(b, "high"), ab)))
        rec("matmul_e2e_highest",
            slope_time(scanner(lambda b: mm(b, "highest"), ab)))

    # forced band mode (the production 2^20 arm: single-arm compile)
    def mmf(blocks, prec):
        hh = h.with_data(h.col_ids, blocks[None])
        out = alg.matmul(hh, hh, threshold=thr, k_out=k_out,
                         on_overflow="truncate", precision=prec,
                         method="pallas_band")
        return out.blocks
    if want("e2e"):
        rec("matmul_e2e_band_high",
            slope_time(scanner(lambda b: mmf(b, "high"), ab)))

    # kernel v5 (r5 v4) alone at the three precisions
    g4, w4 = spgemm_pallas._v4_pick(ka, kb, k_out, bs, 4, 4, nb, nb)
    results["v4_group"] = g4
    if g4 is not None:
        span = spgemm_pallas._v4_span(ka, kb, k_out)
        pad4 = -nb % g4
        ac4 = jnp.pad(ac, ((0, pad4), (0, 0)), constant_values=EMPTY)
        wlo4, width4 = spgemm_pallas._v3_window(ac4, g4)
        gg0, occ0, band_ok = spgemm_pallas.band_plan(ac, ac, k_out,
                                                     span=span)
        print(f"v4: g={g4} w={w4} width={int(width4)} "
              f"band_ok={bool(band_ok)}", flush=True)
        gg0_p = jnp.pad(gg0, ((0, pad4), (0, 0)))
        bflag = (ac != EMPTY).astype(jnp.int32)
        scal = jnp.stack([jnp.float32(1.0), jnp.float32(thr)])

        for prec in ("highest", "high", "bf16") if want("v4") else ():
            def v4_one(ab_s, braw, _p=prec):
                ab_p = jnp.pad(ab_s, ((0, pad4),) + ((0, 0),) * 3)
                if _p == "bf16":
                    ab_p = ab_p.astype(jnp.bfloat16)
                    braw = braw.astype(jnp.bfloat16)
                return spgemm_pallas._call_kernel_v4(
                    ac4, gg0_p, wlo4, bflag, scal, ab_p, braw, kb=kb,
                    nbk=nb, k_out=k_out, g_rows=g4, w=w4, precision=_p,
                    out_dt=jnp.dtype(jnp.float32))
            rec(f"kernel_v4r5_{prec}", slope_time(scanner(v4_one, ab, ab)))

        # group-size sweep (the 8-first preference is inherited, not
        # measured): bigger groups amortize per-group control overhead
        # and halve the window-build count
        for g_try in (16, 32) if want("v4") else ():
            w_try = ka + g_try - 1
            if nb % g_try:
                continue
            ac_t = ac
            wlo_t, _ = spgemm_pallas._v3_window(ac_t, g_try)
            gg0_t, _, ok_t = spgemm_pallas.band_plan(
                ac, ac, k_out, span=spgemm_pallas._v4_span(ka, kb, k_out))
            if not bool(ok_t):
                continue
            try:
                def v4_g(ab_s, braw, _g=g_try, _w=w_try, _wlo=wlo_t,
                         _gg0=gg0_t):
                    return spgemm_pallas._call_kernel_v4(
                        ac_t, _gg0, _wlo, bflag, scal, ab_s, braw, kb=kb,
                        nbk=nb, k_out=k_out, g_rows=_g, w=_w,
                        precision="high", out_dt=jnp.dtype(jnp.float32))
                rec(f"kernel_v4r5_high_g{g_try}",
                    slope_time(scanner(v4_g, ab, ab)))
            except Exception as e:
                print(f"g{g_try} failed: {type(e).__name__}", flush=True)

    # EXPERIMENT kernel v6: uniform-band specialization — on a pure band
    # gg0[r, s] == s for every valid slot, so the accumulator offsets
    # are STATIC: partial products combine as statically-padded value
    # adds (registers), no dynamic-offset RMW into a VMEM panel at all.
    # Hypothesis: Mosaic lowers a dynamic lane-offset slice-add as a
    # masked full-span op, which would make the 24 RMWs per group touch
    # span*bs lanes each — the unexplained ~6.5 ms fixed cost.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools as _ft

    if g4 is not None:
        span = spgemm_pallas._v4_span(ka, kb, k_out)

        def _kernel_v6(acols_ref, wlo_ref, scal_ref, arow_ref, braw_hbm,
                       oblk_ref, nrm_ref, bwin, bwide, sem,
                       *, lka, lkb, lk_out, lnbk, lg, lw, lspan, prec):
            g = pl.program_id(0)
            ng = pl.num_programs(0)
            lbs = arow_ref.shape[-1]

            def copy_for(grp, slot):
                lo = jnp.minimum(wlo_ref[grp], lnbk - lw)
                return pltpu.make_async_copy(braw_hbm.at[pl.ds(lo, lw)],
                                             bwin.at[slot], sem.at[slot])

            @pl.when(g == 0)
            def _():
                copy_for(0, 0).start()

            @pl.when(g + 1 < ng)
            def _():
                copy_for(g + 1, (g + 1) % 2).start()

            copy_for(g, g % 2).wait()
            win_lo = jnp.minimum(wlo_ref[g], lnbk - lw)
            for wi in range(lw):
                for t in range(lkb):
                    bwide[wi, :, t * lbs:(t + 1) * lbs] = \
                        bwin[g % 2, wi, t]
            for i in range(lg):
                r = g * lg + i
                acc = jnp.zeros((lbs, lspan * lbs), jnp.float32)
                for s in range(lka):
                    cid = acols_ref[r * lka + s]
                    local = jnp.clip(cid - win_lo, 0, lw - 1)
                    a = arow_ref[i, s]
                    b = bwide[local]
                    if prec == "high":
                        a_hi = a.astype(jnp.bfloat16)
                        a_lo = (a - a_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        b_hi = b.astype(jnp.bfloat16)
                        b_lo = (b - b_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        part = (jnp.dot(a_hi, b_hi,
                                preferred_element_type=jnp.float32)
                                + jnp.dot(a_lo, b_hi,
                                preferred_element_type=jnp.float32)
                                + jnp.dot(a_hi, b_lo,
                                preferred_element_type=jnp.float32))
                    else:
                        part = jnp.dot(
                            a, b, preferred_element_type=jnp.float32,
                            precision=spgemm_pallas._PRECISIONS[prec])
                    acc = acc + jnp.pad(
                        part, ((0, 0),
                               (s * lbs, (lspan - lkb - s) * lbs)))
                sc = acc * scal_ref[0]
                fl = jnp.where(jnp.abs(sc) > scal_ref[1], sc, 0.0)
                for t in range(lk_out):
                    if t < lspan:
                        oblk_ref[i, t] = fl[:, t * lbs:(t + 1) * lbs]
                        nrm_ref[i, t] = jnp.sum(
                            jnp.abs(fl[:, t * lbs:(t + 1) * lbs]), axis=0)
                    else:
                        oblk_ref[i, t] = jnp.zeros((lbs, lbs), jnp.float32)
                        nrm_ref[i, t] = jnp.zeros((lbs,), jnp.float32)

        def call_v6(ac_i, wlo_i, scal_i, ab_i, braw_i, prec):
            ng = (nb + pad4) // g4
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(ng,),
                in_specs=[
                    pl.BlockSpec((g4, ka, bs, bs),
                                 lambda g, *_: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((g4, k_out, bs, bs),
                                 lambda g, *_: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g4, k_out, bs),
                                 lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, w4, kb, bs, bs), ab_i.dtype),
                    pltpu.VMEM((w4, bs, kb * bs), ab_i.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kern = _ft.partial(_kernel_v6, lka=ka, lkb=kb, lk_out=k_out,
                               lnbk=nb, lg=g4, lw=w4, lspan=span,
                               prec=prec)
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
                out_shape=[
                    jax.ShapeDtypeStruct((nb + pad4, k_out, bs, bs),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((nb + pad4, k_out, bs),
                                         jnp.float32)],
                interpret=False,
            )(ac_i.reshape(-1), wlo_i, scal_i, ab_i, braw_i)

        for prec in ("highest", "high") if want("v6") else ():
            try:
                def v6_one(ab_s, braw, _p=prec):
                    ab_p = jnp.pad(ab_s, ((0, pad4),) + ((0, 0),) * 3)
                    return call_v6(ac4, wlo4, scal, ab_p, braw, _p)
                rec(f"kernel_v6_uniform_{prec}",
                    slope_time(scanner(v6_one, ab, ab)))
            except Exception as e:
                print(f"v6 {prec} failed: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)

        # EXPERIMENT kernel v7: uniform band + BATCHED dots — per A-slot
        # the whole group's B rows are a CONTIGUOUS window slice, so one
        # lax.dot_general with a batch dim replaces G separate dots
        # (issue overhead and pipeline fill amortize over G x more MXU
        # tiles), and the accumulate is one static-slice RMW per slot.
        def _kernel_v7(wlo_ref, scal_ref, arow_ref, braw_hbm,
                       oblk_ref, nrm_ref, bwin, bwide, pacc, sem,
                       *, lka, lkb, lk_out, lnbk, lg, lw, lspan, prec):
            g = pl.program_id(0)
            ng = pl.num_programs(0)
            lbs = arow_ref.shape[-1]

            def copy_for(grp, slot):
                lo = jnp.minimum(wlo_ref[grp], lnbk - lw)
                return pltpu.make_async_copy(braw_hbm.at[pl.ds(lo, lw)],
                                             bwin.at[slot], sem.at[slot])

            @pl.when(g == 0)
            def _():
                copy_for(0, 0).start()

            @pl.when(g + 1 < ng)
            def _():
                copy_for(g + 1, (g + 1) % 2).start()

            copy_for(g, g % 2).wait()
            for wi in range(lw):
                for t in range(lkb):
                    bwide[wi, :, t * lbs:(t + 1) * lbs] = \
                        bwin[g % 2, wi, t]
            pacc[...] = jnp.zeros_like(pacc)
            # uniform interior assumption for the EXPERIMENT: row i,
            # slot s reads window row i + s, lands at offset s
            dn = (((2,), (1,)), ((0,), (0,)))
            for s in range(lka):
                a = arow_ref[:, s]                     # [G, bs, bs]
                b = bwide[pl.ds(s, lg)]                # [G, bs, kb*bs]
                if prec == "high":
                    a_hi = a.astype(jnp.bfloat16)
                    a_lo = (a - a_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    b_hi = b.astype(jnp.bfloat16)
                    b_lo = (b - b_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    part = (jax.lax.dot_general(
                        a_hi, b_hi, dn,
                        preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            a_lo, b_hi, dn,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            a_hi, b_lo, dn,
                            preferred_element_type=jnp.float32))
                else:
                    part = jax.lax.dot_general(
                        a, b, dn, preferred_element_type=jnp.float32,
                        precision=spgemm_pallas._PRECISIONS[prec])
                pacc[:, :, s * lbs:(s + lkb) * lbs] += part
            for t in range(lk_out):
                if t < lspan:
                    sl = pacc[:, :, t * lbs:(t + 1) * lbs] * scal_ref[0]
                    fl = jnp.where(jnp.abs(sl) > scal_ref[1], sl, 0.0)
                    oblk_ref[:, t] = fl
                    nrm_ref[:, t] = jnp.sum(jnp.abs(fl), axis=1)
                else:
                    oblk_ref[:, t] = jnp.zeros((lg, lbs, lbs),
                                               jnp.float32)
                    nrm_ref[:, t] = jnp.zeros((lg, lbs), jnp.float32)

        def call_v7(wlo_i, scal_i, ab_i, braw_i, prec, g_use):
            w_use = ka + g_use - 1
            padv = -nb % g_use
            ng = (nb + padv) // g_use
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ng,),
                in_specs=[
                    pl.BlockSpec((g_use, ka, bs, bs),
                                 lambda g, *_: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((g_use, k_out, bs, bs),
                                 lambda g, *_: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g_use, k_out, bs),
                                 lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, w_use, kb, bs, bs), ab_i.dtype),
                    pltpu.VMEM((w_use, bs, kb * bs), ab_i.dtype),
                    pltpu.VMEM((g_use, bs, span * bs), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kern = _ft.partial(_kernel_v7, lka=ka, lkb=kb, lk_out=k_out,
                               lnbk=nb, lg=g_use, lw=w_use, lspan=span,
                               prec=prec)
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
                out_shape=[
                    jax.ShapeDtypeStruct((nb + padv, k_out, bs, bs),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((nb + padv, k_out, bs),
                                         jnp.float32)],
                interpret=False,
            )(wlo_i, scal_i, ab_i, braw_i)

        for g_use in (8, 16) if want("v7") else ():
            w_use = ka + g_use - 1
            padv = -nb % g_use
            acv = jnp.pad(ac, ((0, padv), (0, 0)), constant_values=EMPTY)
            wlov, _ = spgemm_pallas._v3_window(acv, g_use)
            for prec in ("highest", "high", "bf16"):
                try:
                    def v7_one(ab_s, braw, _p=prec, _g=g_use,
                               _wlo=wlov, _pad=padv):
                        ab_p = jnp.pad(ab_s,
                                       ((0, _pad),) + ((0, 0),) * 3)
                        if _p == "bf16":
                            ab_p = ab_p.astype(jnp.bfloat16)
                            braw = braw.astype(jnp.bfloat16)
                        return call_v7(_wlo, scal, ab_p, braw, _p, _g)
                    rec(f"kernel_v7_batched_{prec}_g{g_use}",
                        slope_time(scanner(v7_one, ab, ab)))
                except Exception as e:
                    print(f"v7 {prec} g{g_use} failed: "
                          f"{type(e).__name__}: {str(e)[:300]}",
                          flush=True)

    # EXPERIMENT v9: B-STATIONARY batched dots.  v7's per-slot batched
    # dot gives every B weight tile only M=128 rows of A to stream
    # (pipeline fill ~K=128 cycles per tile -> ~50% MXU).  On a uniform
    # band, B window row j is consumed by exactly the ka output rows
    # j-s (s=0..ka-1); stacking THOSE A blocks along M gives ONE
    # [ka*bs, bs] @ [bs, kb*bs] dot per window row — M=ka*bs per
    # weight tile, no FLOP inflation.  For 'high', the f32x3 three-pass
    # split folds into the SAME dot by K-concatenation:
    # [a_hi | a_lo | a_hi] @ [b_hi ; b_hi ; b_lo]  (K = 3*bs), so the
    # MXU sees one [w]-batched [ka*bs, 3*bs] x [3*bs, kb*bs] contraction
    # and the two partial-sum adds disappear.  The A_cat gather is free
    # of masking logic: the strided group-local writes a3[s:s+g, s] =
    # arow[:, s] populate exactly the in-group (j, s) pairs.
    if g4 is not None:
        span = spgemm_pallas._v4_span(ka, kb, k_out)

        def _kernel_v9(wlo_ref, scal_ref, arow_ref, braw_hbm,
                       oblk_ref, nrm_ref, bwin, a3, b3, sem,
                       *, lka, lkb, lk_out, lnbk, lg, lw, lspan, prec):
            g = pl.program_id(0)
            ng = pl.num_programs(0)
            lbs = arow_ref.shape[-1]

            def copy_for(grp, slot):
                lo = jnp.minimum(wlo_ref[grp], lnbk - lw)
                return pltpu.make_async_copy(braw_hbm.at[pl.ds(lo, lw)],
                                             bwin.at[slot], sem.at[slot])

            @pl.when(g == 0)
            def _():
                copy_for(0, 0).start()

            @pl.when(g + 1 < ng)
            def _():
                copy_for(g + 1, (g + 1) % 2).start()

            copy_for(g, g % 2).wait()
            # b3: K-stacked window panels, whole-window strided ops
            for t in range(lkb):
                blk = bwin[g % 2, :, t]                # [w, bs, bs]
                if prec == "high":
                    hi = blk.astype(jnp.bfloat16)
                    lo = (blk - hi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    b3[:, 0 * lbs:1 * lbs, t * lbs:(t + 1) * lbs] = hi
                    b3[:, 1 * lbs:2 * lbs, t * lbs:(t + 1) * lbs] = hi
                    b3[:, 2 * lbs:3 * lbs, t * lbs:(t + 1) * lbs] = lo
                else:
                    b3[:, :, t * lbs:(t + 1) * lbs] = blk
            # a3: group-local B-stationary gather (strided, no masks)
            for s in range(lka):
                a = arow_ref[:, s]                     # [g, bs, bs]
                rows = slice(s * lbs, (s + 1) * lbs)
                if prec == "high":
                    hi = a.astype(jnp.bfloat16)
                    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    a3[s:s + lg, rows, 0 * lbs:1 * lbs] = hi
                    a3[s:s + lg, rows, 1 * lbs:2 * lbs] = lo
                    a3[s:s + lg, rows, 2 * lbs:3 * lbs] = hi
                else:
                    a3[s:s + lg, rows, :] = a
                # zero the out-of-group edges (j-s outside [0, g))
                if s > 0:
                    a3[0:s, rows] = jnp.zeros_like(a3[0:s, rows])
                if s < lka - 1:
                    a3[s + lg:lw, rows] = jnp.zeros_like(
                        a3[s + lg:lw, rows])
            dn = (((2,), (1,)), ((0,), (0,)))
            part = jax.lax.dot_general(
                a3[...], b3[...], dn, preferred_element_type=jnp.float32)
            # direct epilogue from the j-indexed partials: out slot t of
            # row i sums part[i+s, s-block, (t-s)-block] over valid s
            for t in range(lk_out):
                if t < lspan:
                    acc = None
                    for s in range(max(0, t - lkb + 1),
                                   min(lka - 1, t) + 1):
                        term = part[s:s + lg, s * lbs:(s + 1) * lbs,
                                    (t - s) * lbs:(t - s + 1) * lbs]
                        acc = term if acc is None else acc + term
                    sl = acc * scal_ref[0]
                    fl = jnp.where(jnp.abs(sl) > scal_ref[1], sl, 0.0)
                    oblk_ref[:, t] = fl
                    nrm_ref[:, t] = jnp.sum(jnp.abs(fl), axis=1)
                else:
                    oblk_ref[:, t] = jnp.zeros((lg, lbs, lbs),
                                               jnp.float32)
                    nrm_ref[:, t] = jnp.zeros((lg, lbs), jnp.float32)

        def call_v9(wlo_i, scal_i, ab_i, braw_i, prec, g_use):
            w_use = ka + g_use - 1
            padv = -nb % g_use
            ng = (nb + padv) // g_use
            kmul = 3 if prec == "high" else 1
            a3dt = jnp.bfloat16 if prec == "high" else ab_i.dtype
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ng,),
                in_specs=[
                    pl.BlockSpec((g_use, ka, bs, bs),
                                 lambda g, *_: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((g_use, k_out, bs, bs),
                                 lambda g, *_: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g_use, k_out, bs), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, w_use, kb, bs, bs), ab_i.dtype),
                    pltpu.VMEM((w_use, ka * bs, kmul * bs), a3dt),
                    pltpu.VMEM((w_use, kmul * bs, kb * bs), a3dt),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kern = _ft.partial(_kernel_v9, lka=ka, lkb=kb, lk_out=k_out,
                               lnbk=nb, lg=g_use, lw=w_use, lspan=span,
                               prec=prec)
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
                out_shape=[
                    jax.ShapeDtypeStruct((nb + padv, k_out, bs, bs),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((nb + padv, k_out, bs),
                                         jnp.float32)],
                interpret=False,
            )(wlo_i, scal_i, ab_i, braw_i)

        for g_use in (8, 16) if want("v9") else ():
            padv = -nb % g_use
            acv = jnp.pad(ac, ((0, padv), (0, 0)), constant_values=EMPTY)
            wlov, _ = spgemm_pallas._v3_window(acv, g_use)
            for prec in ("high", "bf16"):
                try:
                    def v9_one(ab_s, braw, _p=prec, _g=g_use,
                               _wlo=wlov, _pad=padv):
                        ab_p = jnp.pad(ab_s,
                                       ((0, _pad),) + ((0, 0),) * 3)
                        if _p == "bf16":
                            ab_p = ab_p.astype(jnp.bfloat16)
                            braw = braw.astype(jnp.bfloat16)
                        return call_v9(_wlo, scal, ab_p, braw, _p, _g)
                    rec(f"kernel_v9_bstat_{prec}_g{g_use}",
                        slope_time(scanner(v9_one, ab, ab)))
                except Exception as e:
                    print(f"v9 {prec} g{g_use} failed: "
                          f"{type(e).__name__}: {str(e)[:300]}",
                          flush=True)

    # EXPERIMENT v10: SOFTWARE-PIPELINED prep/compute.  v9 showed the
    # kernel is not MXU-shape-bound: bf16 (one MXU pass, ~1 ms) still
    # costs ~7 ms, so ~6 ms is VPU-mediated VMEM traffic (operand
    # builds, f32 partials, epilogue) SERIALIZED with the dots.  v10
    # double-buffers BOTH operands via manual DMA and emits group g's
    # dot (MXU) BEFORE group g+1's operand prep (VPU) in program order,
    # so Mosaic's in-order issue can run the vector work of step g+1
    # under the matrix work of step g.  Epilogue stays serial (depends
    # on the dot).
    if g4 is not None:
        span = spgemm_pallas._v4_span(ka, kb, k_out)

        def _kernel_v10(wlo_ref, scal_ref, braw_hbm, araw_hbm,
                        oblk_ref, nrm_ref, bwin, awin, a3, b3,
                        bsem, asem,
                        *, lka, lkb, lk_out, lnbk, lg, lw, lspan, prec):
            g = pl.program_id(0)
            ng = pl.num_programs(0)
            lbs = awin.shape[-1]

            def bcopy(grp, slot):
                lo = jnp.minimum(wlo_ref[grp], lnbk - lw)
                return pltpu.make_async_copy(braw_hbm.at[pl.ds(lo, lw)],
                                             bwin.at[slot], bsem.at[slot])

            def acopy(grp, slot):
                return pltpu.make_async_copy(
                    araw_hbm.at[pl.ds(grp * lg, lg)], awin.at[slot],
                    asem.at[slot])

            def prep(grp_slot):
                for t in range(lkb):
                    blk = bwin[grp_slot, :, t]
                    if prec == "high":
                        hi = blk.astype(jnp.bfloat16)
                        lo = (blk - hi.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        b3[grp_slot, :, 0 * lbs:1 * lbs,
                           t * lbs:(t + 1) * lbs] = hi
                        b3[grp_slot, :, 1 * lbs:2 * lbs,
                           t * lbs:(t + 1) * lbs] = hi
                        b3[grp_slot, :, 2 * lbs:3 * lbs,
                           t * lbs:(t + 1) * lbs] = lo
                    else:
                        b3[grp_slot, :, :, t * lbs:(t + 1) * lbs] = blk
                for s in range(lka):
                    a = awin[grp_slot, :, s]
                    rows = slice(s * lbs, (s + 1) * lbs)
                    if prec == "high":
                        hi = a.astype(jnp.bfloat16)
                        lo = (a - hi.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        a3[grp_slot, s:s + lg, rows, 0 * lbs:1 * lbs] = hi
                        a3[grp_slot, s:s + lg, rows, 1 * lbs:2 * lbs] = lo
                        a3[grp_slot, s:s + lg, rows, 2 * lbs:3 * lbs] = hi
                    else:
                        a3[grp_slot, s:s + lg, rows, :] = a
                    if s > 0:
                        a3[grp_slot, 0:s, rows] = jnp.zeros_like(
                            a3[grp_slot, 0:s, rows])
                    if s < lka - 1:
                        a3[grp_slot, s + lg:lw, rows] = jnp.zeros_like(
                            a3[grp_slot, s + lg:lw, rows])

            @pl.when(g == 0)
            def _():
                bcopy(0, 0).start()
                acopy(0, 0).start()
                bcopy(0, 0).wait()
                acopy(0, 0).wait()
                prep(0)

            @pl.when((g == 0) & (ng > 1))
            def _():
                bcopy(1, 1).start()
                acopy(1, 1).start()

            @pl.when(g + 2 < ng)
            def _():
                bcopy(g + 2, g % 2).start()
                acopy(g + 2, g % 2).start()

            @pl.when(g + 1 < ng)
            def _():
                bcopy(g + 1, (g + 1) % 2).wait()
                acopy(g + 1, (g + 1) % 2).wait()

            dn = (((2,), (1,)), ((0,), (0,)))
            part = jax.lax.dot_general(
                a3[g % 2], b3[g % 2], dn,
                preferred_element_type=jnp.float32)

            @pl.when(g + 1 < ng)
            def _():
                prep((g + 1) % 2)

            for t in range(lk_out):
                if t < lspan:
                    acc = None
                    for s in range(max(0, t - lkb + 1),
                                   min(lka - 1, t) + 1):
                        term = part[s:s + lg, s * lbs:(s + 1) * lbs,
                                    (t - s) * lbs:(t - s + 1) * lbs]
                        acc = term if acc is None else acc + term
                    sl = acc * scal_ref[0]
                    fl = jnp.where(jnp.abs(sl) > scal_ref[1], sl, 0.0)
                    oblk_ref[:, t] = fl
                    nrm_ref[:, t] = jnp.sum(jnp.abs(fl), axis=1)
                else:
                    oblk_ref[:, t] = jnp.zeros((lg, lbs, lbs),
                                               jnp.float32)
                    nrm_ref[:, t] = jnp.zeros((lg, lbs), jnp.float32)

        def call_v10(wlo_i, scal_i, ab_i, braw_i, prec, g_use):
            w_use = ka + g_use - 1
            padv = -nb % g_use
            ng = (nb + padv) // g_use
            kmul = 3 if prec == "high" else 1
            a3dt = jnp.bfloat16 if prec == "high" else ab_i.dtype
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ng,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((g_use, k_out, bs, bs),
                                 lambda g, *_: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g_use, k_out, bs), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, w_use, kb, bs, bs), ab_i.dtype),
                    pltpu.VMEM((2, g_use, ka, bs, bs), ab_i.dtype),
                    pltpu.VMEM((2, w_use, ka * bs, kmul * bs), a3dt),
                    pltpu.VMEM((2, w_use, kmul * bs, kb * bs), a3dt),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kern = _ft.partial(_kernel_v10, lka=ka, lkb=kb, lk_out=k_out,
                               lnbk=nb, lg=g_use, lw=w_use, lspan=span,
                               prec=prec)
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                out_shape=[
                    jax.ShapeDtypeStruct((nb + padv, k_out, bs, bs),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((nb + padv, k_out, bs),
                                         jnp.float32)],
                interpret=False,
            )(wlo_i, scal_i, braw_i, ab_i)

        for g_use in (8, 16) if want("v10") else ():
            padv = -nb % g_use
            acv = jnp.pad(ac, ((0, padv), (0, 0)), constant_values=EMPTY)
            wlov, _ = spgemm_pallas._v3_window(acv, g_use)
            for prec in ("high", "bf16"):
                try:
                    def v10_one(ab_s, braw, _p=prec, _g=g_use,
                                _wlo=wlov, _pad=padv):
                        ab_p = jnp.pad(ab_s,
                                       ((0, _pad),) + ((0, 0),) * 3)
                        if _p == "bf16":
                            ab_p = ab_p.astype(jnp.bfloat16)
                            braw = braw.astype(jnp.bfloat16)
                        return call_v10(_wlo, scal, ab_p, braw, _p, _g)
                    rec(f"kernel_v10_pipe_{prec}_g{g_use}",
                        slope_time(scanner(v10_one, ab, ab)))
                except Exception as e:
                    print(f"v10 {prec} g{g_use} failed: "
                          f"{type(e).__name__}: {str(e)[:300]}",
                          flush=True)

    # EXPERIMENT v8: pure-XLA diagonal-form band multiply.  A uniform
    # block-band product is a sum of ka batched matmuls over rolled
    # diagonals: C[r, :, s-offset..] += A[r, s] @ Bpanel[r + s - c].
    # No pallas at all — XLA's batched MXU matmuls + its own async
    # scheduling, testing whether the Mosaic kernel's poor VPU/MXU/DMA
    # overlap is the remaining ~4 ms.
    if g4 is not None:
        span = spgemm_pallas._v4_span(ka, kb, k_out)

        def shift_rows(x, d):
            # x[r + d] with zero fill (block-row shift along axis 0)
            if d == 0:
                return x
            if d > 0:
                return jnp.pad(x[d:], ((0, d),) + ((0, 0),) * (x.ndim - 1))
            return jnp.pad(x[:d], ((-d, 0),) + ((0, 0),) * (x.ndim - 1))

        def v8(ab_s, braw, prec):
            bp = jnp.swapaxes(braw, 1, 2).reshape(nb, bs, kb * bs)
            precision = spgemm_pallas._PRECISIONS[prec]
            acc = jnp.zeros((nb, bs, span * bs), jnp.float32)
            for s in range(ka):
                # uniform interior: slot s of row r references block-row
                # r + s - 1 and lands at output offset s
                part = jnp.einsum(
                    'rij,rjk->rik', ab_s[:, s], shift_rows(bp, s - 1),
                    precision=precision,
                    preferred_element_type=jnp.float32)
                acc = acc.at[:, :, s * bs:(s + kb) * bs].add(part)
            fl = jnp.where(jnp.abs(acc) > jnp.float32(thr), acc, 0.0)
            blocks = jnp.swapaxes(
                fl.reshape(nb, bs, span, bs), 1, 2)      # [nb, span, ...]
            nrm = jnp.sum(jnp.abs(blocks), axis=(-1, -2))
            return blocks, nrm

        for prec in ("highest", "high") if want("v8") else ():
            def v8_one(ab_s, braw, _p=prec):
                return v8(ab_s, braw, _p)
            rec(f"xla_diag_{prec}", slope_time(scanner(v8_one, ab, ab)))

        if want("v8"):
            def v8_bf16(ab_s, braw):
                return v8(ab_s.astype(jnp.bfloat16),
                          braw.astype(jnp.bfloat16), "bf16")
            rec("xla_diag_bf16", slope_time(scanner(v8_bf16, ab, ab)))

    # roofline anchors
    if not want("anchors"):
        flops = None
    flops = nb * ka * 2 * bs * bs * kb * bs
    mm_n = int(round(flops ** (1 / 3)))
    da = jnp.array(np.random.default_rng(0).standard_normal(
        (mm_n, mm_n)), jnp.float32)
    if want("anchors"):
        dt_dense = slope_time(scanner(lambda a: a @ a, da))
        results["dense_same_flops_ms"] = dt_dense * 1e3
        print(f"dense same-FLOPs ({mm_n}^3): {dt_dense*1e3:.3f} ms",
              flush=True)

    bytes_touched = (nb * ka * bs * bs + nb * ka * kb * bs * bs
                     + nb * k_out * bs * bs) * 4
    results["bytes_touched"] = bytes_touched
    if want("anchors"):
        big = jnp.array(np.random.default_rng(1).standard_normal(
            (bytes_touched // 8,)), jnp.float32)
        dt_stream = slope_time(scanner(lambda x: x * 1.0000001, big))
        results["stream_same_bytes_ms"] = dt_stream * 1e3
        print(f"stream same-bytes ({bytes_touched/1e9:.2f} GB): "
              f"{dt_stream*1e3:.3f} ms", flush=True)

    out_path = os.environ.get("NTX_LOWK_OUT", "PROFILE_r05_lowk.json")
    if _sections == "all":
        prior = {}
    else:
        try:
            with open(out_path) as f:
                prior = json.load(f)
        except Exception:
            prior = {}
    prior.update(results)
    with open(out_path, "w") as f:
        json.dump(prior, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
