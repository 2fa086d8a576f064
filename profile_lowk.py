"""Round-4 profile: the banded LOW-K shape (r3 VERDICT weak #3).

The r3 headline (2e10 nnz/s) was earned at nb=128 rows, KA~45 after the
panel gather; the shape a >=1M-row linear-scaling Hamiltonian actually
has is nb in the thousands and KA~2-3 — and it ran 10x slower with no
recorded profile.  This measures where that shape's time goes (structure
pass, kernel, epilogue, per-call overhead of the row-chunk split) and
the candidate fixes (kernel v2 single-call, bigger row chunks).

Methodology = profile_v4.py: slope timing over anti-hoist scan chains,
outputs consumed by fused sums (see that file's header).
"""
import json
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
    """Unlike profile_v4's closure version, the operands are passed as
    jit ARGUMENTS: at this dim a closed-over operand becomes an HLO
    constant and the 0.6 GB program body overflows the tunnel's
    remote-compile request limit (HTTP 413)."""
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
    print(f"nb={nb} k={ka} k_out={k_out} nnz(h)={int(h.nnz)} "
          f"nnz-processed={nnz}", flush=True)
    results = {"shape": dict(dim=dim, bs=bs, band=band, nb=nb, k=ka,
                             k_out=k_out, nnz=int(h.nnz),
                             nnz_processed=nnz)}

    def rec(name, dt):
        results[name] = dt * 1e3
        print(f"{name}: {dt*1e3:.3f} ms  ({nnz/dt/1e9:.2f}e9 nnz/s)",
              flush=True)

    # 1. end-to-end matmul (the number fill_1m records)
    def mm(blocks):
        hh = h.with_data(h.col_ids, blocks[None])
        out = alg.matmul(hh, hh, threshold=thr, k_out=k_out,
                         on_overflow="truncate")
        return out.blocks
    rec("matmul_end_to_end", slope_time(scanner(mm, ab)))

    # 2. structure pass alone
    def plan(ab_s):
        return spgemm_pallas.structure_plan(ac, ac, k_out) + (ab_s[0, 0],)
    rec("structure_pass", slope_time(scanner(plan, ab)))

    # 3. kernel v1 (gather BlockSpec, current row_chunk)
    scal = jnp.stack([jnp.float32(1.0), jnp.float32(thr)])
    pln, occ, _ = spgemm_pallas.structure_plan(ac, ac, k_out)
    b_panel = jnp.swapaxes(ab, -3, -2).reshape(nb, bs, kb * bs)

    chunk = spgemm_pallas._row_chunk(ka, kb)
    results["row_chunk"] = chunk
    results["n_kernel_calls"] = -(-nb // chunk)

    def v1(ab_s, bp):
        cbs = []
        for lo in range(0, nb, chunk):
            hi = min(lo + chunk, nb)
            cb_i, np_i = spgemm_pallas._call_kernel(
                ac[lo:hi], pln[lo:hi], scal, ab_s[lo:hi], bp,
                kb=kb, nbk=nb, k_out=k_out, interpret=False,
                out_dt=jnp.dtype(jnp.float32))
            cbs.append((cb_i, np_i))
        return cbs
    rec("kernel_v1_chunked", slope_time(scanner(v1, ab, b_panel)))

    # 4. kernel v1, ONE call over all rows (grid steps = nb*ka; exceeds
    # the measured SMEM budget — expected to fail to compile; recorded)
    try:
        def v1_one(ab_s, bp):
            return spgemm_pallas._call_kernel(
                ac, pln, scal, ab_s, bp, kb=kb, nbk=nb, k_out=k_out,
                interpret=False, out_dt=jnp.dtype(jnp.float32))
        rec("kernel_v1_single_call",
            slope_time(scanner(v1_one, ab, b_panel)))
    except Exception as e:
        results["kernel_v1_single_call"] = f"failed: {type(e).__name__}"
        print("kernel_v1_single_call failed:", type(e).__name__, flush=True)

    # 5. kernel v2 (manual double-buffered DMA), one call over all rows
    try:
        def v2_one(ab_s, bp):
            return spgemm_pallas._call_kernel_v2(
                ac, pln, scal, ab_s, bp, kb=kb, nbk=nb, k_out=k_out)
        rec("kernel_v2_single_call",
            slope_time(scanner(v2_one, ab, b_panel)))
    except Exception as e:
        results["kernel_v2_single_call"] = f"failed: {type(e).__name__}"
        print("kernel_v2_single_call failed:", type(e).__name__, flush=True)

    # 6. kernel v2 with the v1 chunking (overhead comparison)
    def v2_chunked(ab_s, bp):
        cbs = []
        for lo in range(0, nb, chunk):
            hi = min(lo + chunk, nb)
            cbs.append(spgemm_pallas._call_kernel_v2(
                ac[lo:hi], pln[lo:hi], scal, ab_s[lo:hi], bp,
                kb=kb, nbk=nb, k_out=k_out))
        return cbs
    rec("kernel_v2_chunked", slope_time(scanner(v2_chunked, ab, b_panel)))

    # 6b. kernel v3 (windowed row batch, one call) — the r4 redesign
    g3, w3 = spgemm_pallas._v3_pick(ka, kb, k_out, bs, 4, 4, nb, nb)
    results["v3_group"] = g3
    if g3 is not None:
        pad3 = -nb % g3
        ac3 = jnp.pad(ac, ((0, pad3), (0, 0)), constant_values=EMPTY)
        pln3 = jnp.pad(pln, ((0, pad3), (0, 0)), constant_values=k_out)
        wlo3, width3 = spgemm_pallas._v3_window(ac3, g3)
        print(f"v3: g={g3} w={w3} width={int(width3)}", flush=True)

        def v3_one(ab_s, bp):
            ab_p = jnp.pad(ab_s, ((0, pad3),) + ((0, 0),) * 3)
            return spgemm_pallas._call_kernel_v3(
                ac3, pln3, wlo3, scal, ab_p, bp, kb=kb, nbk=nb,
                k_out=k_out, g_rows=g3, w=w3, precision="highest",
                out_dt=jnp.dtype(jnp.float32))
        rec("kernel_v3_windowed", slope_time(scanner(v3_one, ab, b_panel)))

        def v3_high(ab_s, bp):
            ab_p = jnp.pad(ab_s, ((0, pad3),) + ((0, 0),) * 3)
            return spgemm_pallas._call_kernel_v3(
                ac3, pln3, wlo3, scal, ab_p, bp, kb=kb, nbk=nb,
                k_out=k_out, g_rows=g3, w=w3, precision="high",
                out_dt=jnp.dtype(jnp.float32))
        rec("kernel_v3_high", slope_time(scanner(v3_high, ab, b_panel)))

        def v3_bf16(ab_s, bp):
            ab_p = jnp.pad(ab_s, ((0, pad3),) + ((0, 0),) * 3).astype(
                jnp.bfloat16)
            return spgemm_pallas._call_kernel_v3(
                ac3, pln3, wlo3, scal, ab_p, bp.astype(jnp.bfloat16),
                kb=kb, nbk=nb, k_out=k_out, g_rows=g3, w=w3,
                precision="bf16", out_dt=jnp.dtype(jnp.float32))
        rec("kernel_v3_bf16", slope_time(scanner(v3_bf16, ab, b_panel)))

    # 6c. kernel v4 (band offsets: panel accumulator, slice-adds)
    if g3 is not None:
        gg0, occ0, band_ok = spgemm_pallas.band_plan(ac, ac, k_out)
        print(f"v4 band_ok={bool(band_ok)}", flush=True)
        gg0_p = jnp.pad(gg0, ((0, pad3), (0, 0)))

        for prec in ("highest", "high", "bf16"):
            def v4_one(ab_s, bp, _p=prec):
                ab_p = jnp.pad(ab_s, ((0, pad3),) + ((0, 0),) * 3)
                if _p == "bf16":
                    ab_p = ab_p.astype(jnp.bfloat16)
                    bp = bp.astype(jnp.bfloat16)
                return spgemm_pallas._call_kernel_v4(
                    ac3, gg0_p, wlo3, scal, ab_p, bp, kb=kb, nbk=nb,
                    k_out=k_out, g_rows=g3, w=w3, precision=_p,
                    out_dt=jnp.dtype(jnp.float32))
            rec(f"kernel_v4_{prec}",
                slope_time(scanner(v4_one, ab, b_panel)))

        # end-to-end again (the auto path now picks v4 via the cond)
        rec("matmul_end_to_end_v4", slope_time(scanner(mm, ab)))

        def mm_high(blocks):
            hh = h.with_data(h.col_ids, blocks[None])
            out = alg.matmul(hh, hh, threshold=thr, k_out=k_out,
                             on_overflow="truncate", precision="high")
            return out.blocks
        rec("matmul_end_to_end_v4_high", slope_time(scanner(mm_high, ab)))

    # 7. roofline anchors: same-FLOPs dense matmul and a pure stream
    flops = nb * ka * 2 * bs * bs * kb * bs
    mm_n = int(round(flops ** (1 / 3)))
    da = jnp.array(np.random.default_rng(0).standard_normal(
        (mm_n, mm_n)), jnp.float32)

    def dense(a):
        return a @ a
    dt_dense = slope_time(scanner(dense, da))
    results["dense_same_flops_ms"] = dt_dense * 1e3
    print(f"dense same-FLOPs ({mm_n}^3): {dt_dense*1e3:.3f} ms", flush=True)

    # stream: read A blocks + B panel + write k_out blocks (the kernel's
    # HBM traffic), as one fused elementwise pass
    bytes_touched = (nb * ka * bs * bs + nb * ka * kb * bs * bs
                     + nb * k_out * bs * bs) * 4
    # an elementwise pass reads AND writes its operand, so half the
    # element count gives the same total traffic
    big = jnp.array(np.random.default_rng(1).standard_normal(
        (bytes_touched // 8,)), jnp.float32)

    def stream(x):
        return x * 1.0000001
    dt_stream = slope_time(scanner(stream, big))
    results["stream_same_bytes_ms"] = dt_stream * 1e3
    results["bytes_touched"] = bytes_touched
    print(f"stream same-bytes ({bytes_touched/1e9:.2f} GB): "
          f"{dt_stream*1e3:.3f} ms", flush=True)

    with open("PROFILE_r04_lowk.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PROFILE_r04_lowk.json", flush=True)


if __name__ == "__main__":
    main()
