"""Pallas TPU kernel for the local block-sparse SpGEMM.

This is the hot loop of the whole library: C = alpha * A @ B with threshold
truncation, at block granularity, on one shard.  It is the TPU-native
re-design of NTPoly's Gustavson kernel with a pooled accumulator
(reference Source/Fortran/sparse_includes/MultiplyBlock.f90:8-36,
Source/Fortran/MatrixMemoryPoolModule.F90:13-56, PruneList.f90), split into
a *structure pass* (XLA, integer-only) and a *numeric pass* (Pallas, MXU):

  * structure pass: the output sparsity pattern of every row — candidate
    column ids, their ascending-unique rank (= output slot), and the exact
    structural fill-in count — is computed from the col-id arrays alone
    with vectorized int32 ops.  This replaces the reference's hash-bucket
    index (MatrixMemoryPoolModule.F90) with precomputation: the TPU's
    scalar unit is slow, so the merge plan is built where it's cheap and
    the kernel never searches;
  * numeric pass: one wide MXU matmul per A slot — the B block-row is
    stored *concatenated along columns* (bs, KB*bs), so each dot is
    (bs, bs) x (bs, KB*bs), measured ~2.5x the throughput of KB separate
    (bs, bs) dots on v5e where tiny matmuls are pipeline-fill bound — and
    each (bs, bs) chunk of the product is added straight into its
    precomputed output slot;
  * the numeric pass is a fully pipelined pallas pipeline over grid
    (row, A-slot): B rows are fetched by a gather BlockSpec whose index
    map reads the prefetched col ids, so Pallas double-buffers the
    gathered rows ACROSS grid steps and the MXU never waits on a DMA it
    could have overlapped (the analogue of the reference's comm/compute
    overlap task loop,
    distributed_algebra_includes/MatrixMultiply.f90:87-274);
  * pruning ("PruneList") runs IN-KERNEL on the last accumulation step:
    alpha scaling, elementwise threshold flush, and sublane-reduced block
    norms happen while the output row is still VMEM-resident, so the
    epilogue touches only [R, k_out] metadata (slots whose block flushed
    to zero are marked EMPTY in place — holes, not a re-pack; consumers
    are hole-agnostic, see core/bell.py invariants).

There is NO dense accumulator over output columns, so the kernel scales to
any panel width (a dense-accumulator design hits the VMEM wall once the
panel exceeds ~190 block-columns at bs=128).

Overflow honesty: the structural fill-in count per row is returned, so
callers detect capacity overflow exactly and regrow ``k_out`` instead of
silently truncating (NTPoly grows its memory pool,
sparse_includes/GemmMatrix.f90:48-56).  On overflow the kernel keeps the
first ``k_out`` output columns by ascending column id.

Format contract matches ``bell.spgemm_candidates``:
  A: [R, KA] slots, col ids index block-rows of B (global ids, EMPTY=unused).
  B: [NBK, KB] slots, col ids are global block-cols.
  C: [R, k_out] block-ELL, global col ids, ascending, unique.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EMPTY

Array = jax.Array


def _candidate_ids(a_cols: Array, b_cols: Array) -> Array:
    """[R, KA*KB] output block-col id of every candidate product (EMPTY for
    unused A slots / B slots)."""
    R, KA = a_cols.shape
    valid_a = a_cols != EMPTY
    ks = jnp.where(valid_a, a_cols, 0)
    ids = jnp.where(valid_a[:, :, None], b_cols[ks], EMPTY)   # [R, KA, KB]
    return ids.reshape(R, KA * b_cols.shape[-1])


def _first_occurrence(ids: Array) -> Array:
    """first[..., m] — ids[m] is valid and has no duplicate at m' < m.

    Pairwise comparisons instead of sort: XLA:TPU lowers sort/scatter to
    (near-)serial loops, while an [., M, M] boolean block is one VPU pass
    (M = KA*KB is small in the threshold-sparse regime)."""
    M = ids.shape[-1]
    eq = ids[..., :, None] == ids[..., None, :]               # [., M, M]
    earlier = (jnp.arange(M)[:, None] > jnp.arange(M)[None, :])
    dup = jnp.any(eq & earlier, axis=-1)
    return (ids != EMPTY) & ~dup


def structural_fill(a_cols: Array, b_cols: Array) -> Array:
    """Exact per-row structural fill-in of C = A @ B from col ids alone.

    ucnt[r] = number of distinct output block-columns of row r (before any
    threshold pruning) — the capacity a lossless multiply needs.  This is
    the TPU answer to NTPoly's memory-pool growth
    (reference sparse_includes/GemmMatrix.f90:48-56).
    """
    ids = _candidate_ids(a_cols, b_cols)
    return jnp.sum(_first_occurrence(ids).astype(jnp.int32), axis=-1)


def structure_plan(a_cols: Array, b_cols: Array, k_out: int
                   ) -> Tuple[Array, Array, Array]:
    """The structure pass: output pattern of C = A @ B from col ids alone.

    Returns
      slot   [R, KA*KB] int32 — output slot of each candidate product
                                 (>= k_out means dropped: overflow or EMPTY)
      occ    [R, k_out]  int32 — ascending unique output col ids (EMPTY pad)
      ucnt   [R]         int32 — exact structural fill-in per row

    Sort- and scatter-free: slot of candidate m is the count of distinct
    smaller ids (rank), built from [R, M, M] pairwise comparisons — the
    r02 argsort+scatter version cost ~35 ms/call on chip because XLA:TPU
    serializes scatters; this is pure VPU work.
    """
    a_cols = a_cols.astype(jnp.int32)
    b_cols = b_cols.astype(jnp.int32)
    ids = _candidate_ids(a_cols, b_cols)                      # [R, M]
    M = ids.shape[-1]
    first = _first_occurrence(ids)
    # rank[m] = number of distinct ids smaller than ids[m]
    lt = ids[:, None, :] < ids[:, :, None]                    # [R, m, m']
    rank = jnp.sum((first[:, None, :] & lt).astype(jnp.int32), axis=-1)
    slot = jnp.where(ids != EMPTY, rank, M)
    ucnt = jnp.sum(first.astype(jnp.int32), axis=-1)
    # occ[g] = the (unique) id whose rank is g
    hit = (rank[:, :, None] == jnp.arange(k_out)) & first[:, :, None]
    occ = jnp.min(jnp.where(hit, ids[:, :, None], EMPTY), axis=1)
    return slot, occ, ucnt


_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT,
               # 'bf16': operands quantized to bfloat16 before the kernel
               # (ONE MXU pass + half the HBM stream), f32 accumulate.
               # ~2^-8 relative error — a speed tier for high-threshold
               # workloads and the storage-traffic prototype (r3 VERDICT
               # weak #1), not for 1e-6-tolerance solves.
               "bf16": jax.lax.Precision.DEFAULT}


def _kernel(acols_ref, plan_ref, scal_ref,         # scalar prefetch
            ablk_ref, bpan_ref,                    # pipelined VMEM inputs
            oblk_ref, nrm_ref,                     # pipelined VMEM outputs
            *, ka: int, kb: int, k_out: int,
            precision: str = "highest"):
    r = pl.program_id(0)
    s = pl.program_id(1)
    bs = ablk_ref.shape[-1]

    @pl.when(s == 0)
    def _():
        oblk_ref[...] = jnp.zeros_like(oblk_ref)

    @pl.when(acols_ref[r, s] != EMPTY)
    def _():
        # Default 'highest' = full-f32 MXU passes (6 bf16 passes) — the
        # bf16 default breaks the library's 1e-6 convergence tolerances.
        # 'high' (3 passes, ~2x MXU throughput, ~1e-6 relative dot error)
        # is an opt-in speed knob (SolverParameters.precision); Mosaic
        # has no HIGH lowering, so the bf16 hi/lo split is done by hand
        # and the lo x lo term dropped.
        a = ablk_ref[0, 0]
        b = bpan_ref[0]
        # the hand-rolled split only makes sense for f32 on the MXU; f64
        # (CPU oracle runs) keeps exact dots
        if precision == "high" and a.dtype == jnp.float32:
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            part = (jnp.dot(a_hi, b_hi,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(a_lo, b_hi,
                              preferred_element_type=jnp.float32)
                    + jnp.dot(a_hi, b_lo,
                              preferred_element_type=jnp.float32))
            part = part.astype(oblk_ref.dtype)
        else:
            part = jnp.dot(a, b, preferred_element_type=oblk_ref.dtype,
                           precision=_PRECISIONS[precision])
        for t in range(kb):
            g = plan_ref[r, s * kb + t]

            @pl.when(g < k_out)
            def _():
                oblk_ref[0, g] += part[:, t * bs:(t + 1) * bs]

    # Finalize on the last A slot: alpha scale + elementwise threshold
    # flush (PruneList's rule, reference sparse_includes/PruneList.f90)
    # while the row is still VMEM-resident, plus lane-partial block norms
    # (sublane-reduced; shape (k_out, bs) keeps Mosaic's tiling rules) so
    # the epilogue never re-reads the block tensor.
    @pl.when(s == ka - 1)
    def _():
        scaled = oblk_ref[0] * scal_ref[0]
        flushed = jnp.where(jnp.abs(scaled) > scal_ref[1], scaled, 0.0)
        oblk_ref[0] = flushed
        nrm_ref[0] = jnp.sum(jnp.abs(flushed), axis=1)


# Per-row int32 metadata (a_cols, merge plan) lives in SMEM via scalar
# prefetch; the row dimension is chunked so BOTH SMEM consumers stay
# bounded per pallas_call: the prefetch bytes themselves, and Mosaic's
# per-grid-step scratch for prefetch-driven index maps (~0.5 KB/step —
# measured: 1024 grid steps compile, 2048 overflow the 1 MB SMEM).
ROW_CHUNK = 512
SMEM_PREFETCH_BUDGET = 96 * 1024
MAX_GRID_STEPS = 1024


def _row_chunk(ka: int, kb: int) -> int:
    per_row = 4 * (ka + ka * kb)
    # floor of 8 rows keeps calls sane but must never override the SMEM
    # caps — shapes needing fewer rows than that are rejected by
    # eligible() instead
    return max(8, min(ROW_CHUNK, SMEM_PREFETCH_BUDGET // per_row,
                      MAX_GRID_STEPS // max(ka, 1)))


def _kernel_v2(acols_ref, plan_ref, scal_ref,      # scalar prefetch
               arow_ref,                           # [1, KA, bs, bs] VMEM
               bpan_hbm,                           # [NBK, bs, KB*bs] HBM
               oblk_ref, nrm_ref,                  # pipelined VMEM outputs
               bbuf, sem,                          # scratch
               *, ka: int, kb: int, k_out: int, nbk: int):
    """One grid step per block-row; B rows stream through a manually
    double-buffered VMEM scratch so the DMA for slot s+1 (and the next
    row's slot 0) overlaps the MXU work of slot s — the gather-BlockSpec
    version serialized the stream against compute (measured: kernel time
    == matmul + stream, zero overlap)."""
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)
    bs = arow_ref.shape[-1]

    def copy_for(row, s, slot):
        k = jnp.minimum(acols_ref[row, s], nbk - 1)
        return pltpu.make_async_copy(bpan_hbm.at[k], bbuf.at[slot],
                                     sem.at[slot])

    # slots alternate by GLOBAL step (r*ka + s) so the cross-row prefetch
    # lands in the slot the next row's s=0 will wait on (ka may be odd)
    def slot_of(row, s):
        return (row * ka + s) % 2

    @pl.when(r == 0)
    def _():
        copy_for(0, 0, 0).start()

    oblk_ref[...] = jnp.zeros_like(oblk_ref)

    for s in range(ka):
        slot = slot_of(r, s)
        nxt = slot_of(r, s + 1)
        if s + 1 < ka:
            copy_for(r, s + 1, nxt).start()
        else:
            # prefetch the NEXT row's first B row while this row's last
            # matmul runs (re-targeted to row n-1 at the final row)
            copy_for(jnp.minimum(r + 1, n_rows - 1), 0, nxt).start()
        copy_for(r, s, slot).wait()

        @pl.when(acols_ref[r, s] != EMPTY)
        def _():
            part = jnp.dot(arow_ref[0, s], bbuf[slot],
                           preferred_element_type=oblk_ref.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            for t in range(kb):
                g = plan_ref[r, s * kb + t]

                @pl.when(g < k_out)
                def _():
                    oblk_ref[0, g] += part[:, t * bs:(t + 1) * bs]

    scaled = oblk_ref[0] * scal_ref[0]
    flushed = jnp.where(jnp.abs(scaled) > scal_ref[1], scaled, 0.0)
    oblk_ref[0] = flushed
    nrm_ref[0] = jnp.sum(jnp.abs(flushed), axis=1)

    # drain the cross-row prefetch at the last row
    @pl.when(r == n_rows - 1)
    def _():
        copy_for(r, 0, slot_of(r + 1, 0)).wait()


def _kernel_v3(acols_ref, plan_ref, wlo_ref, scal_ref,   # scalar prefetch
               arow_ref,                     # [G, KA, bs, bs] VMEM
               bpan_hbm,                     # [NBK, bs, KB*bs] HBM
               oblk_ref, nrm_ref,            # [G, k_out, ...] VMEM outputs
               bwin, sem,                    # scratch
               *, ka: int, kb: int, k_out: int, nbk: int, g_rows: int,
               w: int, precision: str):
    """The WINDOWED row-batch kernel for low-K (banded) shapes.

    r3's kernels pay one B-row DMA per (row, A-slot); on a banded
    matrix consecutive rows reference overlapping B rows, so a group of
    G rows needs only W = KA + G - 1 distinct rows.  One grid step per
    group: the whole window rides ONE contiguous double-buffered DMA
    (prefetched across groups), G*KA wide dots run from the resident
    window, and the per-group epilogue finalizes in VMEM.  This also
    collapses the row-chunked multi-call + concatenate pipeline (13
    pallas_calls + a 1.3 GB concat at the 2^19 bench shape) into a
    single call (measured in PROFILE_r04_lowk.json: 14.7 ms kernel +
    17 ms of XLA glue at that shape, against a 3.0 ms stream floor).
    """
    # acols_ref and plan_ref are FLATTENED 1-D prefetch arrays
    # ([R*KA], [R*KA*KB]): a 2-D SMEM operand pads its minor dim to the
    # 128-lane width, so the [R, KA*KB] plan would cost R*512 bytes of
    # SMEM (2.1 MB at nb=4096 — over the 1 MB budget, measured).
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    bs = arow_ref.shape[-1]

    def copy_for(grp, slot):
        lo = jnp.minimum(wlo_ref[grp], nbk - w)
        return pltpu.make_async_copy(bpan_hbm.at[pl.ds(lo, w)],
                                     bwin.at[slot], sem.at[slot])

    @pl.when(g == 0)
    def _():
        copy_for(0, 0).start()

    @pl.when(g + 1 < ng)
    def _():
        copy_for(g + 1, (g + 1) % 2).start()

    copy_for(g, g % 2).wait()
    oblk_ref[...] = jnp.zeros_like(oblk_ref)
    win_lo = jnp.minimum(wlo_ref[g], nbk - w)
    for i in range(g_rows):
        r = g * g_rows + i
        for s in range(ka):

            @pl.when(acols_ref[r * ka + s] != EMPTY)
            def _(i=i, s=s, r=r):
                local = jnp.clip(acols_ref[r * ka + s] - win_lo, 0, w - 1)
                a = arow_ref[i, s]
                b = bwin[g % 2, local]
                if precision == "high" and a.dtype == jnp.float32:
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
                    part = part.astype(oblk_ref.dtype)
                else:
                    part = jnp.dot(a, b,
                                   preferred_element_type=oblk_ref.dtype,
                                   precision=_PRECISIONS[precision])
                for t in range(kb):
                    gg = plan_ref[(r * ka + s) * kb + t]

                    @pl.when(gg < k_out)
                    def _(t=t, gg=gg):
                        oblk_ref[i, gg] += part[:, t * bs:(t + 1) * bs]

    scaled = oblk_ref[...] * scal_ref[0]
    flushed = jnp.where(jnp.abs(scaled) > scal_ref[1], scaled, 0.0)
    oblk_ref[...] = flushed
    nrm_ref[...] = jnp.sum(jnp.abs(flushed), axis=2)


def _call_kernel_v3(a_cols, plan, wlo, scal, a_blocks, b_panel,
                    *, kb: int, nbk: int, k_out: int, g_rows: int, w: int,
                    precision: str, out_dt, interpret: bool = False):
    R, KA = a_cols.shape
    bs = a_blocks.shape[-1]
    dt = jnp.dtype(out_dt)
    ng = R // g_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((g_rows, KA, bs, bs), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),       # B stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((g_rows, k_out, bs, bs),
                         lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, k_out, bs), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, w, bs, kb * bs), a_blocks.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_v3, ka=KA, kb=kb, k_out=k_out,
                               nbk=nbk, g_rows=g_rows, w=w,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=V3_VMEM_COMPILER_CAP),
        out_shape=[jax.ShapeDtypeStruct((R, k_out, bs, bs), dt),
                   jax.ShapeDtypeStruct((R, k_out, bs), dt)],
        cost_estimate=pl.CostEstimate(
            flops=R * KA * 2 * bs * bs * kb * bs,
            bytes_accessed=(R * KA * bs * bs + ng * w * kb * bs * bs
                            + R * k_out * bs * bs) * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a_cols.reshape(-1), plan.reshape(-1), wlo, scal, a_blocks, b_panel)


def band_plan(a_cols: Array, b_cols: Array, k_out: int,
              span: int | None = None):
    """Offset-form output plan for the band kernel (v4).

    When every referenced B row is *arithmetically contiguous* — all its
    valid cols satisfy ``col(t) = base + t`` (EMPTY holes anywhere are
    fine: their blocks are zero) — the product of A slot s lands at
    output offset ``gg0 = base(acol_s) - occ0`` and its KB column blocks
    at gg0..gg0+KB-1, so the kernel can accumulate each partial product
    with ONE dynamic-start contiguous slice-add instead of KB
    dynamic-slot scatters (the scatters are the measured ~6.5 ms fixed
    cost of the windowed kernel at the banded bench shape,
    PROFILE_r04_lowk.json).

    ``span`` (defaults to k_out): width of the kernel's accumulator
    panel in blocks — narrowing it to the banded worst case
    (KA + KB - 1) cuts the fixed per-row VMEM traffic that priced r4's
    kernel (zero-init + flush + transpose passes scale with the panel
    width, not the data).  ok requires every row's output span to fit.

    Returns (gg0 [R, KA] int32, occ0 [R] int32, ok scalar bool).
    """
    R, KA = a_cols.shape
    NBK, KB = b_cols.shape
    span = k_out if span is None else span
    big = jnp.int32(EMPTY)
    t_idx = jnp.arange(KB, dtype=jnp.int32)
    validb = b_cols != EMPTY
    base_all = jnp.where(validb, b_cols - t_idx, big)
    base_min = jnp.min(base_all, axis=1)                     # [NBK]
    base_max = jnp.max(jnp.where(validb, b_cols - t_idx, -1), axis=1)
    has_b = jnp.any(validb, axis=1)
    b_ok = jnp.all(~has_b | (base_min == base_max))
    base = jnp.where(has_b, base_min, 0).astype(jnp.int32)
    # ACTUAL data extent of each B row (last valid slot position + 1),
    # not the structural capacity KB: capacity-padded operands (EMPTY
    # high slots = zero blocks, e.g. a k_out=5 solve whose iterate
    # carries capacity 5 with 3 filled) would otherwise be flagged as
    # span violations even though their data fits.  The kernel's
    # structural-width writes beyond ext land in the accumulator's
    # slack region (KB - 1 extra blocks) and only ever add zeros.
    ext = jnp.max(jnp.where(validb, t_idx + 1, 0), axis=1)   # [NBK]
    valida = a_cols != EMPTY
    ks = jnp.where(valida, a_cols, 0)
    rbase = jnp.where(valida, base[ks], big)                 # [R, KA]
    occ0 = jnp.min(rbase, axis=1)                            # [R]
    occ0 = jnp.where(occ0 == big, 0, occ0)
    hi = jnp.max(jnp.where(valida, rbase + ext[ks], -big), axis=1)
    span_ok = jnp.all(~jnp.any(valida, axis=1)
                      | (hi - occ0 <= min(span, k_out)))
    # base can only be negative for a (zero-block) head hole pattern
    # like cols [EMPTY, 0, ...]; clamp so offsets stay in range (valid
    # slots satisfy gg0 <= span - 1 under span_ok: ext >= 1 each)
    gg0 = jnp.clip(jnp.where(valida, rbase - occ0[:, None], 0),
                   0, max(min(span, k_out) - 1, 0)).astype(jnp.int32)
    return gg0, occ0.astype(jnp.int32), b_ok & span_ok


def _v4_span(ka: int, kb: int, k_out: int) -> int:
    """Static accumulator-panel width (blocks) for the band kernel: a
    contiguous-band product spans at most KA + KB - 1 output blocks, so
    the panel (and every fixed zero/flush/store pass over it) narrows
    from k_out to that — the fixed VMEM traffic was the measured ~6 ms
    of r4's kernel (PROFILE_r04_lowk.json)."""
    return min(k_out, ka + kb - 1)


def _kernel_v4(acols_ref, gg0_ref, wlo_ref, bflag_ref, ug_ref,
               scal_ref,                     # scalar prefetch
               arow_ref,                     # [G, KA, bs, bs] VMEM
               braw_hbm,                     # [NBK, KB, bs, bs] HBM
               oblk_ref, nrm_ref,            # [G, k_out, ...] VMEM outputs
               bwin, bwide, pacc, sem,       # scratch
               *, ka: int, kb: int, k_out: int, nbk: int, g_rows: int,
               w: int, span: int, precision: str):
    """Band kernel: windowed DMA reuse + offset-form accumulation.

    r5 redesign of r4's v4 (three named costs from PROFILE_r04_lowk):

      * B rides in its NATIVE block-ELL layout — the per-multiply XLA
        mask+transpose re-pack streamed ALL of B through HBM twice per
        call (VERDICT r4 weak #2); the wide-dot panel form is now built
        IN-KERNEL per window (w*KB small VMEM copies, amortized over
        the G rows that share the window), with EMPTY slots zero-filled
        from the prefetched validity flags.
      * the accumulator pacc is the per-row OUTPUT slice of oblk itself
        over a NARROWED span (<= KA+KB-1 blocks, not k_out): dynamic
        lane-offset slice-adds accumulate partial products, and the
        epilogue scales/flushes/stores per static block slice — one
        read + one write per element instead of r4's zero + accumulate
        + full-width scale pass + k_out transposing copies.
      * acols/gg0 ride as FLAT 1-D prefetch arrays (2-D SMEM operands
        pad the minor dim to 128 lanes).

    Output layout note: oblk slot t of row (g, i) holds the PANEL
    column t (offset form, occ0 + t), written from pacc; slots beyond
    span are zeroed."""
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    bs = arow_ref.shape[-1]

    def copy_for(grp, slot):
        lo = jnp.minimum(wlo_ref[grp], nbk - w)
        return pltpu.make_async_copy(braw_hbm.at[pl.ds(lo, w)],
                                     bwin.at[slot], sem.at[slot])

    @pl.when(g == 0)
    def _():
        copy_for(0, 0).start()

    @pl.when(g + 1 < ng)
    def _():
        copy_for(g + 1, (g + 1) % 2).start()

    copy_for(g, g % 2).wait()
    win_lo = jnp.minimum(wlo_ref[g], nbk - w)
    # build the wide-dot panel form [w, bs, KB*bs] from the raw window:
    # slot-major -> column-concatenated, EMPTY slots zeroed (defends the
    # all-zero-block invariant against raw caller arrays)
    for wi in range(w):
        row = jnp.minimum(win_lo + wi, nbk - 1)
        for t in range(kb):
            ok = bflag_ref[row * kb + t] != 0

            @pl.when(ok)
            def _(wi=wi, t=t):
                bwide[wi, :, t * bs:(t + 1) * bs] = bwin[g % 2, wi, t]

            @pl.when(~ok)
            def _(wi=wi, t=t):
                bwide[wi, :, t * bs:(t + 1) * bs] = jnp.zeros(
                    (bs, bs), bwide.dtype)

    # group-batched accumulation into the span-narrowed VMEM panel:
    # zero-init, RMW slice-adds, and the epilogue all run at [G, ...]
    # granularity (a per-row variant measured ~1 ms slower at the bench
    # shape — op-dispatch overhead, not traffic)
    pacc[...] = jnp.zeros_like(pacc)

    def _split_dot(a, b, batched: bool):
        dn = (((2,), (1,)), ((0,), (0,)))
        if precision == "high" and a.dtype == jnp.float32:
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            if batched:
                part = (jax.lax.dot_general(
                    a_hi, b_hi, dn, preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        a_lo, b_hi, dn,
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        a_hi, b_lo, dn,
                        preferred_element_type=jnp.float32))
            else:
                part = (jnp.dot(a_hi, b_hi,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(a_lo, b_hi,
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(a_hi, b_lo,
                                  preferred_element_type=jnp.float32))
            return part.astype(pacc.dtype)
        if batched:
            return jax.lax.dot_general(
                a, b, dn, preferred_element_type=pacc.dtype,
                precision=_PRECISIONS[precision])
        return jnp.dot(a, b, preferred_element_type=pacc.dtype,
                       precision=_PRECISIONS[precision])

    # UNIFORM groups (flagged per group on the host side: every valid
    # slot satisfies acols == wlo + i + s and gg0 == s — true for the
    # full interior of a banded matrix): row i's slot-s window row is
    # exactly i + s, so the whole group's dots batch into ONE
    # dot_general per A slot with a STATIC accumulate offset — measured
    # 9.5 -> 8.6 ms at 'high' on the 2^19/band-24 shape.  Mosaic lowers
    # a precision=HIGHEST batched dot_general ~40% SLOWER than per-row
    # jnp.dot (15.6 vs 11.4 ms measured), so 'highest' keeps the
    # per-(i, s) path.
    batched_ok = precision != "highest"

    # pacc carries kb - 1 SLACK blocks past the span (see
    # _call_kernel_v4): every write is the full structural width kb at
    # offset gg0 <= span - 1, so it always fits, and columns beyond a
    # B row's actual data extent only ever add zeros into the slack.
    # Slots at s >= span cannot hold data under band_plan.span_ok
    # (every valid slot keeps at least one real column inside the
    # span), so the batched loop stops there — without the stop, the
    # static loop over capacity-padded operands (ka + kb - 1 > span)
    # ran off the panel entirely (the r5 trs4_100k/1m trace crash).
    @pl.when(ug_ref[g] != 0 if batched_ok else jnp.bool_(False))
    def _():
        for s in range(min(ka, span)):
            part = _split_dot(arow_ref[:, s], bwide[pl.ds(s, g_rows)],
                              True)
            pacc[:, :, s * bs:(s + kb) * bs] += part

    @pl.when(ug_ref[g] == 0 if batched_ok else jnp.bool_(True))
    def _():
        for i in range(g_rows):
            r = g * g_rows + i
            for s in range(ka):

                @pl.when(acols_ref[r * ka + s] != EMPTY)
                def _(i=i, s=s, r=r):
                    local = jnp.clip(acols_ref[r * ka + s] - win_lo,
                                     0, w - 1)
                    part = _split_dot(arow_ref[i, s], bwide[local],
                                      False)
                    off = gg0_ref[r * ka + s] * bs
                    pacc[i, :, pl.ds(off, kb * bs)] += part
    # fused epilogue per block slice over the whole group: scale +
    # threshold flush + store + sublane-reduced norm — one read of pacc
    # and one write of oblk per element (r4 paid a full-width scale pass
    # plus k_out transposing copies); slots beyond the span are zeroed
    for t in range(k_out):
        if t < span:
            sl = pacc[:, :, t * bs:(t + 1) * bs] * scal_ref[0]
            fl = jnp.where(jnp.abs(sl) > scal_ref[1], sl, 0.0)
            oblk_ref[:, t] = fl
            nrm_ref[:, t] = jnp.sum(jnp.abs(fl), axis=1)
        else:
            oblk_ref[:, t] = jnp.zeros((g_rows, bs, bs), oblk_ref.dtype)
            nrm_ref[:, t] = jnp.zeros((g_rows, bs), nrm_ref.dtype)


def _uniform_groups(ac_p, gg0_p, wlo, g_rows: int, w: int, nbk: int):
    """Per-group flag for the kernel's batched fast path: 1 when every
    VALID slot of the group satisfies acols == wlo + i + s (window-local
    row is exactly i + s) and gg0 == s (static accumulate offset), and
    the window start was not clamped at the matrix edge."""
    R, KA = ac_p.shape
    ng = R // g_rows
    acg = ac_p.reshape(ng, g_rows, KA)
    ggg = gg0_p.reshape(ng, g_rows, KA)
    i_idx = jnp.arange(g_rows, dtype=jnp.int32)[None, :, None]
    s_idx = jnp.arange(KA, dtype=jnp.int32)[None, None, :]
    valid = acg != EMPTY
    want = wlo[:, None, None] + i_idx + s_idx
    ok = (~valid) | ((acg == want) & (ggg == s_idx))
    ok = jnp.all(ok, axis=(1, 2)) & (wlo <= nbk - w)
    return ok.astype(jnp.int32)


def _call_kernel_v4(a_cols, gg0, wlo, bflag, scal, a_blocks, b_raw,
                    *, kb: int, nbk: int, k_out: int, g_rows: int, w: int,
                    precision: str, out_dt, interpret: bool = False):
    R, KA = a_cols.shape
    bs = a_blocks.shape[-1]
    dt = jnp.dtype(out_dt)
    ng = R // g_rows
    span = _v4_span(KA, kb, k_out)
    ug = _uniform_groups(a_cols, gg0, wlo, g_rows, w, nbk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((g_rows, KA, bs, bs), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),       # B stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((g_rows, k_out, bs, bs),
                         lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, k_out, bs), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, w, kb, bs, bs), a_blocks.dtype),
            pltpu.VMEM((w, bs, kb * bs), a_blocks.dtype),
            # kb - 1 slack blocks past the span: structural-width
            # writes at gg0 <= span - 1 always fit; the slack only
            # ever receives zeros (beyond a B row's actual extent)
            pltpu.VMEM((g_rows, bs, (span + kb - 1) * bs), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_v4, ka=KA, kb=kb, k_out=k_out,
                               nbk=nbk, g_rows=g_rows, w=w, span=span,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=V3_VMEM_COMPILER_CAP),
        out_shape=[jax.ShapeDtypeStruct((R, k_out, bs, bs), dt),
                   jax.ShapeDtypeStruct((R, k_out, bs), dt)],
        cost_estimate=pl.CostEstimate(
            flops=R * KA * 2 * bs * bs * kb * bs,
            bytes_accessed=(R * KA * bs * bs + ng * w * kb * bs * bs
                            + R * k_out * bs * bs) * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a_cols.reshape(-1), gg0.reshape(-1), wlo, bflag.reshape(-1), ug,
      scal, a_blocks, b_raw)


V3_MIN_ROWS = 128                      # regime gate (see _v3_pick)
V3_MAX_KA = 8
V3_VMEM_BUDGET = 64 * 1024 * 1024      # picker budget (estimate)
# Mosaic's scoped-VMEM cap for the band kernels: the picker's estimate
# misses alignment/semaphore slop, so the compiler cap carries ~1.5x
# headroom over the budget (v5e VMEM is 128 MB physical)
V3_VMEM_COMPILER_CAP = 96 * 1024 * 1024
V3_SMEM_BUDGET = 512 * 1024            # prefetch arrays (acols + plan)


def _v3_pick(ka: int, kb: int, k_out: int, bs: int, in_item: int,
             out_item: int, r: int, nbk: int,
             interpret: bool = False):
    """(g_rows, window) for the band kernels, or (None, None) when the
    shape is outside their regime.

    The regime gate is MEASURED: the windowed kernels win at many-row
    low-K shapes (1.8x at nb=4096, KA=3 — PROFILE_r04_lowk.json) but
    LOSE ~2x at few-row high-K shapes (hotelling at nb=32, KA up to 24:
    4.3 s -> 8.7 s per solve with the cond enabled — tiny grids can't
    pipeline the window DMAs and the panel store's dynamic lane offset
    widens with k_out), so small-R / large-KA shapes keep the chunked
    kernel."""
    if r < V3_MIN_ROWS or ka > V3_MAX_KA:
        return None, None
    # v4's panel slice-add needs a lane offset Mosaic can prove is a
    # multiple of 128 (off = gg0*bs), and a static slice width kb*bs
    # that fits the k_out*bs accumulator (review findings r4: bs<128
    # crashed Mosaic on hardware; kb>k_out was a trace-time TypeError)
    if bs % 128 != 0 and not interpret:
        return None, None
    if kb > k_out:
        return None, None
    if (r * ka + r * ka * kb) * 4 > V3_SMEM_BUDGET:
        return None, None
    for g in (8, 16, 4, 2):
        w = ka + g - 1
        if nbk < w or r < g:
            continue
        if -(-r // g) > MAX_GRID_STEPS:
            continue
        vmem = (2 * w * bs * kb * bs * in_item          # B window x2
                + 2 * g * ka * bs * bs * in_item        # pipelined A x2
                + 2 * g * k_out * bs * bs * out_item    # pipelined out x2
                + 2 * g * k_out * bs * out_item         # norms
                + g * bs * k_out * bs * out_item)       # v4 panel acc
        if vmem <= V3_VMEM_BUDGET:
            return g, w
    return None, None


def _v4_pick(ka: int, kb: int, k_out: int, bs: int, in_item: int,
             out_item: int, r: int, nbk: int,
             interpret: bool = False):
    """(g_rows, window) for the r5 band kernel, or (None, None).

    Same regime gate as :func:`_v3_pick` EXCEPT the SMEM term: v4
    prefetches acols + gg0 ([R*KA] each) + the B validity flags
    ([NBK*KB]) — NOT the [R*KA*KB] merge plan, which was what priced
    the r4 gate out of the 2^20-row TRS4's late iterations (KA=KB=5:
    983 KB of plan vs the 512 KB budget, silently falling back to the
    chunked kernel)."""
    if r < V3_MIN_ROWS or ka > V3_MAX_KA:
        return None, None
    if bs % 128 != 0 and not interpret:
        return None, None
    if kb > k_out:
        return None, None
    if (2 * r * ka + nbk * kb) * 4 > V3_SMEM_BUDGET:
        return None, None
    span = _v4_span(ka, kb, k_out)
    # 16-first: the batched uniform path measured best at g=16
    # (PROFILE_r05_lowk.json kernel_v7_batched_high_g16)
    for g in (16, 8, 4, 2):
        w = ka + g - 1
        if nbk < w or r < g:
            continue
        if -(-r // g) > MAX_GRID_STEPS:
            continue
        vmem = (2 * w * kb * bs * bs * in_item          # raw B window x2
                + w * bs * kb * bs * in_item            # wide panel form
                + 2 * g * ka * bs * bs * in_item        # pipelined A x2
                + 2 * g * k_out * bs * bs * out_item    # pipelined out x2
                + 2 * g * k_out * bs * out_item         # norms
                # span accumulator + kb-1 slack (structural-width
                # writes at gg0 <= span-1 always fit)
                + g * bs * (span + kb - 1) * bs * out_item)
        if vmem <= V3_VMEM_BUDGET:
            return g, w
    return None, None


def _v3_window(a_cols, g_rows: int):
    """Per-group window starts and the max window width, from col ids
    alone: wlo[g] = min valid col id of group g, width = max over groups
    of (max - min + 1).  Width is a traced scalar — the caller reads it
    back once (alongside the structural-fill stats it already syncs) or
    compares against the static budget under jit via jnp.where."""
    R, KA = a_cols.shape
    ng = R // g_rows
    grp = a_cols.reshape(ng, g_rows * KA)
    valid = grp != EMPTY
    lo = jnp.min(jnp.where(valid, grp, EMPTY), axis=1)        # [ng]
    hi = jnp.max(jnp.where(valid, grp, -1), axis=1)
    width = jnp.max(jnp.where(jnp.any(valid, axis=1), hi - lo + 1, 0))
    return jnp.where(lo == EMPTY, 0, lo).astype(jnp.int32), width


def _call_kernel_v2(a_cols, plan, scal, a_blocks, b_panel,
                    *, kb: int, nbk: int, k_out: int,
                    interpret: bool = False):
    R, KA = a_cols.shape
    bs = a_blocks.shape[-1]
    dt = a_blocks.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, KA, bs, bs), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),          # B stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, k_out, bs, bs), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_out, bs), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bs, kb * bs), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_v2, ka=KA, kb=kb, k_out=k_out,
                               nbk=nbk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        out_shape=[jax.ShapeDtypeStruct((R, k_out, bs, bs), dt),
                   jax.ShapeDtypeStruct((R, k_out, bs), dt)],
        cost_estimate=pl.CostEstimate(
            flops=R * KA * 2 * bs * bs * kb * bs,
            bytes_accessed=(R * KA * bs * bs + R * KA * kb * bs * bs
                            + R * k_out * bs * bs) * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a_cols, plan, scal, a_blocks, b_panel)


def _call_kernel(a_cols, plan, scal, a_blocks, b_panel,
                 *, kb: int, nbk: int, k_out: int, interpret: bool,
                 precision: str = "highest", out_dt=None):
    """Numeric pass as a fully pipelined pallas pipeline: grid (R, KA); the
    B block-row for step (r, s) is fetched by a *gather BlockSpec* whose
    index map reads the prefetched col ids (so Pallas double-buffers the
    gathered rows across grid steps — the role of the reference's
    comm/compute overlap task loop); the output row block stays VMEM
    -resident while its KA accumulation steps run, and the prune epilogue
    (alpha scale + threshold + per-slot norms) runs in-kernel on the last
    slot, so no XLA pass ever re-reads the block tensor."""
    R, KA = a_cols.shape
    bs = a_blocks.shape[-1]
    dt = jnp.dtype(out_dt) if out_dt is not None else a_blocks.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R, KA),
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda r, s, *_: (r, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bs, kb * bs),
                lambda r, s, acols, plan, scal: (
                    jnp.minimum(acols[r, s], nbk - 1), 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_out, bs, bs),
                         lambda r, s, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_out, bs), lambda r, s, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, ka=KA, kb=kb, k_out=k_out,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # Mosaic's own pipelining slop pushes big-k_out shapes past the
        # 16 MB default scoped cap; eligible() bounds the real footprint
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        out_shape=[jax.ShapeDtypeStruct((R, k_out, bs, bs), dt),
                   jax.ShapeDtypeStruct((R, k_out, bs), dt)],
        cost_estimate=pl.CostEstimate(
            flops=R * KA * 2 * bs * bs * kb * bs,
            bytes_accessed=(R * KA * bs * bs + R * KA * kb * bs * bs
                            + R * k_out * bs * bs) * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a_cols, plan, scal, a_blocks, b_panel)


@functools.partial(
    jax.jit,
    static_argnames=("k_out", "interpret", "precision", "band_mode"))
def spgemm_pallas(a_cols: Array, a_blocks: Array, b_cols: Array,
                  b_blocks: Array, *, k_out: int,
                  threshold=0.0, alpha=1.0,
                  interpret: bool = False, precision: str = "highest",
                  band_mode: str = "auto") -> Tuple[Array, Array, Array]:
    """C = alpha * A @ B, threshold-filtered, on one shard (Pallas TPU).

    Returns (col_ids [R, k_out], blocks [R, k_out, bs, bs],
    ucnt [R] — exact structural fill-in per row, so ``ucnt > k_out``
    flags capacity overflow).

    band_mode: 'auto' (default) dispatches between the band kernel and
    the chunked fallback with a runtime lax.cond — both arms compile,
    and XLA reserves HBM for the fallback's chunk outputs + concatenate
    even when the band arm always runs (measured ~5 GB of the 2^20-row
    TRS4's 21 GB chunk program).  'force' compiles ONLY the band arm
    for workloads the caller knows stay banded (e.g. threshold-filtered
    purification of a banded Hamiltonian); if the runtime predicates
    are violated the returned ucnt is poisoned to 2^30, so the caller's
    overflow machinery reports it instead of silently clipping.
    'off' never uses the band kernels.

    Output format note: non-EMPTY col ids are ascending and unique, but a
    slot whose whole block fell below the threshold is marked EMPTY *in
    place* (its block is zero) — EMPTY slots may be interleaved, not
    packed last.  Every consumer in :mod:`..core.bell` is order- and
    hole-agnostic; re-pack with ``bell.compact`` if a dense prefix is
    required.  This is what makes the epilogue free: the kernel's block
    output IS the result, and only the [R, k_out] col-id metadata is
    touched afterwards.
    """
    R, KA = a_cols.shape
    NBK, KB = b_cols.shape
    bs = a_blocks.shape[-1]
    dt = jnp.result_type(a_blocks.dtype, b_blocks.dtype)
    assert not jnp.issubdtype(dt, jnp.complexfloating), \
        "pallas path is real-only; use bell for complex"
    # the SMEM caps must hold even at _row_chunk's floor of 8 rows — this
    # is public and jitted, so misuse must fail loudly here rather than
    # emit an SMEM-overflowing pallas_call (callers normally consult
    # eligible() first, which enforces the same preconditions)
    if 8 * KA > MAX_GRID_STEPS or 8 * 4 * (KA + KA * KB) > \
            SMEM_PREFETCH_BUDGET:
        raise ValueError(
            f"spgemm_pallas: shape KA={KA}, KB={KB} exceeds the SMEM "
            f"budget even at the minimum row chunk (needs 8*KA <= "
            f"{MAX_GRID_STEPS} grid steps and 32*(KA + KA*KB) <= "
            f"{SMEM_PREFETCH_BUDGET} prefetch bytes); gate with "
            "eligible() and fall back to the XLA paths")

    plan, occp, ucnt = structure_plan(a_cols, b_cols, k_out)

    # bf16 tier: quantize the streamed operands (the dominant HBM
    # traffic) and accumulate f32 — one MXU pass instead of six
    compute_dt = jnp.bfloat16 if (precision == "bf16"
                                  and dt == jnp.float32) else dt

    ab = a_blocks.astype(compute_dt)
    b_raw = b_blocks.astype(compute_dt)
    bflag = (b_cols != EMPTY).astype(jnp.int32)
    scal = jnp.stack([jnp.asarray(alpha, jnp.float32),
                      jnp.asarray(threshold, jnp.float32)]).astype(dt)

    def make_panel():
        """B rows concatenated along columns, (NBK, bs, KB*bs): one wide
        MXU dot per A slot instead of KB tiny ones, for the chunked
        kernels.  EMPTY-slot blocks are masked in the same pass.  Built
        LAZILY inside the arm that consumes it — materializing it
        unconditionally re-streamed all of B through HBM twice per
        multiply even when the band kernel (which packs the panel form
        in-kernel from the raw window) always ran (VERDICT r4 weak #2)."""
        b_masked = jnp.where((b_cols != EMPTY)[..., None, None],
                             b_raw, 0)
        return jnp.swapaxes(b_masked, -3, -2).reshape(NBK, bs, KB * bs)

    # Band path (kernel v4): when every G-row group's col ids fit a
    # W = KA + G - 1 window AND the band plan holds (true for banded
    # operands — the library's core regime), the whole multiply is ONE
    # pallas call with contiguous raw-window DMAs.  The runtime check is
    # data-dependent, so the jit branches with lax.cond; both arms share
    # output shapes.
    g_rows, wv4 = _v4_pick(KA, KB, k_out, bs,
                           jnp.dtype(compute_dt).itemsize,
                           jnp.dtype(dt).itemsize, R, NBK,
                           interpret=interpret)
    if band_mode == "off":
        g_rows = None
    if band_mode == "force" and g_rows is None:
        # 'force' promises a SINGLE-ARM compile (no cond, so no HBM
        # reserved for an unused fallback's chunk buffers — ~5 GB at
        # the 2^20-row bench shape).  Outside the band kernel's regime
        # the single arm is the chunked kernel; warn so the caller
        # knows the band kernel specifically is not running (ADVICE
        # r4: no silent fallthrough).
        import warnings
        warnings.warn(
            f"spgemm_pallas(band_mode='force'): shape R={R}, KA={KA}, "
            f"KB={KB}, k_out={k_out}, bs={bs} is outside the band "
            "kernel's regime; compiling the chunked kernel as the "
            "single arm instead")
    occ_used = occp
    if g_rows is not None and band_mode == "force":
        pad = -R % g_rows
        ac_p = jnp.pad(a_cols, ((0, pad), (0, 0)), constant_values=EMPTY)
        ab_p = jnp.pad(ab, ((0, pad),) + ((0, 0),) * 3)
        wlo, width = _v3_window(ac_p, g_rows)
        span = _v4_span(KA, KB, k_out)
        gg0, occ0, band_ok = band_plan(a_cols, b_cols, k_out, span=span)
        gg0_p = jnp.pad(gg0, ((0, pad), (0, 0)))
        use_band = (width <= wv4) & band_ok
        cb, npart = _call_kernel_v4(
            ac_p, gg0_p, wlo, bflag, scal, ab_p, b_raw, kb=KB, nbk=NBK,
            k_out=k_out, g_rows=g_rows, w=wv4, precision=precision,
            out_dt=dt, interpret=interpret)
        if pad:
            cb = cb[:R]
            npart = npart[:R]
        occ_used = occ0[:, None] + jnp.arange(k_out, dtype=jnp.int32)
        # poisoned fill count surfaces a violated band assumption
        # through the caller's overflow machinery
        ucnt = jnp.where(use_band, ucnt, jnp.int32(EMPTY))
    elif g_rows is not None:
        pad = -R % g_rows
        ac_p = jnp.pad(a_cols, ((0, pad), (0, 0)), constant_values=EMPTY)
        plan_p = jnp.pad(plan, ((0, pad), (0, 0)),
                         constant_values=k_out)
        ab_p = jnp.pad(ab, ((0, pad),) + ((0, 0),) * 3)
        wlo, width = _v3_window(ac_p, g_rows)
        span = _v4_span(KA, KB, k_out)
        gg0, occ0, band_ok = band_plan(a_cols, b_cols, k_out, span=span)
        gg0_p = jnp.pad(gg0, ((0, pad), (0, 0)))
        use_band = (width <= wv4) & band_ok

        def run_v4(ac_i, gg0_i, wlo_i, ab_i, braw_i):
            return _call_kernel_v4(
                ac_i, gg0_i, wlo_i, bflag, scal, ab_i, braw_i, kb=KB,
                nbk=NBK, k_out=k_out, g_rows=g_rows, w=wv4,
                precision=precision, out_dt=dt, interpret=interpret)

        def run_v1(ac_i, gg0_i, wlo_i, ab_i, braw_i):
            bp_i = jnp.swapaxes(
                jnp.where((b_cols != EMPTY)[..., None, None], braw_i, 0),
                -3, -2).reshape(NBK, bs, KB * bs)
            chunk_i = _row_chunk(KA, KB)
            cbs_i, nps_i = [], []
            for lo in range(0, R + pad, chunk_i):
                hi = min(lo + chunk_i, R + pad)
                cb_j, np_j = _call_kernel(
                    ac_i[lo:hi], plan_p[lo:hi], scal, ab_i[lo:hi], bp_i,
                    kb=KB, nbk=NBK, k_out=k_out, interpret=interpret,
                    precision=precision, out_dt=dt)
                cbs_i.append(cb_j)
                nps_i.append(np_j)
            return (jnp.concatenate(cbs_i, axis=0) if len(cbs_i) > 1
                    else cbs_i[0],
                    jnp.concatenate(nps_i, axis=0) if len(nps_i) > 1
                    else nps_i[0])

        cb, npart = jax.lax.cond(use_band, run_v4, run_v1,
                                 ac_p, gg0_p, wlo, ab_p, b_raw)
        if pad:
            cb = cb[:R]
            npart = npart[:R]
        # band-mode output slots are offsets from occ0, not ranks
        occ_band = occ0[:, None] + jnp.arange(k_out, dtype=jnp.int32)
        occ_used = jnp.where(use_band, occ_band, occp)
    else:
        b_panel = make_panel()
        cbs, nps = [], []
        chunk = _row_chunk(KA, KB)
        for lo in range(0, R, chunk):
            hi = min(lo + chunk, R)
            cb_i, np_i = _call_kernel(
                a_cols[lo:hi], plan[lo:hi], scal, ab[lo:hi],
                b_panel, kb=KB, nbk=NBK, k_out=k_out, interpret=interpret,
                precision=precision, out_dt=dt)
            cbs.append(cb_i)
            nps.append(np_i)
        cb = cbs[0] if len(cbs) == 1 else jnp.concatenate(cbs, axis=0)
        npart = nps[0] if len(nps) == 1 else jnp.concatenate(nps, axis=0)

    # Metadata-only epilogue: mark slots whose whole block flushed to zero
    # EMPTY in place.  The kernel already emitted sublane-reduced norm
    # partials, so this reads k_out*bs floats per row — never the block
    # tensor.
    nm = jnp.sum(npart, axis=-1)
    cc = jnp.where(nm > 0, occ_used, EMPTY)
    return cc, cb, ucnt


def vmem_bytes(k_out: int, ka: int, kb: int, bs: int,
               itemsize: int = 4) -> int:
    """Estimated VMEM footprint of one kernel invocation.

    ``ka`` does not enter: the grid iterates A slots one at a time, so
    only one (double-buffered) A block is resident regardless of KA."""
    bbuf = 2 * bs * kb * bs            # double-buffered gathered B row
    ablk = 2 * bs * bs                 # double-buffered A block
    out = 2 * k_out * bs * bs          # VMEM-resident output row
    return (bbuf + ablk + out) * itemsize


def eligible(dtype, bs: int, k_out: int, ka: int, kb: int,
             vmem_limit: int = 12 * 1024 * 1024) -> bool:
    """Can the pallas path run this shape efficiently on a TPU core?"""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        return False
    if dtype.itemsize > 4:              # f64 is emulated on TPU
        return False
    if bs % 8 != 0:
        return False
    # the SMEM caps must be satisfiable at the minimum row chunk (8):
    # grid steps and scalar-prefetch bytes both scale with KA
    if 8 * ka > MAX_GRID_STEPS:
        return False
    if 8 * 4 * (ka + ka * kb) > SMEM_PREFETCH_BUDGET:
        return False
    return vmem_bytes(k_out, ka, kb, bs, dtype.itemsize) <= vmem_limit
