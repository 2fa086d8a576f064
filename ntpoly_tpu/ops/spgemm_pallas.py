"""Pallas TPU kernel for the local block-sparse SpGEMM.

This is the hot loop of the whole library: C = alpha * A @ B with threshold
truncation, at block granularity, on one shard.  It is the TPU-native
re-design of NTPoly's Gustavson kernel with a pooled dense accumulator and
dirty flags (reference Source/Fortran/sparse_includes/MultiplyBlock.f90:8-36,
Source/Fortran/MatrixMemoryPoolModule.F90:13-56, PruneList.f90):

  * the dense accumulator lives in VMEM, one bs x bs tile per candidate
    output block-column (the "value_array");
  * dirty flags live in SMEM with a per-row epoch, so the accumulator is
    never bulk-zeroed ("dirty_array");
  * each (A slot, B slot) pair triggers one (bs, bs) x (bs, bs) MXU matmul
    against the gathered B panel row, double-buffered HBM->VMEM via async
    DMA (the analogue of the reference's comm/compute overlap task loop,
    distributed_algebra_includes/MatrixMultiply.f90:87-274);
  * pruning + compaction back to block-ELL happens in-kernel ("PruneList"):
    entries with |alpha*v| <= threshold are flushed, all-zero candidate
    blocks are skipped, survivors are emitted in ascending column order.

Differences from the XLA fallback (:mod:`ntpoly_tpu.core.bell.spgemm`): on
row overflow (more than ``k_out`` surviving blocks in a row) this kernel
keeps the first ``k_out`` by column id rather than the largest by norm.
Callers size ``k_out`` to the structural bound, so overflow only occurs when
truncation was requested anyway.

Grid/format contract matches ``bell.spgemm``:
  A: [R, KA] slots, col ids index block-rows of B (global ids, EMPTY=unused).
  B: [NBK, KB] slots, col ids are global block-cols.
  C: [R, k_out] block-ELL, global col ids restricted to the panel
     [col_offset, col_offset + nbc_out).
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


def _kernel(acols_ref, bcols_ref, ioff_ref, fpar_ref,       # scalar prefetch
            ablk_ref, bhbm_ref,                             # tensor inputs
            occ_ref, oblk_ref,                              # outputs
            acc_ref, bbuf_ref, dirty_ref, emit_ref, sem_ref,
            *, ka: int, kb: int, nbc: int, k_out: int, nbk: int):
    r = pl.program_id(0)
    bs = ablk_ref.shape[-1]
    coff = ioff_ref[0]
    thr = fpar_ref[0]
    alpha = fpar_ref[1]
    epoch = r + 1

    # One-time init of the dirty-epoch array (scratch is not zeroed).
    @pl.when(r == 0)
    def _():
        def zero(c, _):
            dirty_ref[c] = 0
            return 0
        jax.lax.fori_loop(0, nbc, zero, 0)

    def b_row(s):
        k = acols_ref[r, s]
        return jnp.clip(k, 0, nbk - 1)

    def get_dma(slot, s):
        return pltpu.make_async_copy(
            bhbm_ref.at[b_row(s)], bbuf_ref.at[slot], sem_ref.at[slot])

    # ---- accumulate: one MXU matmul per (A slot, B slot), double-buffered B
    # (per-slot (bs,bs)x(bs,bs) dots rather than one wide (bs, KB*bs) matmul:
    # Mosaic only slices the lane dim at 128-aligned offsets, and the FLOPs
    # are identical) ----
    get_dma(0, 0).start()
    for s in range(ka):
        slot = s % 2
        if s + 1 < ka:
            get_dma(1 - slot, s + 1).start()
        get_dma(slot, s).wait()
        k = acols_ref[r, s]

        @pl.when(k != EMPTY)
        def _():
            a_s = ablk_ref[0, s]                        # (bs, bs)
            ks = b_row(s)
            for t in range(kb):
                col = bcols_ref[ks, t]
                loc = col - coff
                pred = (col != EMPTY) & (loc >= 0) & (loc < nbc)
                locc = jnp.where(pred, loc, 0)
                # HIGHEST: full-f32 MXU passes — the bf16 default breaks
                # the library's 1e-6 convergence tolerances.
                part = jnp.dot(a_s, bbuf_ref[slot, t],
                               preferred_element_type=acc_ref.dtype,
                               precision=jax.lax.Precision.HIGHEST)
                fresh = dirty_ref[locc] != epoch

                @pl.when(pred & fresh)
                def _():
                    acc_ref[locc] = part
                    dirty_ref[locc] = epoch

                @pl.when(pred & jnp.logical_not(fresh))
                def _():
                    acc_ref[locc] += part

    # ---- prune + compact (emission in ascending column order) ----
    oblk_ref[...] = jnp.zeros_like(oblk_ref)
    emit_ref[0] = 0

    def emit(c, _):
        @pl.when(dirty_ref[c] == epoch)
        def _():
            blk = acc_ref[c] * alpha
            blk = jnp.where(jnp.abs(blk) > thr, blk, 0.0)
            slot = emit_ref[0]

            @pl.when(jnp.any(blk != 0.0) & (slot < k_out))
            def _():
                oblk_ref[0, slot] = blk
                emit_ref[0] = slot + 1
                emit_ref[1 + slot] = c + coff
        return 0

    jax.lax.fori_loop(0, nbc, emit, 0)

    # SMEM -> VMEM copy of the compacted column ids (static lane offsets;
    # occ_ref holds the whole [R, k_out] array — int32 rows are too narrow
    # for per-row VMEM tiling, and the array is tiny).
    n = emit_ref[0]
    for j in range(k_out):
        occ_ref[r, j] = jnp.where(j < n, emit_ref[1 + j], EMPTY)


@functools.partial(
    jax.jit,
    static_argnames=("nbc_out", "k_out", "interpret"))
def spgemm_pallas(a_cols: Array, a_blocks: Array, b_cols: Array,
                  b_blocks: Array, *, col_offset, nbc_out: int, k_out: int,
                  threshold=0.0, alpha=1.0,
                  interpret: bool = False) -> Tuple[Array, Array]:
    """C = alpha * A @ B, threshold-filtered, on one shard (Pallas TPU)."""
    R, KA = a_cols.shape
    NBK, KB = b_cols.shape
    bs = a_blocks.shape[-1]
    dt = jnp.result_type(a_blocks.dtype, b_blocks.dtype)
    assert not jnp.issubdtype(dt, jnp.complexfloating), \
        "pallas path is real-only; use bell.spgemm for complex"

    b_panel = b_blocks.astype(dt)                       # (NBK, KB, bs, bs)

    ioff = jnp.asarray([col_offset], jnp.int32)
    fpar = jnp.stack([jnp.asarray(threshold, dt), jnp.asarray(alpha, dt)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, KA, bs, bs), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k_out, bs, bs), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbc_out, bs, bs), dt),          # dense accumulator
            pltpu.VMEM((2, KB, bs, bs), dt),            # B double buffer
            pltpu.SMEM((nbc_out,), jnp.int32),          # dirty epochs
            pltpu.SMEM((1 + k_out,), jnp.int32),        # emit count + cols
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, ka=KA, kb=KB, nbc=nbc_out, k_out=k_out, nbk=NBK)
    flops_per = 2 * bs * bs * KB * bs
    cc, cb = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, k_out), jnp.int32),
            jax.ShapeDtypeStruct((R, k_out, bs, bs), dt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=R * KA * flops_per,
            bytes_accessed=(R * KA * bs * bs + R * KA * KB * bs * bs
                            + R * k_out * bs * bs) * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a_cols, b_cols, ioff, fpar, a_blocks.astype(dt), b_panel)
    return cc, cb


def vmem_bytes(nbc_out: int, k_out: int, ka: int, kb: int, bs: int,
               itemsize: int = 4) -> int:
    """Estimated VMEM footprint of one kernel invocation."""
    acc = nbc_out * bs * bs
    bbuf = 2 * bs * kb * bs
    ablk = 2 * ka * bs * bs           # double-buffered input block
    out = 2 * k_out * bs * bs
    return (acc + bbuf + ablk + out) * itemsize


def eligible(dtype, bs: int, nbc_out: int, k_out: int, ka: int, kb: int,
             vmem_limit: int = 12 * 1024 * 1024) -> bool:
    """Can the pallas path run this shape efficiently on a TPU core?"""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    if bs % 8 != 0:
        return False
    return vmem_bytes(nbc_out, k_out, ka, kb, bs) <= vmem_limit
