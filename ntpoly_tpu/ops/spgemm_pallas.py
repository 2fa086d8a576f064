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
  * pruning + compaction ("PruneList") runs as a vectorized XLA epilogue:
    entries with |alpha*v| <= threshold are flushed, all-zero output
    blocks are dropped, survivors re-packed in ascending column order —
    parallel over all rows instead of a serial in-kernel loop.

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


def structural_fill(a_cols: Array, b_cols: Array) -> Array:
    """Exact per-row structural fill-in of C = A @ B from col ids alone.

    ucnt[r] = number of distinct output block-columns of row r (before any
    threshold pruning) — the capacity a lossless multiply needs.  This is
    the TPU answer to NTPoly's memory-pool growth
    (reference sparse_includes/GemmMatrix.f90:48-56).
    """
    R, KA = a_cols.shape
    valid_a = a_cols != EMPTY
    ks = jnp.where(valid_a, a_cols, 0)
    ids = jnp.where(valid_a[:, :, None], b_cols[ks], EMPTY)
    ids = ids.reshape(R, KA * b_cols.shape[-1])
    sids = jnp.sort(ids, axis=1)
    prev = jnp.concatenate(
        [jnp.full((R, 1), -1, sids.dtype), sids[:, :-1]], axis=1)
    first = (sids != prev) & (sids != EMPTY)
    return jnp.sum(first.astype(jnp.int32), axis=1)


def structure_plan(a_cols: Array, b_cols: Array, k_out: int
                   ) -> Tuple[Array, Array, Array]:
    """The structure pass: output pattern of C = A @ B from col ids alone.

    Returns
      slot   [R, KA*KB] int32 — output slot of each candidate product
                                 (>= k_out means dropped: overflow or EMPTY)
      occ    [R, k_out]  int32 — ascending unique output col ids (EMPTY pad)
      ucnt   [R]         int32 — exact structural fill-in per row
    """
    a_cols = a_cols.astype(jnp.int32)
    b_cols = b_cols.astype(jnp.int32)
    R, KA = a_cols.shape
    KB = b_cols.shape[-1]
    M = KA * KB
    valid_a = a_cols != EMPTY
    ks = jnp.where(valid_a, a_cols, 0)
    ids = jnp.where(valid_a[:, :, None], b_cols[ks], EMPTY)   # [R, KA, KB]
    ids = ids.reshape(R, M)
    order = jnp.argsort(ids, axis=1, stable=True)
    sids = jnp.take_along_axis(ids, order, axis=1)
    prev = jnp.concatenate(
        [jnp.full((R, 1), -1, sids.dtype), sids[:, :-1]], axis=1)
    first = (sids != prev) & (sids != EMPTY)
    grank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1   # [R, M]
    # scatter rank back to candidate order
    slot = jnp.zeros((R, M), jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(R)[:, None], (R, M))
    slot = slot.at[rows, order].set(grank)
    slot = jnp.where(ids != EMPTY, slot, M)                    # sentinel
    ucnt = jnp.sum(first.astype(jnp.int32), axis=1)
    occ = jnp.full((R, k_out), EMPTY, jnp.int32)
    gtgt = jnp.where(first & (grank < k_out), grank, k_out)
    occ = jnp.concatenate(
        [occ, jnp.zeros((R, 1), jnp.int32)], axis=1)           # spill col
    occ = occ.at[rows, gtgt].set(sids, mode='drop')[:, :k_out]
    return slot, occ, ucnt


def _kernel(acols_ref, plan_ref,                   # scalar prefetch
            ablk_ref, bpan_ref,                    # pipelined VMEM inputs
            oblk_ref,                              # pipelined VMEM output
            *, ka: int, kb: int, k_out: int):
    r = pl.program_id(0)
    s = pl.program_id(1)
    bs = ablk_ref.shape[-1]

    @pl.when(s == 0)
    def _():
        oblk_ref[...] = jnp.zeros_like(oblk_ref)

    @pl.when(acols_ref[r, s] != EMPTY)
    def _():
        # HIGHEST: full-f32 MXU passes — the bf16 default breaks the
        # library's 1e-6 convergence tolerances.
        part = jnp.dot(ablk_ref[0, 0], bpan_ref[0],
                       preferred_element_type=oblk_ref.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        for t in range(kb):
            g = plan_ref[r, s * kb + t]

            @pl.when(g < k_out)
            def _():
                oblk_ref[0, g] += part[:, t * bs:(t + 1) * bs]


# Per-row int32 metadata (a_cols, merge plan) lives in SMEM via scalar
# prefetch; chunk the row dimension so the SMEM footprint stays bounded for
# large matrices.
ROW_CHUNK = 1024


def _call_kernel(a_cols, plan, a_blocks, b_panel,
                 *, kb: int, nbk: int, k_out: int, interpret: bool):
    """Numeric pass as a fully pipelined pallas pipeline: grid (R, KA); the
    B block-row for step (r, s) is fetched by a *gather BlockSpec* whose
    index map reads the prefetched col ids (so Pallas double-buffers the
    gathered rows across grid steps — the role of the reference's
    comm/compute overlap task loop); the output row block stays VMEM
    -resident while its KA accumulation steps run.  Prune/compact runs
    vectorized in XLA afterwards (structure is known there anyway)."""
    R, KA = a_cols.shape
    bs = a_blocks.shape[-1]
    dt = a_blocks.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R, KA),
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda r, s, *_: (r, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bs, kb * bs),
                lambda r, s, acols, plan: (
                    jnp.minimum(acols[r, s], nbk - 1), 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k_out, bs, bs),
                               lambda r, s, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, ka=KA, kb=kb, k_out=k_out)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, k_out, bs, bs), dt),
        cost_estimate=pl.CostEstimate(
            flops=R * KA * 2 * bs * bs * kb * bs,
            bytes_accessed=(R * KA * bs * bs + R * KA * kb * bs * bs
                            + R * k_out * bs * bs) * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a_cols, plan, a_blocks, b_panel)


@functools.partial(
    jax.jit,
    static_argnames=("k_out", "interpret"))
def spgemm_pallas(a_cols: Array, a_blocks: Array, b_cols: Array,
                  b_blocks: Array, *, k_out: int,
                  threshold=0.0, alpha=1.0,
                  interpret: bool = False
                  ) -> Tuple[Array, Array, Array]:
    """C = alpha * A @ B, threshold-filtered, on one shard (Pallas TPU).

    Returns (col_ids [R, k_out], blocks [R, k_out, bs, bs],
    ucnt [R] — exact structural fill-in per row, so ``ucnt > k_out``
    flags capacity overflow).
    """
    R, KA = a_cols.shape
    NBK, KB = b_cols.shape
    bs = a_blocks.shape[-1]
    dt = jnp.result_type(a_blocks.dtype, b_blocks.dtype)
    assert not jnp.issubdtype(dt, jnp.complexfloating), \
        "pallas path is real-only; use bell for complex"

    plan, occp, ucnt = structure_plan(a_cols, b_cols, k_out)

    # B rows concatenated along columns: (NBK, bs, KB*bs) — one wide MXU
    # dot per A slot instead of KB tiny ones.
    b_panel = jnp.swapaxes(b_blocks.astype(dt), -3, -2).reshape(
        NBK, bs, KB * bs)

    ab = a_blocks.astype(dt)

    cbs = []
    for lo in range(0, R, ROW_CHUNK):
        hi = min(lo + ROW_CHUNK, R)
        cbs.append(_call_kernel(
            a_cols[lo:hi], plan[lo:hi], ab[lo:hi],
            b_panel, kb=KB, nbk=NBK, k_out=k_out, interpret=interpret))
    cb = cbs[0] if len(cbs) == 1 else jnp.concatenate(cbs, axis=0)

    # Epilogue (vectorized XLA over all rows): alpha scale, threshold
    # flush, zero-block drop + ascending re-pack — PruneList's role
    # (reference sparse_includes/PruneList.f90).
    from ..core import bell
    cc, cb = bell.compact(occp, cb * jnp.asarray(alpha, dt), k_out,
                          threshold)
    return cc, cb, ucnt


def vmem_bytes(k_out: int, ka: int, kb: int, bs: int,
               itemsize: int = 4) -> int:
    """Estimated VMEM footprint of one kernel invocation."""
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
    return vmem_bytes(k_out, ka, kb, bs, dtype.itemsize) <= vmem_limit
