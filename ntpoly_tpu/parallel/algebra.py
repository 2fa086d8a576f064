"""Distributed algebra on PSMatrix.

TPU-native counterpart of NTPoly's distributed algebra layer
(reference Source/Fortran/PSMatrixAlgebraModule.F90 +
distributed_algebra_includes/).  The 3D SUMMA SpGEMM maps the reference's
MPI pipeline (reference distributed_algebra_includes/MatrixMultiply.f90) onto
mesh collectives under ``jax.shard_map``:

    IAllGather of A block-rows on row_comm    -> all_gather along 'cols'
    IAllGather of B block-cols on column_comm -> all_gather along 'rows'
    slice split-k + ReduceAndSumMatrix        -> slot masking (col % S == s),
                                                 all_gather along 'slices'
                                                 + k-way threshold merge
    OpenMP task/poll state machine            -> XLA async scheduling

The reference's working-threshold rule is preserved: with S slices the local
multiplies prune at threshold/(S*1000) and the full threshold is applied only
on the final slice sum (reference MatrixMultiply.f90:23-29,
comm_includes/ReduceAndSumMatrixCleanup.f90:26-31).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..config import EMPTY
from ..core import bell
from .pmatrix import PSMatrix, empty, identity
from .grid import ProcessGrid

__all__ = [
    "matmul", "increment", "scale", "trace", "dot", "norm", "grand_sum",
    "pairwise_multiply", "filter_small", "transpose", "conjugate",
    "diagonal_scale", "measure_asymmetry", "symmetrize",
    "similarity_transform", "column_sums", "gershgorin_bounds", "spmv",
    "matrix_sigma", "load_balance",
]


# ----------------------------------------------------------------------------
# SpGEMM
# ----------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("grid", "pnb", "k_out", "s_slices", "row_chunk",
                     "method"))
def _summa(a_cols, a_blocks, b_cols, b_blocks, alpha, working_thresh,
           final_thresh, *, grid: ProcessGrid, pnb: int, k_out: int,
           s_slices: int, row_chunk: int, method: str = "acc"):
    bs = a_blocks.shape[-1]
    pc = grid.cols

    def local_fn(ac, ab, bc, bb):
        nbr_loc = ac.shape[1]
        ka, kb = ac.shape[-1], bc.shape[-1]
        # Row panel of A: gather my block-rows' column panels over 'cols'.
        agc = lax.all_gather(ac[0], "cols", axis=0)       # [Pc, nbr, KA]
        agb = lax.all_gather(ab[0], "cols", axis=0)
        agc = jnp.moveaxis(agc, 0, 1).reshape(nbr_loc, pc * ka)
        agb = jnp.moveaxis(agb, 0, 1).reshape(nbr_loc, pc * ka, bs, bs)
        # Column panel of B: gather all block-rows of my panel over 'rows'.
        bgc = lax.all_gather(bc[0], "rows", axis=0, tiled=True)  # [NB, KB]
        bgb = lax.all_gather(bb[0], "rows", axis=0, tiled=True)
        if s_slices > 1:
            s = lax.axis_index("slices")
            keep = (agc != EMPTY) & (agc % s_slices == s)
            agc = jnp.where(keep, agc, EMPTY)
            agb = agb * keep[..., None, None].astype(agb.dtype)
        c0 = lax.axis_index("cols") * pnb
        if method == "cand":
            cc, cb = bell.spgemm_candidates(
                agc, agb, bgc, bgb, col_offset=c0, k_out=k_out,
                threshold=working_thresh, alpha=alpha, row_chunk=row_chunk)
        else:
            cc, cb = bell.spgemm(
                agc, agb, bgc, bgb, col_offset=c0, nbc_out=pnb, k_out=k_out,
                threshold=working_thresh, alpha=alpha, row_chunk=row_chunk)
        if s_slices > 1:
            gc = lax.all_gather(cc, "slices", axis=0)     # [S, nbr, k]
            gb = lax.all_gather(cb, "slices", axis=0)
            gc = jnp.moveaxis(gc, 0, 1).reshape(nbr_loc, s_slices * k_out)
            gb = jnp.moveaxis(gb, 0, 1).reshape(
                nbr_loc, s_slices * k_out, bs, bs)
            cc, cb = bell.merge(gc, gb, k_out, final_thresh)
        return cc[None], cb[None]

    spec_c = P("cols", "rows", None)
    spec_b = P("cols", "rows", None, None, None)
    return jax.shard_map(
        local_fn, mesh=grid.mesh,
        in_specs=(spec_c, spec_b, spec_c, spec_b),
        out_specs=(spec_c, spec_b), check_vma=False,
    )(a_cols, a_blocks, b_cols, b_blocks)


def matmul(a: PSMatrix, b: PSMatrix, alpha=1.0, beta=0.0,
           c: PSMatrix | None = None, threshold=0.0,
           k_out: int | None = None, row_chunk: int | None = None,
           method: str = "auto") -> PSMatrix:
    """C = alpha*A@B + beta*C, threshold-filtered 3D SUMMA.

    (reference PSMatrixAlgebraModule.F90:106-269.)

    method: 'acc' = dense-accumulator Gustavson (best when operands are
    dense-ish), 'cand' = explicit partial products + k-way merge (best in
    the sparse regime, where KA*KB per row is small), 'auto' picks by the
    candidate count — the analogue of the reference's density heuristic
    (sparse_includes/GemmMatrix.f90:58-61).
    """
    assert a.grid == b.grid and a.nb == b.nb and a.bs == b.bs
    s = a.grid.slices
    k_out = min(k_out or max(a.k, b.k), a.panel_nb)
    row_chunk = row_chunk or max(1, min(8, a.nb // a.grid.rows))
    wt = threshold / (s * 1000.0) if s > 1 else threshold
    dt = jnp.result_type(a.dtype, b.dtype)
    if method == "auto":
        n_cand = a.grid.cols * a.k * b.k
        method = "cand" if n_cand <= max(64, 8 * k_out) else "acc"
    cc, cb = _summa(
        a.col_ids, a.blocks.astype(dt), b.col_ids, b.blocks.astype(dt),
        jnp.asarray(alpha, dt), wt, threshold,
        grid=a.grid, pnb=a.panel_nb, k_out=k_out, s_slices=s,
        row_chunk=row_chunk, method=method)
    out = PSMatrix(cc, cb, a.dim, a.bs, a.grid)
    if c is not None:
        out = increment(c, out, alpha=beta, beta=1.0, threshold=threshold)
    return out


# ----------------------------------------------------------------------------
# cheap (slot-wise / reduction) ops — rely on XLA sharding propagation
# ----------------------------------------------------------------------------

@jax.jit
def increment(a: PSMatrix, b: PSMatrix, alpha=1.0, beta=1.0, threshold=0.0,
              k_out: int | None = None) -> PSMatrix:
    """alpha*A + beta*B (AXPY; reference IncrementMatrix)."""
    k_out = min(k_out or max(a.k, b.k), a.panel_nb)
    cc, cb = bell.add(a.col_ids, a.blocks, b.col_ids, b.blocks,
                      alpha=alpha, beta=beta, threshold=threshold,
                      k_out=k_out)
    return PSMatrix(cc, cb, a.dim, a.bs, a.grid).astype(
        jnp.result_type(a.dtype, b.dtype))


@jax.jit
def scale(a: PSMatrix, c) -> PSMatrix:
    return a.with_data(a.col_ids, a.blocks * jnp.asarray(c, a.dtype))


@jax.jit
def trace(a: PSMatrix):
    """MatrixTrace (reference distributed_algebra_includes/MatrixTrace.f90)."""
    return bell.trace(a.col_ids, a.blocks)


@jax.jit
def dot(a: PSMatrix, b: PSMatrix):
    """DotMatrix = sum_ij conj(A_ij) B_ij (reference DotMatrix.f90)."""
    return bell.dot(a.col_ids, a.blocks, b.col_ids, b.blocks)


@jax.jit
def grand_sum(a: PSMatrix):
    return bell.grand_sum(a.blocks)


@jax.jit
def pairwise_multiply(a: PSMatrix, b: PSMatrix) -> PSMatrix:
    """Hadamard product (reference PairwiseMultiplyMatrix)."""
    prod = bell.align_mul(a.col_ids, a.blocks, b.col_ids, b.blocks)
    cc, cb = bell.compact(a.col_ids, prod, min(max(a.k, 1), a.panel_nb))
    return PSMatrix(cc, cb, a.dim, a.bs, a.grid)


@jax.jit
def filter_small(a: PSMatrix, threshold) -> PSMatrix:
    """FilterMatrix (reference PSMatrixModule.F90:1318-1359)."""
    cc, cb = bell.filter_small(a.col_ids, a.blocks, threshold)
    return a.with_data(cc, cb)


def conjugate(a: PSMatrix) -> PSMatrix:
    return a.conjugate()


@functools.partial(jax.jit, static_argnames=("k_out",))
def transpose(a: PSMatrix, k_out: int | None = None) -> PSMatrix:
    """TransposeMatrix (reference distributed_includes/TransposeMatrix.f90):
    block-COO flip + rebuild (XLA emits the all-to-all redistribution)."""
    pc, nb, k = a.col_ids.shape
    bs = a.bs
    rows = jnp.broadcast_to(
        jnp.arange(nb, dtype=jnp.int32)[None, :, None], (pc, nb, k))
    cols = a.col_ids.reshape(-1)
    rows = rows.reshape(-1)
    blocks = bell.transpose_blocks(a.blocks).reshape(-1, bs, bs)
    valid = cols != EMPTY
    oc, ob = bell.from_block_coo(
        jnp.where(valid, cols, nb), rows, blocks, valid,
        nbr=nb, k=min(k_out or a.k, a.panel_nb), panels=pc,
        panel_nbc=a.panel_nb)
    sh = a.grid.matrix_sharding
    return a.with_data(jax.lax.with_sharding_constraint(oc, sh),
                       jax.lax.with_sharding_constraint(ob, sh))


@functools.partial(jax.jit, static_argnames=("side",))
def diagonal_scale(a: PSMatrix, dvals, side: str = "right") -> PSMatrix:
    """Scale columns ('right': A diag(d)) or rows ('left': diag(d) A)
    (reference MatrixDiagonalScale, PSMatrixAlgebraModule.F90)."""
    d = jnp.asarray(dvals, a.dtype)
    d = jnp.pad(d, (0, a.logical_dim - d.shape[0]))
    if side == "right":
        b = bell.diagonal_scale(a.col_ids, a.blocks,
                                dvec_cols=d.reshape(a.nb, a.bs))
    else:
        b = bell.diagonal_scale(a.col_ids, a.blocks,
                                dvec_rows=d.reshape(a.nb, a.bs))
    return a.with_data(a.col_ids, b)


@jax.jit
def column_sums(a: PSMatrix) -> jax.Array:
    """Per-column sums of |v| -> [logical_dim] (column 1-norms)."""
    off = jnp.asarray(a.panel_offsets(), jnp.int32)[:, None, None]
    valid = a.col_ids != EMPTY
    loc = jnp.where(valid, a.col_ids - off, EMPTY)
    cs = bell.col_abs_sums(loc, a.blocks, a.panel_nb)   # [Pc, pnb, bs]
    return cs.reshape(a.logical_dim)


@jax.jit
def norm(a: PSMatrix):
    """MatrixNorm: max column 1-norm (reference MatrixNorm.f90)."""
    return jnp.max(column_sums(a))


def measure_asymmetry(a: PSMatrix):
    """norm(A - A^T) (reference PSMatrixAlgebraModule.F90:569-583)."""
    return norm(increment(transpose(a), a, alpha=-1.0, beta=1.0))


def symmetrize(a: PSMatrix) -> PSMatrix:
    """A <- (A + A^T)/2 (reference PSMatrixAlgebraModule.F90:584-598)."""
    return increment(scale(a, 0.5), transpose(scale(a, 0.5)))


def similarity_transform(a: PSMatrix, p: PSMatrix, pinv: PSMatrix,
                         threshold=0.0, k_out=None) -> PSMatrix:
    """P @ A @ Pinv (reference SimilarityTransform,
    PSMatrixAlgebraModule.F90:603-654)."""
    tmp = matmul(a, pinv, threshold=threshold, k_out=k_out)
    return matmul(p, tmp, threshold=threshold, k_out=k_out)


@jax.jit
def diagonal_values(a: PSMatrix) -> jax.Array:
    """The matrix diagonal -> [logical_dim]."""
    dblocks = bell.trace_blocks(a.col_ids, a.blocks)       # [Pc, NB, bs, bs]
    dblocks = jnp.sum(dblocks, axis=0)                     # [NB, bs, bs]
    return jnp.diagonal(dblocks, axis1=-2, axis2=-1).reshape(-1)


@jax.jit
def gershgorin_bounds(a: PSMatrix):
    """Spectral bounds: min/max over columns of center +/- radius
    (reference EigenBoundsModule.F90:29-59).  Padded columns contribute a
    [0, 0] interval, matching the reference's per-logical-column loop —
    and load-balanced matrices may hold data in the padded region."""
    cs = column_sums(a)
    d = diagonal_values(a)
    dr = d.real if jnp.iscomplexobj(d) else d
    radius = cs - jnp.abs(d)
    return jnp.min(dr - radius), jnp.max(dr + radius)


@jax.jit
def spmv(a: PSMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for a replicated dense vector x[logical_dim]."""
    xb = x.reshape(a.nb, a.bs)
    valid = a.col_ids != EMPTY
    loc = jnp.where(valid, a.col_ids, 0)
    xg = xb[loc] * valid[..., None].astype(x.dtype)        # [Pc, NB, K, bs]
    y = jnp.einsum('prkij,prkj->ri', a.blocks, xg.astype(a.dtype),
                   precision=lax.Precision.HIGHEST)
    return y.reshape(-1)


@jax.jit
def matrix_sigma(a: PSMatrix):
    """Ozaki sigma for Hotelling init: 1 / (max column sum)^2-ish scaling
    (reference MatrixSigma, PSMatrixAlgebraModule.F90:80-104)."""
    cs = column_sums(a)
    return 1.0 / jnp.max(cs) ** 2


def load_balance(a: PSMatrix, perm: PSMatrix, perm_t: PSMatrix,
                 threshold=0.0) -> PSMatrix:
    """PermuteMatrix: P A P^T by two SpGEMMs (reference
    LoadBalancerModule.F90:16-92)."""
    return matmul(perm, matmul(a, perm_t, threshold=threshold),
                  threshold=threshold)
