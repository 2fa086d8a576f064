"""Local (single-device, possibly rectangular) sparse matrix.

Counterpart of NTPoly's on-node CSR layer (reference
Source/Fortran/SMatrixModule.F90:15-31 + SMatrixAlgebraModule.F90) exposed
to users as Matrix_lsr/Matrix_lsc (reference Source/CPlusPlus/SMatrix.h).
Backed by the same block-ELL kernels as the distributed matrix — a local
matrix is simply a one-panel container with no mesh.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import EMPTY
from . import bell


def _round_up(x: int, m: int) -> int:
    return -(-max(x, 1) // m) * m


class LocalMatrix:
    """rows x cols block-ELL matrix on the default device."""

    def __init__(self, rows: int, cols: int, bs: int = 4, dtype=None):
        from ..config import default_real_dtype
        self.rows, self.cols, self.bs = rows, cols, bs
        self.dtype = dtype or default_real_dtype()
        self.nbr = _round_up(rows, bs) // bs
        self.nbc = _round_up(cols, bs) // bs
        self.col_ids = jnp.full((self.nbr, self.nbc), EMPTY, jnp.int32)
        self.blocks = jnp.zeros((self.nbr, self.nbc, bs, bs), self.dtype)

    # -- construction ----------------------------------------------------
    @classmethod
    def from_triplets(cls, rows_idx, cols_idx, vals, rows, cols, bs=4,
                      dtype=None):
        """Sparse construction: triplets -> block-ELL without ever
        materializing the dense matrix (duplicates are summed, as in the
        reference's sort-and-merge CSR build,
        SMatrixModule.F90 ConstructMatrixFromTripletList)."""
        ri = np.asarray(rows_idx, np.int64)
        ci = np.asarray(cols_idx, np.int64)
        vals = np.asarray(vals)
        out = cls(rows, cols, bs=bs, dtype=dtype or vals.dtype)
        bi, bj = ri // bs, ci // bs
        bid = bi * out.nbc + bj
        ub, inv = np.unique(bid, return_inverse=True)
        nub = len(ub)
        blocks = np.zeros((nub, bs, bs), out.dtype)
        np.add.at(blocks, (inv, ri % bs, ci % bs), vals.astype(out.dtype))
        ubi, ubj = ub // out.nbc, ub % out.nbc
        # ub is sorted, so each row's blocks are contiguous and ascending
        first = np.ones(nub, bool)
        first[1:] = ubi[1:] != ubi[:-1]
        start = np.maximum.accumulate(np.where(first, np.arange(nub), 0))
        slot = np.arange(nub) - start
        k = int(slot.max()) + 1 if nub else 1
        col_ids = np.full((out.nbr, k), EMPTY, np.int32)
        out_blocks = np.zeros((out.nbr, k, bs, bs), out.dtype)
        col_ids[ubi, slot] = ubj
        out_blocks[ubi, slot] = blocks
        out.col_ids = jnp.asarray(col_ids)
        out.blocks = jnp.asarray(out_blocks)
        return out

    @classmethod
    def from_dense(cls, dense, bs: int = 4):
        dense = np.asarray(dense)
        out = cls(dense.shape[0], dense.shape[1], bs=bs, dtype=dense.dtype)
        padded = np.zeros((out.nbr * bs, out.nbc * bs), dense.dtype)
        padded[:dense.shape[0], :dense.shape[1]] = dense
        out.col_ids, out.blocks = bell.from_dense(
            jnp.asarray(padded), bs=bs, k=out.nbc)
        return out

    def to_dense(self):
        d = bell.to_dense(self.col_ids, self.blocks, nbc=self.nbc)
        return np.asarray(d)[:self.rows, :self.cols]

    def to_triplets(self):
        d = self.to_dense()
        i, j = np.nonzero(d)
        return i, j, d[i, j]

    def _like(self, rows=None, cols=None, dtype=None):
        return LocalMatrix(rows or self.rows, cols or self.cols,
                           bs=self.bs, dtype=dtype or self.dtype)

    # -- algebra (all bell-kernel backed) --------------------------------
    def scale(self, c):
        self.blocks = self.blocks * jnp.asarray(c, self.dtype)

    def increment(self, other: "LocalMatrix", alpha=1.0, threshold=0.0):
        self.col_ids, self.blocks = bell.add(
            self.col_ids, self.blocks, other.col_ids, other.blocks,
            alpha=1.0, beta=alpha, threshold=threshold, k_out=self.nbc)

    def dot(self, other: "LocalMatrix"):
        """sum(conj(self) * other) (reference DotMatrix_lsc,
        SMatrixAlgebraModule.F90:196-215)."""
        return bell.dot(self.col_ids, self.blocks, other.col_ids,
                        other.blocks)

    def pairwise(self, a: "LocalMatrix", b: "LocalMatrix"):
        prod = bell.align_mul(a.col_ids, a.blocks, b.col_ids, b.blocks)
        self.col_ids, self.blocks = bell.compact(a.col_ids, prod, self.nbc)
        self.dtype = self.blocks.dtype

    def transpose(self, a: "LocalMatrix"):
        r, c, blks, v = bell.to_block_coo(a.col_ids, a.blocks)
        oc, ob = bell.from_block_coo(
            c, r, bell.transpose_blocks(blks), v, nbr=a.nbc, k=a.nbr)
        self.col_ids, self.blocks = oc[0], ob[0]
        self.rows, self.cols = a.cols, a.rows
        self.nbr, self.nbc = a.nbc, a.nbr
        self.dtype = a.dtype

    def conjugate(self):
        self.blocks = jnp.conj(self.blocks)

    def gemm(self, a: "LocalMatrix", b: "LocalMatrix", a_transposed=False,
             b_transposed=False, alpha=1.0, beta=0.0, threshold=0.0):
        """this = alpha * op(A) op(B) + beta * this (reference local
        MatrixMultiply, SMatrixAlgebraModule.F90:221-289)."""
        if a_transposed:
            at = a._like(a.cols, a.rows)
            at.transpose(a)
            a = at
        if b_transposed:
            bt = b._like(b.cols, b.rows)
            bt.transpose(b)
            b = bt
        cc, cb = bell.spgemm(
            a.col_ids, a.blocks, b.col_ids, b.blocks, col_offset=0,
            nbc_out=b.nbc, k_out=b.nbc, threshold=threshold, alpha=alpha,
            row_chunk=min(8, a.nbr))
        if beta != 0.0:
            cc, cb = bell.add(cc, cb, self.col_ids, self.blocks,
                              alpha=1.0, beta=beta, threshold=threshold,
                              k_out=b.nbc)
        self.col_ids, self.blocks = cc, cb
        self.rows, self.cols = a.rows, b.cols
        self.nbr, self.nbc = a.nbr, b.nbc
        self.dtype = cb.dtype

    def diagonal_scale(self, dvals):
        d = jnp.asarray(dvals)
        d = jnp.pad(d, (0, self.nbc * self.bs - d.shape[0]))
        self.blocks = bell.diagonal_scale(
            self.col_ids, self.blocks.astype(d.dtype),
            dvec_cols=d.reshape(self.nbc, self.bs))
        self.dtype = self.blocks.dtype

    def extract_row(self, row: int):
        d = self.to_dense()
        return LocalMatrix.from_dense(d[row:row + 1, :], bs=self.bs)

    def extract_column(self, col: int):
        d = self.to_dense()
        return LocalMatrix.from_dense(d[:, col:col + 1], bs=self.bs)
