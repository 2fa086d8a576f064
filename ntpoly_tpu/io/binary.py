"""Binary checkpoint format
(reference PSMatrixModule.F90:572-789 — "Faster than text, so this is good
for check pointing").

Layout mirrors the reference: a fixed header {magic, complex flag, rows,
cols, total nnz} followed by packed triplet records.  Written with numpy
structured arrays; memory-mapped reads make reload O(nnz) with no parsing.
"""
from __future__ import annotations

import numpy as np

from ..parallel import pmatrix as PM
from ..utils.errors import IOFormatError

MAGIC = 0x4E545058        # "NTPX"

_HEADER_DTYPE = np.dtype([
    ("magic", "<u4"), ("is_complex", "<u4"),
    ("rows", "<i8"), ("cols", "<i8"), ("nnz", "<i8")])


def _triplet_dtype(is_complex: bool):
    vt = "<c16" if is_complex else "<f8"
    return np.dtype([("row", "<i4"), ("col", "<i4"), ("val", vt)])


def write(mat: PM.PSMatrix, file_name: str):
    """Write the checkpoint.  Multi-process: COLLECTIVE — every process
    pwrites its own shards' fixed-size records at an exclusive byte
    offset computed from an allgather of the per-rank counts (the
    reference's MPI-IO collective write,
    distributed_includes/WriteMatrixToBinary.f90); rank 0 writes the
    header.  Requires a shared filesystem, like the reference."""
    from ..parallel import dist
    if not dist.is_multiprocess():
        r, c, v = PM.to_triplets(mat)
        write_triplets(file_name, r, c, v, mat.dim)
        return
    from jax.experimental import multihost_utils as mhu
    r, c, v = PM.to_triplets(mat, local=True)     # O(nnz/P) per process
    is_complex = bool(np.iscomplexobj(mat.blocks))
    counts = np.asarray(mhu.process_allgather(
        np.asarray([len(v)], np.int64))).reshape(-1)
    me = dist.process_index()
    offset = int(counts[:me].sum())
    total = int(counts.sum())
    dt = _triplet_dtype(is_complex)
    if me == 0:
        header = np.zeros(1, _HEADER_DTYPE)
        header["magic"], header["is_complex"] = MAGIC, is_complex
        header["rows"] = header["cols"] = mat.dim
        header["nnz"] = total
        with open(file_name, "wb") as f:
            header.tofile(f)
            # pre-size so concurrent pwrites land inside the file
            f.truncate(_HEADER_DTYPE.itemsize + total * dt.itemsize)
    # rank 0 must create the file before others write into it
    mhu.sync_global_devices("binary_write_header")
    recs = np.empty(len(v), dt)
    recs["row"], recs["col"], recs["val"] = r, c, v
    with open(file_name, "r+b") as f:
        f.seek(_HEADER_DTYPE.itemsize + offset * dt.itemsize)
        f.write(recs.tobytes())
    mhu.sync_global_devices("binary_write_done")


def write_triplets(file_name: str, r, c, v, dim: int):
    is_complex = bool(np.iscomplexobj(v))
    header = np.zeros(1, _HEADER_DTYPE)
    header["magic"], header["is_complex"] = MAGIC, is_complex
    header["rows"] = header["cols"] = dim
    header["nnz"] = len(v)
    recs = np.empty(len(v), _triplet_dtype(is_complex))
    recs["row"], recs["col"], recs["val"] = r, c, v
    with open(file_name, "wb") as f:
        header.tofile(f)
        recs.tofile(f)


def _read_header(f, file_name):
    hdr = np.fromfile(f, _HEADER_DTYPE, count=1)
    if len(hdr) == 0 or hdr[0]["magic"] != MAGIC:
        raise IOFormatError(f"{file_name}: not an ntpoly_tpu binary file")
    return hdr[0]


def read_triplets(file_name: str):
    with open(file_name, "rb") as f:
        header = _read_header(f, file_name)
        recs = np.fromfile(f, _triplet_dtype(bool(header["is_complex"])),
                           count=int(header["nnz"]))
    return (recs["row"].astype(np.int64), recs["col"].astype(np.int64),
            recs["val"], int(header["rows"]))


def read_triplets_range(file_name: str, rank: int, n_ranks: int):
    """This rank's slice of the packed triplet records — fixed-size records
    make byte ranges exact (the analogue of the reference's collective
    binary read with the custom MPI triplet type,
    PSMatrixModule.F90:574-693)."""
    with open(file_name, "rb") as f:
        header = _read_header(f, file_name)
        dt = _triplet_dtype(bool(header["is_complex"]))
        nnz = int(header["nnz"])
        lo = (nnz * rank) // n_ranks
        hi = (nnz * (rank + 1)) // n_ranks
        f.seek(_HEADER_DTYPE.itemsize + lo * dt.itemsize)
        recs = np.fromfile(f, dt, count=hi - lo)
    return (recs["row"].astype(np.int64), recs["col"].astype(np.int64),
            recs["val"], int(header["rows"]))


def read(file_name: str, *, bs: int, grid=None, k: int | None = None,
         dtype=None) -> PM.PSMatrix:
    from ..parallel import dist
    if dist.is_multiprocess():
        i, j, v, dim = read_triplets_range(
            file_name, dist.process_index(), dist.process_count())
        mode = "distributed"
    else:
        i, j, v, dim = read_triplets(file_name)
        mode = "replicated"
    if dtype is None:
        from ..config import default_complex_dtype, default_real_dtype
        dtype = default_complex_dtype() if np.iscomplexobj(v) \
            else default_real_dtype()
    m = PM.empty(dim, bs=bs, k=k, dtype=dtype, grid=grid)
    return PM.fill_from_triplets(m, i, j, v, mode=mode)
