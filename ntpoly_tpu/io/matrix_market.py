"""Matrix Market IO (reference Source/Fortran/MatrixMarketModule.F90 +
PSMatrixModule.F90:351-570).

The reference does MPI-IO with per-rank byte ranges; under single-controller
JAX the host parses the file and shards the result onto the mesh via
fill_from_triplets.  The hot parse/format loops run in the native C++
library (:mod:`ntpoly_tpu.native`, multithreaded byte ranges — the direct
analogue of the reference's per-rank ranges) with a numpy fallback.
Symmetric / hermitian / skew-symmetric headers are expanded exactly as the
reference's SymmetrizeTripletList does (TripletListModule.F90:509-590).
"""
from __future__ import annotations

import numpy as np

from .. import native
from ..parallel import pmatrix as PM
from ..utils.errors import IOFormatError


def read_header(file_name: str):
    with open(file_name, "rb") as f:
        header = f.readline().decode()
    parts = header.strip().split()
    if len(parts) != 5 or parts[0] != "%%MatrixMarket":
        raise IOFormatError(f"bad MatrixMarket header: {header!r}")
    _, obj, fmt, field, symmetry = (p.lower() for p in parts)
    return obj, fmt, field, symmetry


def read_triplets(file_name: str):
    """Parse an MM coordinate file -> (rows, cols, vals, dim) 0-based,
    symmetry-expanded."""
    obj, fmt, field, symmetry = read_header(file_name)
    if fmt != "coordinate":
        raise IOFormatError("only coordinate MatrixMarket files are supported")
    with open(file_name, "rb") as f:
        f.readline()                              # header line
        raw = f.read()
    if native.available():
        code = {"pattern": native.FIELD_PATTERN,
                "complex": native.FIELD_COMPLEX}.get(field, native.FIELD_REAL)
        n_rows, n_cols, i, j, v = native.mm_parse_body(raw, code)
    else:
        lines = [s for s in (ln.strip() for ln in raw.splitlines())
                 if s and not s.startswith(b"%")]
        dims = lines[0].split()
        n_rows, n_cols = int(dims[0]), int(dims[1])
        body = b"\n".join(lines[1:])
        if field == "pattern":
            arr = np.array(body.split(), dtype=np.float64).reshape(-1, 2)
            i, j = (arr[:, 0].astype(np.int64) - 1,
                    arr[:, 1].astype(np.int64) - 1)
            v = np.ones(len(i))
        elif field == "complex":
            arr = np.array(body.split(), dtype=np.float64).reshape(-1, 4)
            i, j = (arr[:, 0].astype(np.int64) - 1,
                    arr[:, 1].astype(np.int64) - 1)
            v = arr[:, 2] + 1j * arr[:, 3]
        else:
            arr = np.array(body.split(), dtype=np.float64).reshape(-1, 3)
            i, j = (arr[:, 0].astype(np.int64) - 1,
                    arr[:, 1].astype(np.int64) - 1)
            v = arr[:, 2]
    if symmetry in ("symmetric", "hermitian", "skew-symmetric"):
        off = i != j
        io_, jo, vo = i[off], j[off], v[off]
        if symmetry == "hermitian":
            vo = np.conj(vo)
        elif symmetry == "skew-symmetric":
            vo = -vo
        i = np.concatenate([i, jo])
        j = np.concatenate([j, io_])
        v = np.concatenate([v, vo])
    return i, j, v, max(n_rows, n_cols)


def read_triplets_shape(file_name: str):
    """Like :func:`read_triplets` but returns the (rows, cols) shape —
    local matrices may be rectangular."""
    i, j, v, _ = read_triplets(file_name)
    with open(file_name, "rb") as f:
        for line in f:
            s = line.strip()
            if s and not s.startswith(b"%"):
                parts = s.split()
                return i, j, v, (int(parts[0]), int(parts[1]))
    raise IOFormatError(f"{file_name}: no size line")


def _body_offset_and_size(file_name: str):
    """Byte offset of the first data line, the (rows, cols) size, and the
    symmetry/field codes."""
    obj, fmt, field, symmetry = read_header(file_name)
    if fmt != "coordinate":
        raise IOFormatError("only coordinate MatrixMarket files are supported")
    with open(file_name, "rb") as f:
        f.readline()                              # header
        while True:
            line = f.readline()
            if not line:
                raise IOFormatError(f"{file_name}: no size line")
            s = line.strip()
            if s and not s.startswith(b"%"):
                parts = s.split()
                return (f.tell(), int(parts[0]), int(parts[1]),
                        field, symmetry)


def read_triplets_range(file_name: str, rank: int, n_ranks: int):
    """Parse only this rank's byte range of the MM body — the analogue of
    the reference's MPI-IO read with line-boundary fix-up
    (reference PSMatrixModule.F90:453-493).  Each line is parsed by
    exactly one rank; symmetry expansion is applied locally."""
    import os
    body, n_rows, n_cols, field, symmetry = _body_offset_and_size(file_name)
    total = os.path.getsize(file_name)
    span = total - body
    start = body + (span * rank) // n_ranks
    end = body + (span * (rank + 1)) // n_ranks
    with open(file_name, "rb") as f:
        if start > body:
            # line-boundary fix-up: skip the partial line at the start
            # (owned by the previous rank, which reads past its end)
            f.seek(start - 1)
            f.readline()
            start = f.tell()
        f.seek(start)
        raw = f.read(end - start)
        if end < total and raw and not raw.endswith(b"\n"):
            raw += f.readline()
    lines = [s for s in (ln.strip() for ln in raw.splitlines())
             if s and not s.startswith(b"%")]
    body_bytes = b"\n".join(lines)
    if not body_bytes:
        i = j = np.zeros(0, np.int64)
        v = np.zeros(0)
    elif native.available():
        code = {"pattern": native.FIELD_PATTERN,
                "complex": native.FIELD_COMPLEX}.get(field,
                                                     native.FIELD_REAL)
        i, j, v = native.mm_parse_range(body_bytes, code)
    elif field == "pattern":
        arr = np.array(body_bytes.split(), np.float64).reshape(-1, 2)
        i, j = (arr[:, 0].astype(np.int64) - 1,
                arr[:, 1].astype(np.int64) - 1)
        v = np.ones(len(i))
    elif field == "complex":
        arr = np.array(body_bytes.split(), np.float64).reshape(-1, 4)
        i, j = (arr[:, 0].astype(np.int64) - 1,
                arr[:, 1].astype(np.int64) - 1)
        v = arr[:, 2] + 1j * arr[:, 3]
    else:
        arr = np.array(body_bytes.split(), np.float64).reshape(-1, 3)
        i, j = (arr[:, 0].astype(np.int64) - 1,
                arr[:, 1].astype(np.int64) - 1)
        v = arr[:, 2]
    if symmetry in ("symmetric", "hermitian", "skew-symmetric"):
        off = i != j
        io_, jo, vo = i[off], j[off], v[off]
        if symmetry == "hermitian":
            vo = np.conj(vo)
        elif symmetry == "skew-symmetric":
            vo = -vo
        i = np.concatenate([i, jo])
        j = np.concatenate([j, io_])
        v = np.concatenate([v, vo])
    return i, j, v, max(n_rows, n_cols)


def read(file_name: str, *, bs: int, grid=None, k: int | None = None,
         dtype=None) -> PM.PSMatrix:
    """Multi-process runs read disjoint byte ranges per host and exchange
    (reference parallel MM read, PSMatrixModule.F90:351-570); single
    process parses the whole file (multithreaded in native C++)."""
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


def _format_body(r, c, v) -> bytes:
    """Format triplet lines (1-based, %.16g) — the per-rank local leg of
    the collective write."""
    if native.available():
        return native.mm_format(r, c, v)
    out = []
    if np.iscomplexobj(v):
        for i, j, val in zip(r + 1, c + 1, v):
            out.append(f"{i} {j} {val.real:.16g} {val.imag:.16g}\n")
    else:
        for i, j, val in zip(r + 1, c + 1, v):
            out.append(f"{i} {j} {val:.16g}\n")
    return "".join(out).encode()


def write(mat: PM.PSMatrix, file_name: str):
    """Write coordinate-general MM (reference WriteMatrixToMatrixMarket).

    Multi-process: COLLECTIVE, exactly the reference's pattern
    (reference distributed_includes/WriteToMatrixMarket.f90:1-60) — each
    rank formats its OWNED triplets locally (variable-width lines are no
    obstacle: once formatted, the byte counts are known), the counts are
    allgathered, exclusive-scanned into byte offsets, and every rank
    pwrites its range; rank 0 writes the header.  No host ever holds
    O(global nnz).  Requires a shared filesystem, like the reference."""
    from ..parallel import dist
    if not dist.is_multiprocess():
        r, c, v = PM.to_triplets(mat)
        write_triplets(file_name, r, c, v, mat.dim)
        return
    from jax.experimental import multihost_utils as mhu
    r, c, v = PM.to_triplets(mat, local=True)      # O(nnz/P) per process
    # complexness must agree across ranks even when this rank owns zero
    # triplets (empty concatenation defaults to float64)
    is_complex = np.issubdtype(np.dtype(mat.dtype), np.complexfloating)
    if is_complex and not np.iscomplexobj(v):
        v = v.astype(np.complex128)
    body = _format_body(r, c, v)
    stats = np.asarray(mhu.process_allgather(
        np.asarray([len(v), len(body)], np.int64)))        # [P, 2]
    total_nnz = int(stats[:, 0].sum())
    me = dist.process_index()
    field = "complex" if is_complex else "real"
    header = (f"%%MatrixMarket matrix coordinate {field} general\n"
              f"{mat.dim} {mat.dim} {total_nnz}\n").encode()
    offset = len(header) + int(stats[:me, 1].sum())
    if me == 0:
        with open(file_name, "wb") as f:
            f.write(header)
            # pre-size so concurrent pwrites land inside the file
            f.truncate(len(header) + int(stats[:, 1].sum()))
    mhu.sync_global_devices("mm_write_header")
    with open(file_name, "r+b") as f:
        f.seek(offset)
        f.write(body)
    mhu.sync_global_devices("mm_write_done")


def write_triplets(file_name: str, r, c, v, dim: int):
    field = "complex" if np.iscomplexobj(v) else "real"
    with open(file_name, "wb") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} general\n"
                .encode())
        f.write(f"{dim} {dim} {len(v)}\n".encode())
        f.write(_format_body(r, c, v))
