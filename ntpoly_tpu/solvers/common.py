"""Shared skeleton of every iterative solver.

The reference repeats this pattern in all ~25 solver modules (see e.g.
reference Source/Fortran/DensityMatrixSolversModule.F90:285-481): resolve
params -> construct monitor -> verbose YAML header with citations ->
similarity-transform into the orthogonal basis -> optional load-balance
permutation -> iterate with monitor -> undo permutation -> transform back.
Here it is factored once.
"""
from __future__ import annotations

from ..parallel import algebra as alg
from ..parallel import pmatrix as PM
from ..utils.logging import logger, sub_log
from ..utils.permutation import permute_matrix, undo_permute_matrix
from .parameters import SolverParameters, Monitor


def resolve(params: SolverParameters | None
            ) -> tuple[SolverParameters, Monitor]:
    params = params.copy() if params is not None else SolverParameters()
    return params, params.monitor()


class solver_log:
    """Verbose YAML block: header, method, citations, parameters."""

    def __init__(self, params, header: str, method: str | None = None,
                 citations: tuple[str, ...] = (), extra: dict | None = None):
        self.params, self.header = params, header
        self.method, self.citations = method, citations
        self.extra = extra or {}
        self._policy = None

    def __enter__(self):
        if self.params.be_verbose:
            logger.write_header(self.header)
            logger.enter_sub_log()
            if self.method:
                logger.write_element("Method", self.method)
            for key, val in self.extra.items():
                logger.write_element(key, val)
            if self.citations:
                with sub_log("Citations"):
                    for c in self.citations:
                        logger.write_list_element(c)
            self.params.print()
        # Pin the block capacity for the whole solve when the user set
        # params.k_out: iteration shapes stay static, so XLA compiles each
        # op once instead of once per fill-in level.
        if self.params.k_out or self.params.row_chunk:
            self._policy = alg.capacity_policy(
                k_out=self.params.k_out, row_chunk=self.params.row_chunk,
                on_overflow="truncate" if self.params.k_out else None)
            self._policy.__enter__()
        return self

    def __exit__(self, *exc):
        if self._policy is not None:
            self._policy.__exit__(*exc)
            self._policy = None
        if self.params.be_verbose:
            logger.exit_sub_log()
        return False


class iteration_log:
    def __init__(self, params):
        self.params = params

    def __enter__(self):
        if self.params.be_verbose:
            logger.write_header("Iterations")
            logger.enter_sub_log()
        return self

    def step(self, **kv):
        if self.params.be_verbose:
            with sub_log():
                for key, val in kv.items():
                    logger.write_element(key, val)

    def __exit__(self, *exc):
        if self.params.be_verbose:
            logger.exit_sub_log()
        return False


def finish_iterations(params, total_iterations, mat=None):
    if params.be_verbose:
        logger.write_element("Total Iterations", total_iterations)
        if mat is not None:
            print_matrix_information(mat)


def print_matrix_information(mat):
    """reference PSMatrixModule.F90:1248-1270."""
    with sub_log("Matrix Information"):
        logger.write_element("Dimension", mat.dim)
        nnz = mat.nnz
        logger.write_element("Nonzeros", nnz)
        logger.write_element("Sparsity", nnz / float(mat.dim) ** 2)


def orthogonalize(h, isq, params):
    """WH = ISQ @ H @ ISQ^H (reference solvers' working-Hamiltonian step).

    The reference uses a plain transpose (e.g.
    DensityMatrixSolversModule.F90:355-357) but only ever pairs complex
    Hamiltonians with *real* overlaps (UnitTests/test_chemistry.py:32); the
    conjugate transpose is the Hermitian-correct generalization and is
    identical for real ISQ.
    """
    isqt = alg.transpose(isq).conjugate()
    wh = alg.similarity_transform(h, isq, isqt, threshold=params.threshold)
    return wh, isqt


def deorthogonalize(x, isq, isqt, params):
    """K = ISQ^T @ X @ ISQ."""
    return alg.similarity_transform(x, isqt, isq, threshold=params.threshold)


def maybe_permute(params, *mats):
    if params.do_load_balancing and params.balance_permutation is not None:
        return tuple(permute_matrix(m, params.balance_permutation,
                                    params.threshold) for m in mats)
    return mats if len(mats) > 1 else mats


def maybe_unpermute(params, mat):
    if params.do_load_balancing and params.balance_permutation is not None:
        return undo_permute_matrix(mat, params.balance_permutation,
                                   params.threshold)
    return mat


def identity_like(mat) -> PM.PSMatrix:
    return PM.identity(mat.dim, bs=mat.bs, k=mat.k, dtype=mat.dtype,
                       grid=mat.grid)


def real_scalar(x) -> float:
    x = complex(x)
    return float(x.real)


# ----------------------------------------------------------------------------
# chunked (scan-fused) iteration machinery — TPU dispatch amortization
# ----------------------------------------------------------------------------

def select_matrix(pred, a: PM.PSMatrix, b: PM.PSMatrix) -> PM.PSMatrix:
    """Whole-matrix select on a traced scalar predicate (both operands must
    share shapes — i.e. run under a pinned capacity)."""
    import jax.numpy as jnp
    return a.with_data(jnp.where(pred, a.col_ids, b.col_ids),
                       jnp.where(pred, a.blocks, b.blocks))


def pad_capacity(m: PM.PSMatrix, k: int) -> PM.PSMatrix:
    """Widen (or keep) the slot capacity to exactly k."""
    import jax.numpy as jnp
    from ..config import EMPTY
    if m.k == k:
        return m
    assert m.k < k, "pad_capacity cannot shrink"
    pads = k - m.k
    cc = jnp.pad(m.col_ids, ((0, 0), (0, 0), (0, pads)),
                 constant_values=EMPTY)
    cb = jnp.pad(m.blocks, ((0, 0), (0, 0), (0, pads), (0, 0), (0, 0)))
    return m.with_data(cc, cb)


def run_chunked(step_fn, carry0, consts, params, monitor, ilog, *,
                k_pin: int, aux_names=("Energy Value",), conv_index=0,
                conv_mode: str = "diff"):
    """Drive step_fn with params.iters_per_sync iterations fused into one
    compiled lax.scan per host sync (the TPU answer to the reference's
    per-iteration MPI_Allreduce convergence checks: dispatch and readback
    latency is paid once per chunk, not per iteration).

    step_fn(carry, *consts) -> (carry_new, (scalar, ...)) — fully traced,
    static shapes (matrices in the carry must be pre-padded to the pinned
    capacity ``k_pin``).  conv_mode 'diff' feeds the monitor successive
    differences of scalar[conv_index]; 'value' feeds it directly.
    Returns (carry, scalars_history list-of-tuples, total_iters).
    """
    import jax
    import numpy as np
    from jax import lax

    chunk = max(1, params.iters_per_sync)

    @jax.jit
    def chunk_fn(carry, *cs):
        import ntpoly_tpu.parallel.algebra as alg
        with alg.capacity_policy(k_out=k_pin, on_overflow="truncate",
                                 row_chunk=params.row_chunk):
            def body(c, _):
                return step_fn(c, *cs)
            return lax.scan(body, carry, None, length=chunk)

    history = []
    prev = None
    total = 0
    for _ in range(0, params.max_iterations, chunk):
        carry0, scal = chunk_fn(carry0, *consts)
        scal = [np.asarray(s) for s in scal]      # ONE sync per chunk
        converged = False
        for it in range(chunk):
            row = tuple(float(s[it]) for s in scal)
            history.append(row)
            total += 1
            if conv_mode == "diff":
                val = row[conv_index] if prev is None \
                    else row[conv_index] - prev
                prev = row[conv_index]
            else:
                val = row[conv_index]
            monitor.append(val)
            if ilog is not None:
                ilog.step(**{name: row[i]
                             for i, name in enumerate(aux_names)})
            if monitor.check_converged(params.be_verbose):
                converged = True
                break
        if converged or total >= params.max_iterations:
            break
    return carry0, history, total
