"""Benchmarks: the BASELINE.md config list on one chip.

Prints one JSON line per config, the headline (threshold-filtered SpGEMM
throughput, the inner loop of every solver) LAST so the driver parses it:
  {"metric": "spgemm_nnz_per_s", "value": N, "unit": "nnz/s",
   "vs_baseline": N}

nnz/s counts nonzeros processed per multiply (nnz(A) + nnz(B) + nnz(C)),
the accounting NTPoly's linear-scaling claims use.  vs_baseline is measured
against the driver target of 1e9 nnz/s per chip for the headline; the
solver configs (BASELINE.md configs 1-4: Hotelling inverse, TRS4
wall-time-to-tolerance on a ~10k hydrogen chain, complex ISQ+sign,
Chebyshev exp/log on a graph Laplacian) have no published reference
numbers (the reference repo ships none in-tree), so vs_baseline is null.

Synchronization note: on the tunneled TPU backend ``block_until_ready``
returns at enqueue, so timing uses scalar readback barriers.
"""
import json
import sys
import time

import numpy as np


def _emit(metric, value, unit, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": vs_baseline}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _solve_stats(log_path):
    """(iterations, method) parsed from the YAML solver trace."""
    import yaml
    try:
        docs = yaml.safe_load(open(log_path))
        for key, blk in (docs or {}).items():
            if isinstance(blk, dict) and "Total Iterations" in blk:
                return int(blk["Total Iterations"]), blk.get("Method")
    except Exception:
        pass
    return None, None


def _sync(mat):
    """Force device completion: tiny scalar readback."""
    import jax.numpy as jnp
    return float(jnp.abs(jnp.sum(mat.blocks[0, 0, 0, 0])))


def _chain(dim, bandwidth, dtype=np.float32):
    from __graft_entry__ import _chain_hamiltonian
    i, j, v = _chain_hamiltonian(dim, bandwidth=bandwidth)
    return i, j, v.astype(dtype)


def _gapped_chain(dim, bandwidth, dtype=np.float32):
    """Insulating (gapped) chain: staggered +-1 on-site energies open a
    band gap at half filling — purification needs a gap to converge, and
    linear-scaling methods target insulators."""
    i, j, v = _chain(dim, bandwidth, dtype)
    stagger = np.where(i % 2 == 0, 0.15, -0.15).astype(dtype)
    v = np.where(i == j, stagger, 0.25 * v).astype(dtype)
    return i, j, v


def _fill(dim, bs, grid, i, j, v, k=1):
    from ntpoly_tpu.parallel import pmatrix as PM
    h = PM.empty(dim, bs=bs, dtype=v.dtype, grid=grid, k=k)
    return PM.fill_from_triplets(h, i, j, v)


def _chain_fn(dim):
    """Device-side value function of the tight-binding chain
    (_chain_hamiltonian's closed form, for PM.fill_banded)."""
    import jax.numpy as jnp

    def fn(i, j):
        off = jnp.abs(i - j).astype(jnp.float32)
        hop = 1.0 / (1.0 + off) ** 2
        diag = -1.0 + 2.0 * i.astype(jnp.float32) / (dim - 1)
        return jnp.where(off == 0, diag, hop)
    return fn


def _gapped_fn():
    """Device-side value function of the gapped (insulating) chain."""
    import jax.numpy as jnp

    def fn(i, j):
        off = jnp.abs(i - j).astype(jnp.float32)
        hop = 0.25 / (1.0 + off) ** 2
        stag = jnp.where(i % 2 == 0, 0.15, -0.15)
        return jnp.where(off == 0, stag, hop)
    return fn


def _trs4_iteration_slope(h, imat, k_pin, threshold, reps=6):
    """Slope-timed COMPUTE seconds per TRS4 iteration at this shape
    (the methodology of profile_solver.py, compact): a full iteration
    body scanned n and 3n times; the slope cancels the tunnel's
    dispatch floor.  This is the `compute_s_per_iteration` the wall
    number can be compared against (r3 VERDICT weak #4)."""
    import jax
    import jax.numpy as jnp
    from ntpoly_tpu.parallel import algebra as alg
    from ntpoly_tpu.solvers.common import pad_capacity

    x0 = pad_capacity(h, k_pin)
    trace_t = jnp.float32(h.dim // 2)

    def step_once(xc, imatc):
        with alg.capacity_policy(k_out=k_pin, on_overflow="truncate"):
            x2 = alg.matmul(xc, xc, threshold=threshold)
            d1 = jnp.real(alg.dot(x2, xc))
            d2 = jnp.real(alg.dot(x2, x2))
            t2 = jnp.real(alg.trace(x2))
            sigma = jnp.where(jnp.abs(t2 - 2 * d1 + d2) < 1e-14, 3.0,
                              (trace_t - (4 * d1 - 3 * d2))
                              / (t2 - 2 * d1 + d2))
            poly = alg.increment(
                alg.increment(x2, xc, sigma - 3.0, 4.0 - 2.0 * sigma,
                              threshold=threshold),
                imatc, 1.0, sigma, threshold=threshold)
            x_mid = alg.matmul(x2, poly, threshold=threshold)
        return x_mid

    def make_run(n):
        @jax.jit
        def run(x_in, imat_in):
            def body(carry, aa):
                xs = x_in.with_data(x_in.col_ids, x_in.blocks * aa)
                out = step_once(xs, imat_in)
                return carry + jnp.sum(jnp.abs(out.blocks)) * 1e-30, None
            tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
            return tot
        return lambda: run(x0, imat)

    t = {}
    for n in (reps, 3 * reps):
        fn = make_run(n)
        float(fn())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn())
            times.append(time.perf_counter() - t0)
        t[n] = min(times)
    return (t[3 * reps] - t[reps]) / (2 * reps)


def _oracle_rel_err(mat, ref_dense):
    """Relative Frobenius error of a device result vs a host f64 oracle —
    the reference's acceptance bar (UnitTests/helpers.py:13)."""
    from ntpoly_tpu.parallel import pmatrix as PM
    r, c, v = PM.to_triplets(mat)
    got = np.zeros(ref_dense.shape)
    got[r, c] = v.astype(np.float64)
    return float(np.linalg.norm(got - ref_dense)
                 / np.linalg.norm(ref_dense))


def bench_spgemm(grid, on_cpu):
    """Headline: X @ X with threshold truncation on a banded Hamiltonian."""
    import jax
    import jax.numpy as jnp
    from ntpoly_tpu.parallel import algebra as alg

    dim = 4096 if on_cpu else 16384
    bs = 128
    h = _fill(dim, bs, grid, *_chain(dim, bandwidth=160))
    # Size the output capacity to the exact structural fill-in (NTPoly
    # sizes its memory pool the same way, GemmMatrix.f90:48-56).
    k_out = alg.fill_bound(h, h)
    threshold = 1e-6
    reps = 20 if on_cpu else 40
    method = alg._pick_method(h, h, k_out)

    # A compiled chain of multiplies — how every solver iteration runs
    # (lax.scan around matmul).  Two methodology rules learned the hard
    # way: (1) the OPERAND is scaled by the per-step scalar so XLA's
    # while-loop invariant code motion cannot hoist any stage out of the
    # loop (r02 scaled only alpha and overstated throughput); (2) the
    # per-multiply time is the SLOPE between an n-step and a 3n-step
    # chain, which cancels the tunneled backend's large variable
    # dispatch+readback floor exactly (r02 divided one call by n and
    # understated throughput by the floor/n).
    def chain_fn(n):
        @jax.jit
        def chain(x):
            def step(carry, aa):
                xs = x.with_data(x.col_ids, x.blocks * aa)
                c = alg.matmul(xs, x, threshold=threshold,
                               k_out=k_out, on_overflow="truncate")
                return carry + c.blocks[0, 0, 0, 0, 0], None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1.0, 2.0, n,
                                               dtype=jnp.float32))
            return tot
        return chain

    c = alg.matmul(h, h, threshold=threshold, k_out=k_out,
                   on_overflow="truncate")
    totals = {}
    for n in (reps, 3 * reps):
        fn = chain_fn(n)
        float(fn(h))              # compile + settle
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(h))          # scalar readback barrier
            times.append(time.perf_counter() - t0)
        totals[n] = min(times)
    dt = (totals[3 * reps] - totals[reps]) / (2 * reps)

    nnz = 2 * int(h.nnz) + int(c.nnz)
    value = nnz / dt
    _emit("spgemm_nnz_per_s", value, "nnz/s", value / 1e9, method=method,
          precision="high (default)", ms_per_multiply=dt * 1e3)
    try:
        _spgemm_f32x3(on_cpu, h, k_out, threshold, reps, nnz, value,
                      method, dt)
    except Exception as e:                          # optional mode only
        print(f"# f32x3 secondary failed: {type(e).__name__}",
              file=sys.stderr)


def _spgemm_f32x3(on_cpu, h, k_out, threshold, reps, nnz, value, method,
                  dt):
    import jax
    import jax.numpy as jnp
    from ntpoly_tpu.parallel import algebra as alg
    if not on_cpu:
        # secondaries: the opt-in exact tier (precision='highest') and
        # the bf16-quantized single-pass tier (precision='bf16', the r3
        # VERDICT traffic-halving prototype).  The HEADLINE measures the
        # DEFAULT path — precision='high' since r5, with solver-level
        # iteration/oracle evidence on the trs4_10k line.
        def chain_fast(n, prec):
            @jax.jit
            def chain(x):
                def step(carry, aa):
                    xs = x.with_data(x.col_ids, x.blocks * aa)
                    c = alg.matmul(xs, x, threshold=threshold, k_out=k_out,
                                   on_overflow="truncate",
                                   precision=prec)
                    return carry + c.blocks[0, 0, 0, 0, 0], None
                tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                      jnp.linspace(1.0, 2.0, n,
                                                   dtype=jnp.float32))
                return tot
            return chain

        c_hi = alg.matmul(h, h, threshold=threshold, k_out=k_out,
                          on_overflow="truncate", precision="highest")
        for prec, metric in (("highest", "spgemm_nnz_per_s_highest"),
                             ("bf16", "spgemm_nnz_per_s_bf16")):
            tf = {}
            for n in (reps, 3 * reps):
                fn = chain_fast(n, prec)
                float(fn(h))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(fn(h))
                    ts.append(time.perf_counter() - t0)
                tf[n] = min(ts)
            dtf = (tf[3 * reps] - tf[reps]) / (2 * reps)
            # accuracy vs full precision on one multiply
            c_lo = alg.matmul(h, h, threshold=threshold, k_out=k_out,
                              on_overflow="truncate", precision=prec)
            num = float(jnp.max(jnp.abs(c_lo.blocks - c_hi.blocks)))
            den = float(jnp.max(jnp.abs(c_hi.blocks)))
            _emit(metric, nnz / dtf, "nnz/s",
                  nnz / dtf / 1e9, method=method, precision=prec,
                  ms_per_multiply=dtf * 1e3,
                  max_rel_err_vs_highest=num / den)
        # re-emit the default-path headline LAST (driver parses the
        # final JSON line)
        _emit("spgemm_nnz_per_s", value, "nnz/s", value / 1e9,
              method=method, precision="high (default)",
              ms_per_multiply=dt * 1e3)


def bench_hotelling(grid, on_cpu):
    """BASELINE config 1: Hotelling inverse of an overlap-like matrix."""
    from ntpoly_tpu.parallel import pmatrix as PM
    from ntpoly_tpu.solvers import inverse
    from ntpoly_tpu.solvers.parameters import SolverParameters

    dim = 1024 if on_cpu else 4096
    i, j, v = _chain(dim, bandwidth=8)
    # diagonally dominant SPD overlap
    v = np.where(i == j, 2.0 + v, 0.05 * v).astype(np.float32)
    s = _fill(dim, 128 if not on_cpu else 32, grid, i, j, v)
    # pin capacity: static shapes -> one compile per op for the whole solve
    import os
    import tempfile
    from ntpoly_tpu.utils.logging import activate_logger, deactivate_logger
    params = SolverParameters(converge_diff=1e-6, threshold=1e-8,
                              k_out=min(s.panel_nb, 8 * s.k),
                              iters_per_sync=8, be_verbose=True)
    from ntpoly_tpu.parallel import algebra as alg
    method = alg._pick_method(s, s, params.k_out)
    inverse.invert(s, params)            # warm caches
    log = os.path.join(tempfile.mkdtemp(), "log.yaml")
    activate_logger(log)
    t0 = time.perf_counter()
    inv = inverse.invert(s, params)
    _sync(inv)
    wall = time.perf_counter() - t0
    deactivate_logger()
    iters, _ = _solve_stats(log)
    # r3 VERDICT weak #5: on-chip result vs host f64 scipy-style oracle
    # (the reference's acceptance bar, UnitTests/helpers.py:13)
    s_dense = np.zeros((dim, dim))
    s_dense[i, j] = v.astype(np.float64)
    oracle = np.linalg.inv(s_dense)
    _emit("hotelling_invert_s", wall, "s", method=method,
          iterations=iters,
          s_per_iteration=(wall / iters) if iters else None,
          oracle_rel_err=_oracle_rel_err(inv, oracle))


def bench_trs4(grid, on_cpu):
    """BASELINE config 2: TRS4 wall-time-to-tolerance on a ~10k-row
    hydrogen-chain Hamiltonian (converge_diff 1e-6)."""
    from ntpoly_tpu.parallel import pmatrix as PM
    from ntpoly_tpu.solvers import density
    from ntpoly_tpu.solvers.parameters import SolverParameters

    dim = 1024 if on_cpu else 10240
    bs = 32 if on_cpu else 128
    ti, tj, tv = _gapped_chain(dim, bandwidth=16)
    h = _fill(dim, bs, grid, ti, tj, tv)
    isq = PM.identity(dim, bs=bs, dtype=np.float32, grid=grid)
    nel = dim // 2                       # half filling: mu in the gap
    import os
    import tempfile
    from ntpoly_tpu.parallel import algebra as alg
    from ntpoly_tpu.utils.logging import activate_logger, deactivate_logger
    # k_out=8 pins just above the measured purification fill (~5-6 at
    # this threshold): r3's 8*h.k=24 tripled the A-stream and busted the
    # band kernel's SMEM gate; on_overflow='grow' redoes a chunk in the
    # rare case fill spikes past the pin
    params = SolverParameters(converge_diff=1e-6, threshold=1e-7,
                              k_out=min(h.panel_nb, 8),
                              iters_per_sync=8, be_verbose=True)
    method = alg._pick_method(h, h, params.k_out)
    _sync(density.trs4(h, isq, float(nel), params)[0])   # warm compiles
    log = os.path.join(tempfile.mkdtemp(), "log.yaml")
    activate_logger(log)
    t0 = time.perf_counter()
    rho, energy, mu = density.trs4(h, isq, float(nel), params)
    _sync(rho)
    wall = time.perf_counter() - t0
    deactivate_logger()
    iters, _ = _solve_stats(log)
    # r3 VERDICT weak #5: on-chip density vs host f64 eigendecomposition
    # oracle (reference acceptance bar, UnitTests/helpers.py:13)
    h_dense = np.zeros((dim, dim))
    h_dense[ti, tj] = tv.astype(np.float64)
    w, vec = np.linalg.eigh(h_dense)
    occ = vec[:, :nel]
    rho_ref = occ @ occ.T
    err = _oracle_rel_err(rho, rho_ref)
    isq1 = PM.identity(dim, bs=bs, dtype=np.float32, grid=grid)
    comp = None
    if not on_cpu:
        try:
            comp = _trs4_iteration_slope(h, isq1, min(h.panel_nb, 8),
                                         params.threshold)
        except Exception as e:
            print(f"# iteration slope failed: {type(e).__name__}",
                  file=sys.stderr)
    _emit("trs4_10k_wall_s", wall, "s", method=method, iterations=iters,
          precision="high (default)",
          s_per_iteration=(wall / iters) if iters else None,
          compute_s_per_iteration=comp,
          oracle_rel_err=err)
    # The DEFAULT path is precision='high' since r5 (the primary line
    # above measures it, with its iteration count and oracle error
    # attached — the solver-level evidence VERDICT r4 next #3 asks
    # for).  The exact tier stays measured as a secondary so the
    # iteration-count delta (plateau monitor lag, +1) is on record.
    if not on_cpu:
        ph = params.copy()
        ph.precision = "highest"
        _sync(density.trs4(h, isq, float(nel), ph)[0])   # warm
        log2 = os.path.join(tempfile.mkdtemp(), "log_highest.yaml")
        activate_logger(log2)
        t0 = time.perf_counter()
        rho_h, _, _ = density.trs4(h, isq, float(nel), ph)
        _sync(rho_h)
        wall_h = time.perf_counter() - t0
        deactivate_logger()
        iters_h, _ = _solve_stats(log2)
        _emit("trs4_10k_highest_wall_s", wall_h, "s", method=method,
              precision="highest", iterations=iters_h,
              s_per_iteration=(wall_h / iters_h) if iters_h else None,
              oracle_rel_err=_oracle_rel_err(rho_h, rho_ref))


def bench_trs4_100k(grid, on_cpu):
    """Six-figure-dimension purification on the single chip (the spirit of
    BASELINE config 5's >1M-row multi-host target on the hardware that
    exists): TRS4 wall-time-to-tolerance on a 102,400-row gapped chain.

    Emits iterations, s/iteration, and solve-phase nnz/s so a convergence
    regression is distinguishable from a kernel regression."""
    from ntpoly_tpu.parallel import pmatrix as PM
    from ntpoly_tpu.solvers import density
    from ntpoly_tpu.solvers.parameters import SolverParameters
    from ntpoly_tpu.utils.logging import activate_logger, deactivate_logger
    import tempfile
    import os

    dim = 4096 if on_cpu else 102400
    bs = 32 if on_cpu else 128
    h = _fill(dim, bs, grid, *_gapped_chain(dim, bandwidth=16))
    isq = PM.identity(dim, bs=bs, dtype=np.float32, grid=grid)
    nel = dim // 2
    params = SolverParameters(converge_diff=1e-6, threshold=1e-7,
                              k_out=min(h.panel_nb, 8),
                              iters_per_sync=8, be_verbose=True)
    # warm: one chunk compiles the whole iteration graph at these shapes
    warm = params.copy()
    warm.be_verbose = False
    warm.max_iterations = warm.iters_per_sync
    _sync(density.trs4(h, isq, float(nel), warm)[0])
    log = os.path.join(tempfile.mkdtemp(), "trs4.yaml")
    activate_logger(log)
    t0 = time.perf_counter()
    rho, energy, mu = density.trs4(h, isq, float(nel), params)
    _sync(rho)
    wall = time.perf_counter() - t0
    deactivate_logger()
    iters, _ = _solve_stats(log)
    comp = None
    if not on_cpu:
        try:
            comp = _trs4_iteration_slope(h, isq, min(h.panel_nb, 8),
                                         params.threshold, reps=4)
        except Exception as e:
            print(f"# iteration slope failed: {type(e).__name__}",
                  file=sys.stderr)
    nnz_per_mult = 2 * int(h.nnz) + int(rho.nnz)
    extra = dict(dim=dim, iterations=iters,
                 s_per_iteration=(wall / iters) if iters else None,
                 compute_s_per_iteration=comp,
                 rho_nnz=int(rho.nnz))
    try:
        extra.update(_purity_invariants(rho, h, float(nel),
                                        threshold=params.threshold))
    except Exception as e:                          # certificates only
        print(f"# invariants failed: {type(e).__name__}",
              file=sys.stderr)
    _emit("trs4_100k_wall_s", wall, "s", **extra)


def bench_fill_1m(grid, on_cpu):
    """Million-row construction + one threshold-filtered multiply on the
    single chip (r3 VERDICT missing #4: nothing at >=2^20 rows).

    Construction is DEVICE-SIDE (PM.fill_banded: analytic band structure
    + elementwise value function under jit) — r3's 362 s at half this
    size was ~51 s of single-threaded numpy + ~300 s of tunnel upload,
    both of which this path deletes.  The generic triplet path (now
    backed by the threaded native/blockfill.cpp) is timed separately at
    a smaller dim so its regression is still visible."""
    from ntpoly_tpu.parallel import algebra as alg
    from ntpoly_tpu.parallel import pmatrix as PM

    dim = 131072 if on_cpu else 1048576
    bs = 128
    t0 = time.perf_counter()
    h = PM.banded(dim, 24, _chain_fn(dim), bs=bs, grid=grid,
                  dtype=np.float32)
    _sync(h)
    fill_s = time.perf_counter() - t0
    # generic triplet path (host parse + native block build + upload)
    tdim = 32768 if on_cpu else 262144
    t0 = time.perf_counter()
    ht = _fill(tdim, bs, grid, *_chain(tdim, bandwidth=24))
    _sync(ht)
    triplet_fill_s = time.perf_counter() - t0
    import jax
    import jax.numpy as jnp
    k_out = alg.fill_bound(h, h)
    c = alg.matmul(h, h, threshold=1e-6, k_out=k_out,
                   on_overflow="truncate")     # compile + run
    _sync(c)
    # slope-timed multiply (a single-call wall at this size is mostly
    # the tunnel's dispatch floor)
    def make_run(n):
        @jax.jit
        def run(hh):
            def body(carry, aa):
                hs = hh.with_data(hh.col_ids, hh.blocks * aa)
                cc = alg.matmul(hs, hh, threshold=1e-6, k_out=k_out,
                                on_overflow="truncate")
                return carry + cc.blocks[0, 0, 0, 0, 0], None
            tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
            return tot
        return lambda: run(h)
    reps_m = 4 if on_cpu else 8
    tt = {}
    for n in (reps_m, 3 * reps_m):
        fn = make_run(n)
        float(fn())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn())
            times.append(time.perf_counter() - t0)
        tt[n] = min(times)
    mult_s = (tt[3 * reps_m] - tt[reps_m]) / (2 * reps_m)
    nnz = 2 * int(h.nnz) + int(c.nnz)
    _emit("fill_1m_s", fill_s, "s", dim=dim, nnz=int(h.nnz),
          method="device_banded", triplet_fill_s=triplet_fill_s,
          triplet_fill_dim=tdim, multiply_s=mult_s,
          multiply_nnz_per_s=nnz / mult_s)


def _purity_invariants(rho, h, nel, threshold=1e-7):
    """On-chip correctness certificates for a converged density matrix
    (r4 VERDICT weak #4: the 2^20 solve's only correctness signal was
    its own energy trace).  All computable with three extra multiplies:

      idempotency_rel = ||K^2 - K||_F / ||K||_F      (K a projector)
      trace_abs_err   = |tr K - nel|                 (electron count)
      commutator_rel  = ||KH - HK||_F / ||KH||_F     ([K, H] = 0)

    Residuals are formed EXPLICITLY before the norm dots (a difference
    of large dot products would cancel catastrophically in f32); the
    trace rides the compensated pair."""
    import contextlib
    from ntpoly_tpu.parallel import algebra as alg

    # at the 2^20 shape only the single-arm band kernel fits HBM (the
    # scatter arms OOM); the full-span+compact multiply keeps it exact
    # up to the threshold flush
    big = rho.blocks.nbytes >= (2 << 30)
    ctx = alg.capacity_policy(k_out=max(rho.k, h.k),
                              method="pallas_band",
                              on_overflow="truncate") if big else \
        contextlib.nullcontext()
    with ctx:
        k2 = alg.matmul(rho, rho, threshold=threshold)
        r = alg.increment(k2, rho, 1.0, -1.0)
        del k2
        idem = float(np.sqrt(max(np.real(np.asarray(alg.dot(r, r))), 0.0)
                             / np.real(np.asarray(alg.dot(rho, rho)))))
        del r
        tr = alg.host_pair(alg.trace_pair(rho))
        kh = alg.matmul(rho, h, threshold=threshold)
        hk = alg.matmul(h, rho, threshold=threshold)
        c = alg.increment(kh, hk, 1.0, -1.0)
        del hk
        comm = float(np.sqrt(max(np.real(np.asarray(alg.dot(c, c))), 0.0)
                             / np.real(np.asarray(alg.dot(kh, kh)))))
    return {"idempotency_rel": idem,
            "trace_abs_err": abs(tr - nel),
            "commutator_rel": comm}


def bench_trs4_1m(grid, on_cpu):
    """BASELINE config 5 (single-chip leg): TRS4 purification to 1e-6 on
    a >=2^20-row gapped chain — the driver north star's dimension on the
    hardware that exists.  Construction is device-side; capacity is
    pinned to keep the live set inside HBM."""
    from ntpoly_tpu.parallel import pmatrix as PM
    from ntpoly_tpu.solvers import density
    from ntpoly_tpu.solvers.parameters import SolverParameters
    from ntpoly_tpu.utils.logging import activate_logger, deactivate_logger
    import tempfile
    import os

    dim = 8192 if on_cpu else 1048576
    bs = 32 if on_cpu else 128
    h = PM.banded(dim, 16, _gapped_fn(), bs=bs, grid=grid,
                  dtype=np.float32)
    isq = PM.identity(dim, bs=bs, dtype=np.float32, grid=grid)
    nel = dim // 2
    # k_out: at bs=128 the purification band spread (~100 elements at
    # this threshold) stays within +-1 block, so 6 slots cover it; the
    # CPU smoke variant at bs=32 needs more.  'warn' (not 'grow') keeps
    # carry donation legal — the warning is the honesty signal.
    # eager iterations (iters_per_sync=1): per-op peak memory is what
    # fits the 2^20-row solve in 16 GB HBM — the fused-chunk scan keeps
    # too many intermediates live; the frugal eager loop frees X before
    # the polynomial multiply.  pallas_band compiles only the band
    # kernel arm (the general fallback's buffers are the rest of the
    # margin).
    # Convergence: the idempotency VALUE metric (plateau-detected).
    # Measured at this scale (30-iteration trace, ROUND5_NOTES.md): the
    # solve converges in ~7 iterations (idempotency residual decays
    # 4e-1 -> 5e-8 = the f32 arithmetic floor), after which trace_gx
    # cancels to f32 noise, sigma blows past the clamps, and the clamp
    # branches make the energy chatter by ~0.1-0.5 forever — an
    # energy-DIFF criterion below that chatter is unreachable at f32 no
    # matter how the trace is summed.  What IS certifiable: the
    # REPORTED energy rides the compensated (hi, lo) pair (comp_sum:
    # summation error ~eps^2*|E| ~= 1e-6 absolute, certified vs a
    # float64 oracle in tests/test_bell.py), and the converged state
    # carries on-chip invariant certificates (idempotency, trace,
    # commutator) on this bench line (VERDICT r4 next #4/#7).
    params = SolverParameters(converge_diff=1e-3, threshold=1e-7,
                              iters_per_sync=1,
                              compensated_scalars=True,
                              convergence_metric="idempotency",
                              k_out=10 if on_cpu else 5,
                              matmul_method=None if on_cpu
                              else "pallas_band",
                              on_overflow="warn", be_verbose=True)
    warm = params.copy()
    warm.be_verbose = False
    warm.max_iterations = 2
    _sync(density.trs4(h, isq, float(nel), warm)[0])
    log = os.path.join(tempfile.mkdtemp(), "trs4_1m.yaml")
    activate_logger(log)
    t0 = time.perf_counter()
    rho, energy, mu = density.trs4(h, isq, float(nel), params)
    _sync(rho)
    wall = time.perf_counter() - t0
    deactivate_logger()
    iters, _ = _solve_stats(log)
    rho_nnz = int(rho.nnz)
    # 2 SpGEMMs per TRS4 iteration; nnz/s counts processed nonzeros
    nnz_per_iter = 2 * (2 * int(h.nnz) + rho_nnz)
    inv = {}
    try:
        inv = _purity_invariants(rho, h, float(nel),
                                 threshold=params.threshold)
    except Exception as e:                          # certificates only
        print(f"# invariants failed: {type(e).__name__}",
              file=sys.stderr)
    _emit("trs4_1m_wall_s", wall, "s", dim=dim, iterations=iters,
          s_per_iteration=(wall / iters) if iters else None,
          rho_nnz=rho_nnz,
          nnz_per_s=(iters * nnz_per_iter / wall) if iters else None,
          convergence="idempotency plateau (f32 floor ~5e-8/electron)",
          energy_certified_by="compensated two-float energy trace "
                              "(comp_sum: ~eps^2*|E| ~= 1e-6 abs)",
          **inv)


def bench_complex_isq_sign(grid, on_cpu):
    """BASELINE config 3: inverse square root + sign function on an
    ill-conditioned complex Hermitian overlap.

    On TPU the complex matrix runs through the real 2x2 embedding
    C = A + iB -> [[A, -B], [B, A]] (a ring homomorphism, so
    f(embed(C)) = embed(f(C)) for the matrix functions here) — the
    TPU-native representation of complex data, since XLA:TPU has no
    native complex support on this hardware path.
    """
    from ntpoly_tpu.solvers import squareroot, sign
    from ntpoly_tpu.solvers.parameters import SolverParameters
    from ntpoly_tpu.parallel import pmatrix as PM

    dim = 512 if on_cpu else 2048
    bs = 32 if on_cpu else 128
    i, j, v = _chain(dim, bandwidth=6)
    # Hermitian, SPD, condition number ~ 1e3 via a graded diagonal.
    diag = np.geomspace(1.0, 1e3, dim).astype(np.float32)
    vals = np.where(i == j, diag[i], 0.05 * v * (1.0 + 0.5j)
                    ).astype(np.complex64)
    vals = np.where(i < j, np.conj(vals), vals)
    if on_cpu:
        s = _fill(dim, bs, grid, i, j, vals)
    else:
        from ntpoly_tpu.core import cplx
        i2, j2, v2, dim2 = cplx.embed_triplets(i, j, vals, dim)
        s = _fill(dim2, bs, grid, i2, j2, v2.astype(np.float32))
    params = SolverParameters(converge_diff=1e-6, threshold=1e-9,
                              k_out=min(s.panel_nb, 8 * s.k),
                              iters_per_sync=8)
    from ntpoly_tpu.parallel import algebra as alg
    method = alg._pick_method(s, s, params.k_out)
    _sync(squareroot.inverse_square_root(s, params))     # warm compiles
    _sync(sign.sign_function(s, params))
    t0 = time.perf_counter()
    isq = squareroot.inverse_square_root(s, params)
    _sync(isq)
    sg = sign.sign_function(s, params)
    _sync(sg)
    wall = time.perf_counter() - t0
    # r4 VERDICT weak #4: every solver line carries an accuracy field —
    # host f64 complex oracle (eigendecomposition), device results read
    # back through the embedding extraction
    s_dense = np.zeros((dim, dim), np.complex128)
    s_dense[i, j] = vals.astype(np.complex128)
    w, vec = np.linalg.eigh(s_dense)
    isq_ref = (vec / np.sqrt(w)[None, :]) @ np.conj(vec).T
    sgn_ref = (vec * np.sign(w)[None, :]) @ np.conj(vec).T

    def emb_err(mat, ref):
        if on_cpu:
            return _oracle_rel_err_cplx(mat, ref)
        from ntpoly_tpu.core import cplx
        from ntpoly_tpu.parallel import pmatrix as PM
        r2, c2, v2 = PM.to_triplets(mat)
        ri, ci, vi, _ = cplx.extract_triplets(r2, c2, v2, 2 * dim)
        got = np.zeros_like(ref)
        got[ri, ci] = vi
        return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))

    _emit("complex_isq_sign_wall_s", wall, "s", method=method,
          isq_oracle_rel_err=emb_err(isq, isq_ref),
          sign_oracle_rel_err=emb_err(sg, sgn_ref))


def _oracle_rel_err_cplx(mat, ref_dense):
    from ntpoly_tpu.parallel import pmatrix as PM
    r, c, v = PM.to_triplets(mat)
    got = np.zeros(ref_dense.shape, np.complex128)
    got[r, c] = v.astype(np.complex128)
    return float(np.linalg.norm(got - ref_dense)
                 / np.linalg.norm(ref_dense))


def bench_cheby_exp_log(grid, on_cpu):
    """BASELINE config 4: Chebyshev exponential + logarithm on a graph
    Laplacian (Examples/GraphTheory workload)."""
    from ntpoly_tpu.solvers import exponential
    from ntpoly_tpu.solvers.parameters import SolverParameters

    dim = 1024 if on_cpu else 4096
    bs = 32 if on_cpu else 128
    rng = np.random.default_rng(23)
    # ring Laplacian + random chords
    i = np.arange(dim)
    rows = np.concatenate([i, i, i])
    cols = np.concatenate([i, (i + 1) % dim, (i - 1) % dim])
    vals = np.concatenate([np.full(dim, 2.0), np.full(dim, -1.0),
                           np.full(dim, -1.0)])
    lap = _fill(dim, bs, grid, rows, cols,
                (-0.25 * vals).astype(np.float32))
    params = SolverParameters(threshold=1e-9,
                              k_out=min(lap.panel_nb, 16 * lap.k))
    from ntpoly_tpu.parallel import algebra as alg
    method = alg._pick_method(lap, lap, params.k_out)
    emat = exponential.compute_exponential(lap, params)  # warm compiles
    _sync(emat)
    _sync(exponential.compute_logarithm(emat, params))
    t0 = time.perf_counter()
    emat = exponential.compute_exponential(lap, params)
    _sync(emat)
    lmat = exponential.compute_logarithm(emat, params)
    _sync(lmat)
    wall = time.perf_counter() - t0
    # r4 VERDICT weak #4: accuracy fields — host f64 eigendecomposition
    # oracle for exp(L); log(exp(L)) must recover L itself
    lap_dense = np.zeros((dim, dim))
    np.add.at(lap_dense, (rows, cols), -0.25 * vals)
    w, vec = np.linalg.eigh(lap_dense)
    exp_ref = (vec * np.exp(w)[None, :]) @ vec.T
    _emit("cheby_exp_log_wall_s", wall, "s", method=method,
          exp_oracle_rel_err=_oracle_rel_err(emat, exp_ref),
          log_oracle_rel_err=_oracle_rel_err(lmat, lap_dense))


CONFIGS = {
    "spgemm": bench_spgemm,
    "hotelling": bench_hotelling,
    "trs4": bench_trs4,
    "trs4_100k": bench_trs4_100k,
    "trs4_1m": bench_trs4_1m,
    "fill_1m": bench_fill_1m,
    "complex": bench_complex_isq_sign,
    "cheby": bench_cheby_exp_log,
}

# Printed order: headline LAST (the driver parses the last JSON line).
ORDER = ["hotelling", "trs4", "trs4_100k", "trs4_1m", "fill_1m", "complex",
         "cheby", "spgemm"]


def run_one(name):
    import jax
    from ntpoly_tpu.parallel.grid import ProcessGrid
    on_cpu = jax.devices()[0].platform == "cpu"
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    CONFIGS[name](grid, on_cpu)


def main():
    """Each config runs in its own subprocess with a timeout: the tunneled
    TPU backend occasionally stalls for minutes in a fresh XLA compile
    (server-side compile cache makes reruns fast), and one stalled config
    must not take the others down."""
    import subprocess
    import sys

    lines = {}

    def attempt(name, timeout):
        try:
            res = subprocess.run(
                [sys.executable, __file__, "--config", name],
                capture_output=True, text=True, timeout=timeout)
            got = [ln for ln in res.stdout.splitlines()
                   if ln.startswith("{")]
            if got:
                lines[name] = got
            elif res.returncode != 0:
                tail = (res.stderr or "").strip().splitlines()[-1:]
                print(f"# {name}: failed rc={res.returncode} {tail}",
                      file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# {name}: timed out (cold XLA compile stall)",
                  file=sys.stderr)

    # headline first in execution (most important to complete), last in
    # output
    budget = {"spgemm": 900, "trs4": 1500, "trs4_100k": 1500,
              "trs4_1m": 1800, "fill_1m": 1200}
    for name in ["spgemm"] + [n for n in ORDER if n != "spgemm"]:
        attempt(name, budget.get(name, 360))
    # the tunneled backend's compile stalls are transient: one retry pass
    # for anything that timed out (caches warmed by the first attempt
    # survive server-side)
    for name in ORDER:
        if name not in lines:
            attempt(name, max(540, budget.get(name, 0)))
    for name in ORDER:
        for ln in lines.get(name, []):
            print(ln, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--config":
        run_one(sys.argv[2])
    else:
        main()
