"""Parity tests for the Pallas SpGEMM kernel (interpret mode on CPU).

The kernel is the library's hot loop on real TPUs; here it runs through the
Pallas interpreter against the XLA reference implementation
(``bell.spgemm_candidates``) and a numpy oracle, mirroring how the
reference tests its local multiply against scipy
(reference UnitTests/test_matrix.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ntpoly_tpu.config import EMPTY
from ntpoly_tpu.core import bell
from ntpoly_tpu.ops.spgemm_pallas import (
    spgemm_pallas, structure_plan, structural_fill, eligible)


def rand_block_sparse(rng, nbr, nbc, bs, density=0.4):
    d = rng.standard_normal((nbr * bs, nbc * bs))
    mask = rng.random((nbr, nbc)) < density
    return d * np.kron(mask, np.ones((bs, bs)))


def to_bell(dense, bs, k):
    return bell.from_dense(jnp.asarray(dense, np.float32), bs=bs, k=k)


@pytest.mark.parametrize("density", [0.2, 0.6])
def test_matches_bell_and_numpy(rng, density):
    nb, bs = 8, 8
    a = rand_block_sparse(rng, nb, nb, bs, density)
    b = rand_block_sparse(rng, nb, nb, bs, density)
    ac, ab = to_bell(a, bs, nb)
    bc, bb = to_bell(b, bs, nb)
    cc, cb, ucnt = spgemm_pallas(ac, ab, bc, bb, k_out=nb, interpret=True)
    rc, rb = bell.spgemm_candidates(ac, ab, bc, bb, col_offset=0, k_out=nb)
    assert np.array_equal(np.asarray(cc), np.asarray(rc))
    dense = np.asarray(bell.to_dense(cc, cb, nbc=nb), np.float64)
    assert np.allclose(dense, (a @ b).astype(np.float32), atol=1e-3)
    # structural fill matches the true pattern
    pattern = ((np.abs(a) > 0).reshape(nb, bs, nb, bs).any((1, 3)) @
               (np.abs(b) > 0).reshape(nb, bs, nb, bs).any((1, 3)))
    assert np.array_equal(np.asarray(ucnt), pattern.sum(1))


def test_threshold_and_alpha(rng):
    nb, bs = 6, 8
    a = rand_block_sparse(rng, nb, nb, bs, 0.5) * 0.1
    ac, ab = to_bell(a, bs, nb)
    thr = 0.05
    cc, cb, _ = spgemm_pallas(ac, ab, ac, ab, k_out=nb, threshold=thr,
                              alpha=2.5, interpret=True)
    rc, rb = bell.spgemm_candidates(ac, ab, ac, ab, col_offset=0,
                                    k_out=nb, threshold=thr, alpha=2.5)
    assert np.array_equal(np.asarray(cc), np.asarray(rc))
    got = np.asarray(cb)
    assert (np.abs(got[got != 0]) > thr).all()
    assert np.allclose(bell.to_dense(cc, cb, nbc=nb),
                       bell.to_dense(rc, rb, nbc=nb), atol=1e-5)


def test_ragged_rows_and_empty_row(rng):
    nb, bs, k = 6, 8, 3
    ac = np.full((nb, k), EMPTY, np.int32)
    ab = np.zeros((nb, k, bs, bs), np.float32)
    for r in range(nb):
        if r == 2:
            continue                        # leave row 2 entirely empty
        cols = rng.choice(nb, size=rng.integers(1, k + 1), replace=False)
        for s, c in enumerate(sorted(cols)):
            ac[r, s] = c
            ab[r, s] = rng.standard_normal((bs, bs))
    bc, bb = to_bell(rand_block_sparse(rng, nb, nb, bs, 0.5), bs, k + 2)
    cc, cb, _ = spgemm_pallas(jnp.asarray(ac), jnp.asarray(ab), bc, bb,
                              k_out=nb, interpret=True)
    rc, rb = bell.spgemm_candidates(jnp.asarray(ac), jnp.asarray(ab),
                                    bc, bb, col_offset=0, k_out=nb)
    assert np.array_equal(np.asarray(cc), np.asarray(rc))
    assert np.allclose(np.asarray(cb), np.asarray(rb), atol=1e-5)
    assert (np.asarray(cc)[2] == EMPTY).all()


def test_overflow_reports_ucnt(rng):
    """With k_out below the fill-in, ucnt flags the overflow and the kernel
    keeps the lowest column ids."""
    nb, bs = 6, 8
    a = rand_block_sparse(rng, nb, nb, bs, 0.9)
    ac, ab = to_bell(a, bs, nb)
    k_small = 3
    cc, cb, ucnt = spgemm_pallas(ac, ab, ac, ab, k_out=k_small,
                                 interpret=True)
    assert int(jnp.max(ucnt)) > k_small
    full_cc, full_cb, _ = spgemm_pallas(ac, ab, ac, ab, k_out=nb,
                                        interpret=True)
    # kept blocks = the first k_small survivors by ascending col id
    assert np.array_equal(np.asarray(cc), np.asarray(full_cc)[:, :k_small])
    assert np.allclose(np.asarray(cb), np.asarray(full_cb)[:, :k_small],
                       atol=1e-6)


def test_structure_plan_slots(rng):
    nb = 5
    ac = jnp.asarray(rng.integers(0, nb, (4, 3)), jnp.int32)
    bc = jnp.asarray(np.sort(rng.integers(0, nb, (nb, 2)), axis=1),
                     jnp.int32)
    slot, occ, ucnt = structure_plan(ac, bc, k_out=nb)
    occ = np.asarray(occ)
    slot = np.asarray(slot)
    for r in range(4):
        ids = np.asarray(bc)[np.asarray(ac)[r]].reshape(-1)
        uniq = np.unique(ids)
        assert np.array_equal(occ[r, :len(uniq)], uniq)
        assert int(np.asarray(ucnt)[r]) == len(uniq)
        for m, i in enumerate(ids):
            assert occ[r, slot[r, m]] == i
    assert np.array_equal(np.asarray(structural_fill(ac, bc)),
                          np.asarray(ucnt))


def test_eligible_gates():
    assert eligible(np.float32, 128, 11, 5, 5)
    assert not eligible(np.complex64, 128, 11, 5, 5)
    assert not eligible(np.float64, 128, 11, 5, 5)
    assert not eligible(np.float32, 100, 11, 5, 5)
    assert not eligible(np.float32, 128, 500, 5, 5)   # VMEM blowout


def test_kernel_v2_matches_v1(rng):
    """The manual-DMA kernel (grid over rows, double-buffered B stream)
    must produce bit-identical output to the gather-BlockSpec kernel."""
    import functools
    import jax
    import jax.numpy as jnp
    from ntpoly_tpu.ops import spgemm_pallas as sp
    from ntpoly_tpu.config import EMPTY
    bs = 8
    for (R, K, k_out) in [(8, 3, 6), (5, 5, 4), (16, 2, 5)]:
        def rand_ell(nbk):
            cols = np.full((R, K), EMPTY, np.int32)
            blocks = np.zeros((R, K, bs, bs), np.float32)
            for r in range(R):
                nk = int(rng.integers(1, K + 1))
                cols[r, :nk] = np.sort(rng.choice(nbk, nk, replace=False))
                blocks[r, :nk] = rng.standard_normal((nk, bs, bs))
            return jnp.asarray(cols), jnp.asarray(blocks)
        ac, ab = rand_ell(R)
        bc, bb = rand_ell(R)
        plan, occ, ucnt = jax.jit(
            sp.structure_plan, static_argnames="k_out")(ac, bc, k_out)
        b_panel = jnp.swapaxes(bb, -3, -2).reshape(R, bs, K * bs)
        scal = jnp.asarray([1.5, 1e-9], jnp.float32)
        kw = dict(kb=K, nbk=R, k_out=k_out, interpret=True)
        v1, n1 = sp._call_kernel(ac, plan, scal, ab, b_panel, **kw)
        v2, n2 = sp._call_kernel_v2(ac, plan, scal, ab, b_panel, **kw)
        assert np.array_equal(np.asarray(v1), np.asarray(v2))
        assert np.array_equal(np.asarray(n1), np.asarray(n2))


def test_kernel_v3_windowed_matches_v1(rng, monkeypatch):
    """r4: the windowed row-batch kernel (one call, contiguous window
    DMAs) must match the per-(row, slot) gather kernel bit-for-bit on
    banded operands, and the public entry must fall back to the chunked
    path when a group's window exceeds the static budget."""
    import jax.numpy as jnp
    from ntpoly_tpu.ops import spgemm_pallas as sp

    monkeypatch.setattr(sp, "V3_MIN_ROWS", 1)   # restore after test
    bs, R, K = 8, 32, 3
    # banded col ids: row r has cols r-1, r, r+1 (clipped)
    ac = np.stack([np.clip(np.arange(R) + d, 0, R - 1)
                   for d in (-1, 0, 1)], axis=1).astype(np.int32)
    ac = np.sort(ac, axis=1)
    # dedup clipped duplicates into EMPTY
    for r in range(R):
        seen = set()
        for s in range(K):
            if int(ac[r, s]) in seen:
                ac[r, s] = sp.EMPTY if hasattr(sp, "EMPTY") else 2**30
            else:
                seen.add(int(ac[r, s]))
    from ntpoly_tpu.config import EMPTY
    ac[ac == 2**30] = EMPTY
    ab = rng.standard_normal((R, K, bs, bs)).astype(np.float32)
    k_out = 8
    plan, occ, _ = sp.structure_plan(jnp.asarray(ac), jnp.asarray(ac),
                                     k_out)
    b_panel = jnp.swapaxes(jnp.asarray(ab), -3, -2).reshape(R, bs, K * bs)
    scal = jnp.stack([jnp.float32(1.0), jnp.float32(0.0)])
    v1, n1 = sp._call_kernel(jnp.asarray(ac), plan, scal,
                             jnp.asarray(ab), b_panel, kb=K, nbk=R,
                             k_out=k_out, interpret=True,
                             out_dt=jnp.dtype(jnp.float32))
    g, w = sp._v3_pick(K, K, k_out, bs, 4, 4, R, R,
                       interpret=True)
    assert g is not None
    pad = -R % g
    ac_p = np.pad(ac, ((0, pad), (0, 0)), constant_values=EMPTY)
    plan_p = jnp.pad(plan, ((0, pad), (0, 0)), constant_values=k_out)
    ab_p = np.pad(ab, ((0, pad),) + ((0, 0),) * 3)
    wlo, width = sp._v3_window(jnp.asarray(ac_p), g)
    assert int(width) <= w
    v3, n3 = sp._call_kernel_v3(
        jnp.asarray(ac_p), plan_p, wlo, scal, jnp.asarray(ab_p), b_panel,
        kb=K, nbk=R, k_out=k_out, g_rows=g, w=w, precision="highest",
        out_dt=jnp.dtype(jnp.float32), interpret=True)
    assert np.array_equal(np.asarray(v1), np.asarray(v3)[:R])
    assert np.allclose(np.asarray(n1), np.asarray(n3)[:R])

    # public entry, banded: v3 arm picked by the runtime width check
    cc3, cb3, _ = sp.spgemm_pallas(jnp.asarray(ac), jnp.asarray(ab),
                                   jnp.asarray(ac), jnp.asarray(ab),
                                   k_out=k_out, interpret=True)
    # public entry, scrambled cols (window busts the budget): v1 arm
    ac_wide = ac.copy()
    ac_wide[0, 0] = R - 1                 # row 0 references the last row
    ac_wide[0] = np.sort(ac_wide[0])
    cc1, cb1, _ = sp.spgemm_pallas(jnp.asarray(ac_wide),
                                   jnp.asarray(ab),
                                   jnp.asarray(ac), jnp.asarray(ab),
                                   k_out=k_out, interpret=True)
    # reference check for both via the XLA accumulator path
    from ntpoly_tpu.core import bell
    for acx, cc, cb in ((ac, cc3, cb3), (ac_wide, cc1, cb1)):
        ref_c, ref_b = bell.spgemm(
            jnp.asarray(acx), jnp.asarray(ab), jnp.asarray(ac),
            jnp.asarray(ab), col_offset=0, nbc_out=R, k_out=k_out,
            threshold=0.0, alpha=1.0, row_chunk=8)
        d_ref = bell.to_dense(ref_c, ref_b, nbc=R)
        d_got = bell.to_dense(cc, cb, nbc=R)
        assert np.allclose(np.asarray(d_ref), np.asarray(d_got),
                           atol=1e-4)


def test_kernel_v4_band_offsets(rng, monkeypatch):
    """r4: the band kernel (offset-form accumulation into a panel
    accumulator) must match the scatter kernels on banded operands,
    including EMPTY holes inside the band (zero blocks, any position),
    and the public entry must pick it at runtime."""
    import jax.numpy as jnp
    from ntpoly_tpu.config import EMPTY
    from ntpoly_tpu.ops import spgemm_pallas as sp

    monkeypatch.setattr(sp, "V3_MIN_ROWS", 1)   # restore after test
    bs, R, K = 8, 32, 3
    # band cols packed at their rank (what the fills and the kernel's
    # own in-place flushing actually produce): [lo, lo+1, ...] + EMPTY
    ac = np.full((R, K), EMPTY, np.int32)
    for r in range(R):
        lo = max(0, r - 1)
        cols = [c for c in range(lo, lo + K) if c <= min(R - 1, r + 1)]
        ac[r, :len(cols)] = cols
    ab = rng.standard_normal((R, K, bs, bs)).astype(np.float32)
    # punch EMPTY holes into the operand (flushed slots: zero block +
    # EMPTY id, anywhere in the row)
    holes = rng.random((R, K)) < 0.2
    ac_h = np.where(holes, EMPTY, ac)
    ab_h = np.where(holes[..., None, None], 0.0, ab)
    k_out = 8
    gg0, occ0, ok = sp.band_plan(jnp.asarray(ac_h), jnp.asarray(ac_h),
                                 k_out)
    assert bool(ok)
    cc4, cb4, _ = sp.spgemm_pallas(jnp.asarray(ac_h), jnp.asarray(ab_h),
                                   jnp.asarray(ac_h), jnp.asarray(ab_h),
                                   k_out=k_out, interpret=True)
    from ntpoly_tpu.core import bell
    ref_c, ref_b = bell.spgemm(
        jnp.asarray(ac_h), jnp.asarray(ab_h), jnp.asarray(ac_h),
        jnp.asarray(ab_h), col_offset=0, nbc_out=R, k_out=k_out,
        threshold=0.0, alpha=1.0, row_chunk=8)
    d_ref = np.asarray(bell.to_dense(ref_c, ref_b, nbc=R))
    d_got = np.asarray(bell.to_dense(cc4, cb4, nbc=R))
    assert np.allclose(d_ref, d_got, atol=1e-4)

    # non-contiguous B cols -> band_plan refuses, fallback arm correct
    ac_nc = ac_h.copy()
    ac_nc[5] = [1, 4, 9]                    # gaps: not base + t
    _, _, ok_nc = sp.band_plan(jnp.asarray(ac_nc), jnp.asarray(ac_nc),
                               k_out)
    assert not bool(ok_nc)
    cc1, cb1, _ = sp.spgemm_pallas(jnp.asarray(ac_nc), jnp.asarray(ab_h),
                                   jnp.asarray(ac_nc), jnp.asarray(ab_h),
                                   k_out=k_out, interpret=True)
    ref_c, ref_b = bell.spgemm(
        jnp.asarray(ac_nc), jnp.asarray(ab_h), jnp.asarray(ac_nc),
        jnp.asarray(ab_h), col_offset=0, nbc_out=R, k_out=k_out,
        threshold=0.0, alpha=1.0, row_chunk=8)
    d_ref = np.asarray(bell.to_dense(ref_c, ref_b, nbc=R))
    d_got = np.asarray(bell.to_dense(cc1, cb1, nbc=R))
    assert np.allclose(d_ref, d_got, atol=1e-4)


def test_kernel_v4_capacity_padded_span_traces(rng, monkeypatch):
    """r5 regression: capacity-padded band operands (ka + kb - 1 > span)
    must TRACE — the batched uniform path's static panel writes used to
    overflow the span-narrowed accumulator whenever the capacity padding
    made ka + kb - 1 exceed k_out (the trs4_100k/1m bench shapes: a
    k_out=8 solve over matrices padded to capacity 8 crashed at trace
    time inside lax.cond's band arm even though the runtime pick falls
    back).  Slots with s + kb > span are EMPTY by band_plan.span_ok and
    are skipped."""
    import jax.numpy as jnp
    from ntpoly_tpu.config import EMPTY
    from ntpoly_tpu.ops import spgemm_pallas as sp

    monkeypatch.setattr(sp, "V3_MIN_ROWS", 1)
    bs, R, K = 8, 32, 8                  # capacity 8, two valid slots
    ac = np.full((R, K), EMPTY, np.int32)
    ab = np.zeros((R, K, bs, bs), np.float32)
    for r in range(R):
        cols = [c for c in (r, r + 1) if c < R]
        ac[r, :len(cols)] = cols
        ab[r, :len(cols)] = rng.standard_normal(
            (len(cols), bs, bs)).astype(np.float32)
    k_out = 8                            # < ka + kb - 1 = 15
    cc, cb, _ = sp.spgemm_pallas(jnp.asarray(ac), jnp.asarray(ab),
                                 jnp.asarray(ac), jnp.asarray(ab),
                                 k_out=k_out, interpret=True)
    from ntpoly_tpu.core import bell
    ref_c, ref_b = bell.spgemm(
        jnp.asarray(ac), jnp.asarray(ab), jnp.asarray(ac),
        jnp.asarray(ab), col_offset=0, nbc_out=R, k_out=k_out,
        threshold=0.0, alpha=1.0, row_chunk=8)
    d_ref = np.asarray(bell.to_dense(ref_c, ref_b, nbc=R))
    d_got = np.asarray(bell.to_dense(cc, cb, nbc=R))
    assert np.allclose(d_ref, d_got, atol=1e-4)


def test_band_mode_force_and_violation(rng, monkeypatch):
    """r4: band_mode='force' compiles only the band arm; a violated
    band assumption poisons the fill count (detected by the caller's
    overflow machinery) instead of silently clipping."""
    import jax.numpy as jnp
    from ntpoly_tpu.config import EMPTY
    from ntpoly_tpu.ops import spgemm_pallas as sp

    monkeypatch.setattr(sp, "V3_MIN_ROWS", 1)   # restore after test
    bs, R, K = 8, 32, 3
    ac = np.full((R, K), EMPTY, np.int32)
    for r in range(R):
        lo = max(0, r - 1)
        cols = [c for c in range(lo, lo + K) if c <= min(R - 1, r + 1)]
        ac[r, :len(cols)] = cols
    ab = rng.standard_normal((R, K, bs, bs)).astype(np.float32)
    k_out = 8
    cc_a, cb_a, u_a = sp.spgemm_pallas(
        jnp.asarray(ac), jnp.asarray(ab), jnp.asarray(ac),
        jnp.asarray(ab), k_out=k_out, interpret=True)
    cc_f, cb_f, u_f = sp.spgemm_pallas(
        jnp.asarray(ac), jnp.asarray(ab), jnp.asarray(ac),
        jnp.asarray(ab), k_out=k_out, interpret=True, band_mode="force")
    assert np.array_equal(np.asarray(cc_a), np.asarray(cc_f))
    assert np.array_equal(np.asarray(cb_a), np.asarray(cb_f))
    assert np.array_equal(np.asarray(u_a), np.asarray(u_f))
    # violation: non-contiguous cols — forced mode poisons ucnt
    ac_nc = ac.copy()
    ac_nc[5] = [1, 4, 9]
    _, _, u_v = sp.spgemm_pallas(
        jnp.asarray(ac_nc), jnp.asarray(ab), jnp.asarray(ac_nc),
        jnp.asarray(ab), k_out=k_out, interpret=True, band_mode="force")
    assert int(jnp.max(u_v)) >= EMPTY

    # method='pallas_band' through the distributed layer raises via the
    # overflow machinery on violation
    import jax
    from ntpoly_tpu.parallel import pmatrix as PM, algebra as alg
    from ntpoly_tpu.parallel.grid import ProcessGrid
    from ntpoly_tpu.utils.errors import NTPolyError
    grid = ProcessGrid(1, 1, 1)
    dim = 64
    m = PM.banded(dim, 7, lambda i, j: 1.0 / (1.0 + abs(i - j)), bs=8,
                  grid=grid)
    c1 = alg.matmul(m, m, threshold=0.0, method="pallas_band",
                    k_out=int(alg.fill_bound(m, m)),
                    on_overflow="truncate")
    c2 = alg.matmul(m, m, threshold=0.0, method="pallas",
                    k_out=int(alg.fill_bound(m, m)),
                    on_overflow="truncate")
    assert np.allclose(np.asarray(PM.to_dense(c1)),
                       np.asarray(PM.to_dense(c2)), atol=1e-5)


def test_band_mode_violation_raises(rng, monkeypatch):
    """r4 review finding: a violated band assumption under
    method='pallas_band' must RAISE in every overflow mode, not regrow
    to cap and return silently wrong values."""
    import pytest as _pytest
    from ntpoly_tpu.ops import spgemm_pallas as sp
    from ntpoly_tpu.parallel import pmatrix as PM, algebra as alg
    from ntpoly_tpu.parallel.grid import ProcessGrid
    from ntpoly_tpu.utils.errors import NTPolyError
    monkeypatch.setattr(sp, "V3_MIN_ROWS", 1)
    grid = ProcessGrid(1, 1, 1)
    dim = 256
    # striped (non-contiguous block cols) pattern: shape passes the v4
    # budgets (small k, k_out >= kb) but band_plan must refuse it
    i = np.arange(dim)
    rows = np.concatenate([i, i, i])
    cols = np.concatenate([i, (i + 16) % dim, (i + 40) % dim])
    vals = np.concatenate([np.full(dim, 2.0), np.ones(dim), np.ones(dim)])
    m = PM.empty(dim, bs=8, grid=grid, dtype=np.float32)
    m = PM.fill_from_triplets(m, rows, cols, vals.astype(np.float32))
    g, w = sp._v3_pick(m.k, m.k, 8, 8, 4, 4, m.nb, m.nb, interpret=True)
    assert g is not None                  # shape IS band-eligible
    _, _, ok = sp.band_plan(m.col_ids[0], m.col_ids[0], 8)
    assert not bool(ok)                   # ...but the pattern is not
    for mode in ("grow", "truncate"):
        with _pytest.raises(NTPolyError, match="band"):
            alg.matmul(m, m, method="pallas_band", k_out=8,
                       on_overflow=mode)


def test_band_mode_force_rejected_shape_warns(rng):
    """ADVICE r4: band_mode='force' on a shape outside the band kernel's
    regime must WARN (no silent fallthrough) — the single-arm promise is
    kept by compiling only the chunked kernel, and the result stays
    correct."""
    import warnings as _warnings
    from ntpoly_tpu.ops import spgemm_pallas as sp

    # NB: shape must differ from every other force-mode test in this
    # file — spgemm_pallas is jitted, and a cached executable traced
    # under a monkeypatched V3_MIN_ROWS would skip the trace-time check
    bs, R, K = 8, 24, 4            # R=24 < V3_MIN_ROWS=128 -> rejected
    ac = np.asarray(
        [[max(0, r - 1) + t for t in range(K)] for r in range(R)],
        np.int32)
    ac = np.where(ac < R, ac, EMPTY)
    ab = rng.standard_normal((R, K, bs, bs)).astype(np.float32)
    with _warnings.catch_warnings(record=True) as got:
        _warnings.simplefilter("always")
        cc, cb, _ = sp.spgemm_pallas(
            jnp.asarray(ac), jnp.asarray(ab), jnp.asarray(ac),
            jnp.asarray(ab), k_out=8, interpret=True, band_mode="force")
    assert any("regime" in str(w.message) for w in got)
    rc, rb = bell.spgemm_candidates(jnp.asarray(ac), jnp.asarray(ab),
                                    jnp.asarray(ac), jnp.asarray(ab),
                                    col_offset=0, k_out=8)
    assert np.allclose(bell.to_dense(cc, cb, nbc=R),
                       bell.to_dense(rc, rb, nbc=R), atol=1e-4)


def test_native_fill_nb_bound():
    """ADVICE r4: blockfill.cpp's packed sort key overflows int64 at
    nb >= 2^21 — fill_blocks must refuse (callers fall back to numpy)."""
    import pytest as _pytest
    from ntpoly_tpu import native

    if not native.available():
        _pytest.skip("native library unavailable")
    z = np.zeros(1, np.int64)
    with _pytest.raises(ValueError, match="2\\^21"):
        native.fill_blocks(z, z, np.zeros(1, np.float32),
                           bs=128, nb=1 << 21, pnb=1 << 21)
