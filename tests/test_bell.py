"""Unit tests for the block-ELL kernel layer (ntpoly_tpu.core.bell).

The reference has no direct unit tests of its Fortran internals — everything
is black-box through Python (SURVEY.md §4).  We additionally test the kernel
layer directly since it carries all numerical behavior.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ntpoly_tpu.core import bell


def rand_block_sparse(rng, nbr, nbc, bs, density=0.4):
    d = rng.random((nbr * bs, nbc * bs))
    mask = rng.random((nbr, nbc)) < density
    return d * np.kron(mask, np.ones((bs, bs)))


@pytest.mark.parametrize("bs", [2, 4])
def test_dense_roundtrip(rng, bs):
    a = rand_block_sparse(rng, 5, 5, bs)
    cols, blocks = bell.from_dense(jnp.asarray(a), bs=bs, k=5)
    assert np.allclose(bell.to_dense(cols, blocks, nbc=5), a)


def test_spgemm_matches_numpy(rng):
    a = rand_block_sparse(rng, 6, 6, 4)
    b = rand_block_sparse(rng, 6, 6, 4)
    ac, ab = bell.from_dense(jnp.asarray(a), bs=4, k=6)
    bc, bb = bell.from_dense(jnp.asarray(b), bs=4, k=6)
    cc, cb = bell.spgemm(ac, ab, bc, bb, col_offset=0, nbc_out=6, k_out=6,
                         row_chunk=2)
    assert np.allclose(bell.to_dense(cc, cb, nbc=6), a @ b)


def test_spgemm_threshold_prunes(rng):
    a = rng.standard_normal((16, 16)) * 0.1
    ac, ab = bell.from_dense(jnp.asarray(a), bs=4, k=4)
    cc, cb = bell.spgemm(ac, ab, ac, ab, col_offset=0, nbc_out=4, k_out=4,
                         threshold=0.05, row_chunk=2)
    d = np.asarray(bell.to_dense(cc, cb, nbc=4))
    ref = a @ a
    kept = np.abs(d) > 0
    assert np.all(np.abs(ref[~kept]) <= 0.05 + 1e-12)
    assert np.allclose(d[kept], ref[kept])


def test_capacity_overflow_keeps_largest(rng):
    a = rand_block_sparse(rng, 4, 4, 2, density=1.0)
    cols, blocks = bell.from_dense(jnp.asarray(a), bs=2, k=2)
    # Only 2 slots per row: the 2 largest-norm blocks of each row survive.
    d = np.asarray(bell.to_dense(cols, blocks, nbc=4))
    for i in range(4):
        row = a[2 * i:2 * i + 2, :].reshape(2, 4, 2)
        norms = np.abs(row).sum(axis=(0, 2))
        keep = np.argsort(-norms)[:2]
        for j in range(4):
            blk = d[2 * i:2 * i + 2, 2 * j:2 * j + 2]
            if j in keep:
                assert np.allclose(blk, a[2 * i:2 * i + 2, 2 * j:2 * j + 2])
            else:
                assert np.all(blk == 0)


def test_merge_combines_duplicates(rng):
    cols = jnp.asarray([[0, 0, 2, 2]], jnp.int32)
    blocks = jnp.asarray(rng.random((1, 4, 2, 2)))
    mc, mb = bell.merge(cols, blocks, k_out=4)
    assert list(np.asarray(mc[0, :2])) == [0, 2]
    assert np.allclose(np.asarray(mb[0, 0]),
                       np.asarray(blocks[0, 0] + blocks[0, 1]))


def test_add_axpy(rng):
    a = rand_block_sparse(rng, 4, 4, 2)
    b = rand_block_sparse(rng, 4, 4, 2)
    ac, ab = bell.from_dense(jnp.asarray(a), bs=2, k=4)
    bc, bb = bell.from_dense(jnp.asarray(b), bs=2, k=4)
    cc, cb = bell.add(ac, ab, bc, bb, alpha=2.0, beta=-3.0)
    assert np.allclose(bell.to_dense(cc, cb, nbc=4), 2 * a - 3 * b)


def test_transpose_via_coo(rng):
    a = rand_block_sparse(rng, 3, 5, 2)
    ac, ab = bell.from_dense(jnp.asarray(a), bs=2, k=5)
    r, c, blks, v = bell.to_block_coo(ac, ab)
    tc, tb = bell.from_block_coo(c, r, bell.transpose_blocks(blks), v,
                                 nbr=5, k=3)
    assert np.allclose(bell.to_dense(tc[0], tb[0], nbc=3), a.T)


def test_complex_ops(rng):
    z = rng.random((8, 8)) + 1j * rng.random((8, 8))
    zc, zb = bell.from_dense(jnp.asarray(z), bs=2, k=4)
    cc, cb = bell.spgemm(zc, zb, zc, zb, col_offset=0, nbc_out=4, k_out=4,
                         row_chunk=2)
    assert np.allclose(bell.to_dense(cc, cb, nbc=4), z @ z)
    assert np.allclose(complex(bell.dot(zc, zb, zc, zb)),
                       np.sum(np.conj(z) * z))


def test_col_abs_sums(rng):
    a = rand_block_sparse(rng, 4, 4, 2)
    ac, ab = bell.from_dense(jnp.asarray(a), bs=2, k=4)
    cs = bell.col_abs_sums(ac, ab, 4)
    assert np.allclose(np.asarray(cs).reshape(-1), np.abs(a).sum(axis=0))


def test_comp_sum_f64_grade(rng):
    """comp_sum (two-float pairwise reduction) resolves an f32 sum to
    ~eps^2 relative — certified against a float64 oracle (the basis of
    the compensated energy-trace tolerance claims in bench trs4_1m)."""
    x64 = jnp.zeros(0).dtype == np.float64
    n = 1_000_003
    x = (rng.standard_normal(n) * 1e3 + 0.7).astype(np.float32)
    ref = np.sum(x.astype(np.float64))
    pair = np.asarray(bell.comp_sum(jnp.asarray(x)), np.float64)
    comp = pair[0] + pair[1]
    plain = float(jnp.sum(jnp.asarray(x)))
    assert abs(comp - ref) <= 1e-10 * abs(ref) + 1e-9
    if not x64:
        # and it must beat the plain f32 sum by orders of magnitude
        assert abs(comp - ref) < 1e-4 * max(abs(plain - ref), 1e-30) \
            or abs(plain - ref) < 1e-9
