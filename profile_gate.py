"""Measure the SpGEMM dispatch gates on the real chip (VERDICT r3 #4/#10).

1. pallas-vs-XLA gate: time method in {pallas, cand, acc} at
   nb in {16, 32, 64, 128} block-rows (bs=128) on banded operands — r02
   gated pallas on nb/rows >= 64 by assertion, not measurement.
2. dense-branch crossover: time dense vs pallas vs cand at occupancy
   {25%, 50%, 75%, 100%} on a purification-late-iteration-shaped matrix —
   the reference triggers dense at 10% density
   (sparse_includes/GemmMatrix.f90:58-61).

Slope timing (t(3N)-t(N))/2N cancels the tunnel's dispatch floor; operand
scaled per scan step so nothing hoists.  Writes PROFILE_r03_gate.json.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _chain, _fill
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel.grid import ProcessGrid

REPS = 40


def slope_time(make_run):
    t = {}
    for n in (REPS, 3 * REPS):
        fn = make_run(n)
        fn()
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        t[n] = min(times)
    return (t[3 * REPS] - t[REPS]) / (2 * REPS)


def time_matmul(h, k_out, method, thr=1e-6):
    def make_run(n):
        @jax.jit
        def run():
            def step(carry, aa):
                hs = h.with_data(h.col_ids, h.blocks * aa)
                c = alg.matmul(hs, h, threshold=thr, k_out=k_out,
                               on_overflow="truncate", method=method)
                return carry + c.blocks[0, 0, 0, 0, 0], None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
            return tot
        return run
    return slope_time(make_run)


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    bs = 128
    results = {"nb_sweep": {}, "density_sweep": {}}

    # ---- gate 1: shard size (nb) sweep, banded shape -----------------------
    for nb in (16, 32, 64, 128):
        dim = nb * bs
        h = _fill(dim, bs, grid, *_chain(dim, bandwidth=160))
        k_out = int(alg.fill_bound(h, h))
        row = {}
        for method in ("pallas", "cand", "acc"):
            try:
                row[method] = time_matmul(h, k_out, method) * 1e3
            except Exception as e:
                row[method] = f"error: {type(e).__name__}"
        results["nb_sweep"][nb] = dict(k=h.k, k_out=k_out, ms=row)
        print(f"nb={nb:4d} k_out={k_out}: " + "  ".join(
            f"{m}={v:.3f}ms" if isinstance(v, float) else f"{m}={v}"
            for m, v in row.items()), flush=True)

    # ---- gate 2: density sweep (dense branch crossover) --------------------
    nb, dim = 32, 32 * bs
    rng = np.random.default_rng(7)
    for frac in (0.25, 0.5, 0.75, 1.0):
        # random block pattern at the target occupancy, symmetric-ish
        nk = max(1, int(frac * nb))
        rows = np.repeat(np.arange(nb), nk)
        cols = np.concatenate([
            np.sort(rng.choice(nb, nk, replace=False)) for _ in range(nb)])
        bi = rows * bs + rng.integers(0, bs, len(rows))
        bj = cols * bs + rng.integers(0, bs, len(cols))
        # fill each chosen block fully so occupancy == block density
        i = np.repeat(rows * bs, bs * 4) + np.tile(
            rng.integers(0, bs, bs * 4), len(rows))
        j = np.repeat(cols * bs, bs * 4) + np.tile(
            rng.integers(0, bs, bs * 4), len(cols))
        v = rng.standard_normal(len(i)).astype(np.float32)
        h = _fill(dim, bs, grid, i, j, v, k=nk)
        k_out = min(int(alg.fill_bound(h, h)), h.panel_nb)
        row = {}
        for method in ("dense", "pallas", "cand"):
            try:
                row[method] = time_matmul(h, k_out, method) * 1e3
            except Exception as e:
                row[method] = f"error: {type(e).__name__}"
        results["density_sweep"][frac] = dict(k=h.k, k_out=k_out, ms=row)
        print(f"frac={frac:.2f} k={h.k} k_out={k_out}: " + "  ".join(
            f"{m}={v:.3f}ms" if isinstance(v, float) else f"{m}={v}"
            for m, v in row.items()), flush=True)

    with open("PROFILE_r03_gate.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PROFILE_r03_gate.json", flush=True)


if __name__ == "__main__":
    main()
