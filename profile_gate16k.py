"""Round-4: dense/pallas crossover ABOVE the r3 measurement fence
(r3 VERDICT weak #7: `_pick_method` only considers the dense tier below
dim 4096 because the crossover was measured at 4096 only).

Sweeps dim in {4096, 8192, 16384} x block occupancy {0.5, 0.75, 1.0}
for the dense and pallas tiers.  Slope timing as profile_v4.py (fewer
reps — the dense 16384 multiply alone is ~hundreds of ms).
Writes PROFILE_r04_gate16k.json.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _fill
from ntpoly_tpu.parallel import algebra as alg
from ntpoly_tpu.parallel.grid import ProcessGrid

REPS = 4


def slope_time(make_run):
    t = {}
    for n in (REPS, 3 * REPS):
        fn = make_run(n)
        fn()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        t[n] = min(times)
    return (t[3 * REPS] - t[REPS]) / (2 * REPS)


def time_matmul(h, k_out, method, thr=1e-6):
    def make_run(n):
        # h rides as a jit ARGUMENT: closed-over operands become HLO
        # constants and overflow the tunnel's compile request (413)
        @jax.jit
        def run(hh):
            def step(carry, aa):
                hs = hh.with_data(hh.col_ids, hh.blocks * aa)
                c = alg.matmul(hs, hh, threshold=thr, k_out=k_out,
                               on_overflow="truncate", method=method)
                return carry + c.blocks[0, 0, 0, 0, 0], None
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.linspace(1., 2., n, jnp.float32))
            return tot
        return lambda: run(h)
    return slope_time(make_run)


def banded_occupancy(dim, bs, frac, grid):
    """Block-banded matrix whose per-row block occupancy is frac of the
    full width (the shape of a densifying purification iterate)."""
    nb = dim // bs
    nk = max(1, int(frac * nb))
    rng = np.random.default_rng(11)
    rows = np.repeat(np.arange(nb), nk)
    start = np.maximum(0, np.arange(nb) - nk // 2)
    start = np.minimum(start, nb - nk)
    cols = (start[:, None] + np.arange(nk)[None, :]).reshape(-1)
    # fill each chosen block with bs*2 random entries — block occupancy
    # is what the gate keys on, not element density
    per = bs * 2
    i = (np.repeat(rows * bs, per)
         + rng.integers(0, bs, len(rows) * per))
    j = (np.repeat(cols * bs, per)
         + rng.integers(0, bs, len(cols) * per))
    v = rng.standard_normal(len(i)).astype(np.float32)
    return _fill(dim, bs, grid, i, j, v, k=nk)


def main():
    grid = ProcessGrid(1, 1, 1, devices=jax.devices()[:1])
    bs = 128
    results = {}
    for dim in (4096, 8192, 16384):
        for frac in (0.5, 0.75, 1.0):
            h = banded_occupancy(dim, bs, frac, grid)
            k_out = min(int(alg.fill_bound(h, h)), h.panel_nb)
            row = {}
            for method in ("dense", "pallas"):
                try:
                    row[method] = time_matmul(h, k_out, method) * 1e3
                except Exception as e:
                    row[method] = f"error: {type(e).__name__}"
            results[f"dim{dim}_occ{frac}"] = dict(
                k=int(h.k), k_out=k_out, ms=row)
            print(f"dim={dim} occ={frac}: " + "  ".join(
                f"{m}={v:.2f}ms" if isinstance(v, float) else f"{m}={v}"
                for m, v in row.items()), flush=True)

    with open("PROFILE_r04_gate16k.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PROFILE_r04_gate16k.json", flush=True)


if __name__ == "__main__":
    main()
