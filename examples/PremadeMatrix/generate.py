"""Generate the premade Hamiltonian / Overlap pair for this example.

The reference ships static .mtx fixtures
(reference Examples/PremadeMatrix/Hamiltonian.mtx, Overlap.mtx); here they
are synthesized: a banded symmetric Hamiltonian and a diagonally dominant
SPD overlap, the standard shape of a localized-basis quantum chemistry
problem.
"""
import numpy as np


def main(dim=32, out_h="Hamiltonian.mtx", out_s="Overlap.mtx"):
    rng = np.random.default_rng(7)
    h = np.zeros((dim, dim))
    for off in range(4):
        band = rng.standard_normal(dim - off) / (1.0 + 4.0 * off)
        h += np.diag(band, off)
        if off:
            h += np.diag(band, -off)
    s = np.eye(dim)
    for off in range(1, 3):
        band = rng.random(dim - off) * 0.1 / off
        s += np.diag(band, off) + np.diag(band, -off)

    for name, m in ((out_h, h), (out_s, s)):
        i, j = np.nonzero(m)
        with open(name, "w") as f:
            f.write("%%MatrixMarket matrix coordinate real general\n")
            f.write(f"{dim} {dim} {len(i)}\n")
            for r, c, v in zip(i, j, m[i, j]):
                f.write(f"{r + 1} {c + 1} {v:.16e}\n")


if __name__ == "__main__":
    main()
