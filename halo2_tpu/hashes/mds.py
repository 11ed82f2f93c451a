"""Cauchy MDS matrix generation for Poseidon.

Behavioral parity with the reference's vendored generator
(reference: circuits/src/poseidon/primitives/mds.rs:5-102): sample 2T
non-rejected unique elements, mds[i][j] = 1/(x_i + y_j), and the inverse via
Lagrange interpolation (Schechter's Cauchy-inverse theorem on y <- -y).
"""

from __future__ import annotations

from .grain import Grain


def generate_mds(grain: Grain, t: int, select: int = 0):
    p = grain.p
    while True:
        while True:
            vals = [grain.next_field_element_without_rejection() for _ in range(2 * t)]
            if len(set(vals)) == len(vals):
                xs, ys = vals[:t], vals[t:]
                break
        if select != 0:
            select -= 1
            continue
        mds = [[pow((xs[i] + ys[j]) % p, -1, p) for j in range(t)] for i in range(t)]
        break

    # inverse via b_ij = (x_j - y'_i) * A_j(y'_i) * B_i(x_j) with y' = -y
    def lagrange(pts, j, x):
        acc = 1
        for m, pm in enumerate(pts):
            if m == j:
                continue
            acc = acc * ((x - pm) % p) % p
            acc = acc * pow((pts[j] - pm) % p, -1, p) % p
        return acc

    neg_ys = [(-y) % p for y in ys]
    mds_inv = [
        [
            ((xs[j] - neg_ys[i]) % p)
            * lagrange(xs, j, neg_ys[i]) % p
            * lagrange(neg_ys, i, xs[j]) % p
            for j in range(t)
        ]
        for i in range(t)
    ]
    return mds, mds_inv
