"""GWC19 multiopen: one witness commitment per opening point.

Equivalent of the reference's external `ProverGWC`/`VerifierGWC`
(SURVEY.md 2.2; used for with-instance proofs, reference: utils.rs:105-119).

Prover (TPU-first): per point group, polys are Horner-combined with challenge
v on device, the Kate quotient (Q - Q(z))/(X - z) is computed in evaluation
form (batched pointwise + one batch inversion), and committed with the
Lagrange-basis SRS — no sequential synthetic division anywhere.

Verifier: after reading W_j and squeezing u, checks
  e(sum_j u^j W_j, [s]_2) == e(sum_j u^j (z_j W_j + F_j - r_j G), [1]_2)
with one shared final exponentiation.
"""

from __future__ import annotations

import numpy as np

from ..ec import host as ec_host
from ..ec.pairing import pairing_product_is_one
from ..field.bn254 import FR_MOD
from ..field.limbs import mont_limbs_to_int
from ..poly import fft
from ..poly.ops import (
    eval_polys_at,
    kate_divide_eval,
    linear_combine,
    scalar_mont,
    z_minus_omega_inverses,
)


def _group_queries(queries):
    """Group by point, preserving first-occurrence order of points.

    Queries are (label, poly_or_commitment, point, eval)."""
    order = []
    groups = {}
    for (_label, obj, point, ev) in queries:
        if point not in groups:
            groups[point] = []
            order.append(point)
        groups[point].append((obj, point, ev))
    return [(p, groups[p]) for p in order]


def open_gwc(params, transcript, queries, k: int, omega: int) -> None:
    """queries: list of (label, coeff_poly_device [n,16], point_int, eval_int)."""
    v = transcript.squeeze_challenge()
    v_m = scalar_mont(v)
    import jax.numpy as jnp
    from ..field import FR, mont

    for point, group in _group_queries(queries):
        # halo2's GWC fold gives query i weight v^i (the LAST query in a
        # group gets the highest power) — Horner over the reversed group.
        # Byte-verified against the Rust wasm prover's witness commitments
        # (round 5: proofs are byte-identical under the mimicked RNG).
        rgroup = list(reversed(group))
        acc = rgroup[0][0]
        for poly, _pt, _ev in rgroup[1:]:
            acc = mont.add(FR, mont.mul(FR, acc, v_m[None, :]), poly)
        # combined eval (host Horner over ints, same weight convention)
        ev = 0
        for _poly, _pt, e in rgroup:
            ev = (ev * v + e) % FR_MOD
        # Kate quotient in evaluation form, committed via Lagrange SRS
        values = fft(acc, k, omega)
        zinv = z_minus_omega_inverses(k, omega, point)
        w_vals = kate_divide_eval(values, scalar_mont(ev), zinv)
        w_commit = params.commit_lagrange_affine(w_vals)
        transcript.write_point(w_commit)


def verify_gwc(params, transcript, queries) -> bool:
    """queries: list of (label, commitment_or_special, point_int, eval_int).

    A commitment may also be given as ("msm", [(point, scalar), ...]) for
    linear combinations the verifier computes itself (e.g. combined h pieces).
    """
    v = transcript.squeeze_challenge()
    groups = _group_queries(queries)
    w_commits = [transcript.read_point() for _ in groups]
    u = transcript.squeeze_challenge()

    lhs_terms = []  # (point, scalar) pairs for sum u^j W_j
    rhs_terms = []
    u_pow = 1
    rhs_scalar_g = 0  # coefficient of G1 generator (from r_j)
    for (point, group), w in zip(groups, w_commits):
        # F_j / r_j: query i carries weight v^i (matches the prover fold)
        f_terms = []  # list of (commitment, scalar)
        r = 0
        for i, (com, _pt, e) in enumerate(group):
            coeff = pow(v, i, FR_MOD)
            if isinstance(com, tuple) and com and com[0] == "msm":
                for pt_i, sc_i in com[1]:
                    f_terms.append((pt_i, sc_i * coeff % FR_MOD))
            else:
                f_terms.append((com, coeff))
            r = (r + e * coeff) % FR_MOD
        lhs_terms.append((w, u_pow))
        rhs_terms.append((w, u_pow * point % FR_MOD))
        for pt_i, sc_i in f_terms:
            rhs_terms.append((pt_i, sc_i * u_pow % FR_MOD))
        rhs_scalar_g = (rhs_scalar_g - r * u_pow) % FR_MOD
        u_pow = u_pow * u % FR_MOD

    rhs_terms.append((ec_host.G1, rhs_scalar_g))
    lhs = _host_msm(lhs_terms)
    rhs = _host_msm(rhs_terms)
    return pairing_product_is_one(
        [(lhs, params.s_g2), (ec_host.g1_neg(rhs), params.g2)]
    )


def _host_msm(terms):
    acc = None
    for pt, sc in terms:
        if pt is None or sc % FR_MOD == 0:
            continue
        acc = ec_host.g1_add(acc, ec_host.g1_mul(pt, sc))
    return acc
