"""SHPLONK (BDFG20) multiopen: two witness commitments total.

Equivalent of the reference's external `ProverSHPLONK`/`VerifierSHPLONK`
(SURVEY.md 2.2; used for instance-less proofs, reference: utils.rs:83-90).

Structure (PSE-style, two combination challenges):
  * polys are grouped by their rotation set (the exact set of points each is
    opened at); y combines polys within a set, v combines across sets;
  * W  = [ sum_j v^j (f_j - r_j) / Z_{S_j} ]          (written, then u drawn)
  * L  = sum_j v^j Z_{T\\S_j}(u) (f_j - r_j(u)) - Z_T(u) H;  L(u) = 0
  * W' = [ L / (X - u) ]                               (written)
  * check: e(W', [s]_2) == e(L_commit + u W', [1]_2).

All quotients are computed in evaluation form on device (batched pointwise +
batch inversion); r_j interpolation and the verifier's tiny MSMs are host-side.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ec import host as ec_host
from ..ec.pairing import pairing_product_is_one
from ..field import FR, mont
from ..field.bn254 import FR_MOD
from ..poly import fft
from ..poly.ops import domain_points, scalar_mont


def _collect_sets(queries):
    """-> list of (point_tuple, [(entry, {point: eval})...]) in first-
    occurrence order; polys grouped (by label) by their full point set."""
    per_poly = {}
    poly_order = []
    for (label, entry, point, ev) in queries:
        kk = label
        if kk not in per_poly:
            per_poly[kk] = [entry, {}]
            poly_order.append(kk)
        per_poly[kk][1][point] = ev
    sets = []
    set_index = {}
    for kk in poly_order:
        entry, points = per_poly[kk]
        pts = tuple(sorted(points.keys()))
        if pts not in set_index:
            set_index[pts] = len(sets)
            sets.append((pts, []))
        sets[set_index[pts]][1].append((entry, points))
    return sets


def _interp_coeffs(points_evals) -> list[int]:
    """Lagrange interpolation through [(z, e)] -> coefficient list (host)."""
    pts = list(points_evals)
    m = len(pts)
    coeffs = [0] * m
    for i, (zi, ei) in enumerate(pts):
        # basis poly prod_{j!=i} (X - zj)/(zi - zj)
        basis = [1]
        denom = 1
        for j, (zj, _) in enumerate(pts):
            if j == i:
                continue
            # multiply basis by (X - zj)
            nxt = [0] * (len(basis) + 1)
            for t, c in enumerate(basis):
                nxt[t + 1] = (nxt[t + 1] + c) % FR_MOD
                nxt[t] = (nxt[t] - c * zj) % FR_MOD
            basis = nxt
            denom = denom * (zi - zj) % FR_MOD
        scale = ei * pow(denom, -1, FR_MOD) % FR_MOD
        for t, c in enumerate(basis):
            coeffs[t] = (coeffs[t] + c * scale) % FR_MOD
    return coeffs


def _eval_coeffs(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % FR_MOD
    return acc


def open_shplonk(params, transcript, queries, k: int, omega: int) -> None:
    """queries: (label, coeff_poly_device [n,16], point_int, eval_int)."""
    n = 1 << k
    y = transcript.squeeze_challenge()
    v = transcript.squeeze_challenge()
    y_m = scalar_mont(y)

    sets = _collect_sets(queries)
    pts_dev = domain_points(k, omega)  # [n,16] w^i
    all_points = sorted({p for (pset, _) in sets for p in pset})

    H = None
    f_data = []  # (f_vals_dev, r_coeffs, pset)
    for j, (pset, polys) in enumerate(sets):
        # f_j = sum_i y^i P_i: halo2 zips commitments with powers(y), so the
        # FIRST poly in a set carries y^0 — Horner over the reversed list
        # (same weight convention as the round-5 GWC v fix)
        acc = None
        for (poly, _evals) in reversed(polys):
            vals = fft(poly, k, omega)
            acc = vals if acc is None else mont.add(
                FR, mont.mul(FR, acc, y_m[None, :]), vals
            )
        # combined evals per point -> r_j interpolation
        r_pts = []
        for z in pset:
            e = 0
            for (_poly, evals) in reversed(polys):
                e = (e * y + evals[z]) % FR_MOD
            r_pts.append((z, e))
        r_coeffs = _interp_coeffs(r_pts)
        # r_j over the domain
        r_vals = _eval_coeffs_dev(r_coeffs, pts_dev)
        num = mont.sub(FR, acc, r_vals)
        # divide by Z_S(w^i)
        zs = None
        for z in pset:
            d = mont.sub(FR, pts_dev, scalar_mont(z)[None, :])
            zs = d if zs is None else mont.mul(FR, zs, d)
        hj = mont.mul(FR, num, mont.batch_inv(FR, zs))
        vj = scalar_mont(pow(v, j, FR_MOD))
        term = mont.mul(FR, hj, vj[None, :])
        H = term if H is None else mont.add(FR, H, term)
        f_data.append((acc, r_coeffs, pset))

    transcript.write_point(params.commit_lagrange_affine(H))
    u = transcript.squeeze_challenge()

    # L(X) = sum_j v^j Z_{T\Sj}(u) (f_j - r_j(u)) - Z_T(u) H
    zt_u = 1
    for z in all_points:
        zt_u = zt_u * (u - z) % FR_MOD
    L = None
    for j, (f_vals, r_coeffs, pset) in enumerate(f_data):
        z_rest = 1
        for z in all_points:
            if z not in pset:
                z_rest = z_rest * (u - z) % FR_MOD
        scale = pow(v, j, FR_MOD) * z_rest % FR_MOD
        r_u = _eval_coeffs(r_coeffs, u)
        term = mont.mul(
            FR,
            mont.sub(FR, f_vals, scalar_mont(r_u)[None, :]),
            scalar_mont(scale)[None, :],
        )
        L = term if L is None else mont.add(FR, L, term)
    L = mont.sub(FR, L, mont.mul(FR, H, scalar_mont(zt_u)[None, :]))
    # witness = L / (X - u) in eval form
    denom = mont.sub(FR, pts_dev, scalar_mont(u)[None, :])
    w_vals = mont.mul(FR, L, mont.batch_inv(FR, denom))
    transcript.write_point(params.commit_lagrange_affine(w_vals))


def _eval_coeffs_dev(coeffs: list[int], pts_dev):
    """Evaluate a tiny host poly at all domain points (device)."""
    acc = jnp.broadcast_to(scalar_mont(coeffs[-1]), pts_dev.shape)
    for c in reversed(coeffs[:-1]):
        acc = mont.add(FR, mont.mul(FR, acc, pts_dev), scalar_mont(c)[None, :])
    return acc


def verify_shplonk(params, transcript, queries) -> bool:
    """queries: (label, commitment_or_msm, point, eval)."""
    y = transcript.squeeze_challenge()
    v = transcript.squeeze_challenge()
    W = transcript.read_point()
    u = transcript.squeeze_challenge()
    W2 = transcript.read_point()

    sets = _collect_sets(queries)
    all_points = sorted({p for (pset, _) in sets for p in pset})
    zt_u = 1
    for z in all_points:
        zt_u = zt_u * (u - z) % FR_MOD

    # L_commit = sum_j v^j Z_rest(u) ([f_j] - r_j(u) G) - Z_T(u) W
    terms = []
    g_scalar = 0
    for j, (pset, polys) in enumerate(sets):
        z_rest = 1
        for z in all_points:
            if z not in pset:
                z_rest = z_rest * (u - z) % FR_MOD
        scale = pow(v, j, FR_MOD) * z_rest % FR_MOD
        # [f_j] = sum_i y^i C_i (poly i carries y^i, matching the prover);
        # r_j(u) from the y-combined interpolated evals
        r_pts = {z: 0 for z in pset}
        for i, (com, evals) in enumerate(polys):
            coeff = pow(y, i, FR_MOD) * scale % FR_MOD
            if isinstance(com, tuple) and com and com[0] == "msm":
                for pt_i, sc_i in com[1]:
                    terms.append((pt_i, sc_i * coeff % FR_MOD))
            else:
                terms.append((com, coeff))
        for z in pset:
            e = 0
            for (_com, evals) in reversed(polys):
                e = (e * y + evals[z]) % FR_MOD
            r_pts[z] = e
        r_coeffs = _interp_coeffs(list(r_pts.items()))
        r_u = _eval_coeffs(r_coeffs, u)
        g_scalar = (g_scalar - scale * r_u) % FR_MOD
    terms.append((ec_host.G1, g_scalar))
    terms.append((W, (-zt_u) % FR_MOD))
    # check e(W2, [s]) == e(L + u W2, [1])
    terms_rhs = terms + [(W2, u)]
    rhs = _host_msm(terms_rhs)
    return pairing_product_is_one(
        [(W2, params.s_g2), (ec_host.g1_neg(rhs), params.g2)]
    )


def _host_msm(terms):
    acc = None
    for pt, sc in terms:
        if pt is None or sc % FR_MOD == 0:
            continue
        acc = ec_host.g1_add(acc, ec_host.g1_mul(pt, sc))
    return acc
