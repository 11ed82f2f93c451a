"""Vanishing-argument quotient construction over the extended coset domain.

Equivalent of the reference's external halo2 `evaluation.rs` + vanishing
argument (SURVEY.md 3.2 phase 5): every gate polynomial and permutation
constraint is evaluated pointwise over the 2^{k+j} coset, folded with powers
of y (value = value*y + expr), and divided by Z_H — all as one fused batched
XLA program; rotations are rolls by rotation * (ext_n / n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, mont
from ..field import vec as fv
from ..field.bn254 import FR_MOD, FR_ZETA
from ..field.limbs import ints_to_mont_limbs
from ..frontend.expression import evaluate
from ..poly.ntt import powers_table
from ..poly.ops import scalar_mont


def _roll_rot(arr, rotation: int, rot_scale: int):
    if rotation == 0:
        return arr
    return jnp.roll(arr, -rotation * rot_scale, axis=0)


def eval_expr_ext(expr, fixed_ext, advice_ext, instance_ext, rot_scale: int, ext_n: int):
    """Evaluate one gate expression over the extended domain (device)."""

    def const(v):
        return jnp.broadcast_to(scalar_mont(v), (1, 16))

    return evaluate(
        expr,
        constant=const,
        fixed=lambda q: _roll_rot(fixed_ext[q.column_index], q.rotation, rot_scale),
        advice=lambda q: _roll_rot(advice_ext[q.column_index], q.rotation, rot_scale),
        instance=lambda q: _roll_rot(instance_ext[q.column_index], q.rotation, rot_scale),
        selector=lambda q: (_ for _ in ()).throw(AssertionError("unfinalized selector")),
        add=lambda a, b: mont.add(FR, a, b),
        mul=lambda a, b: mont.mul(FR, a, b),
        neg=lambda a: mont.neg(FR, a),
        scale=lambda a, s: mont.mul(FR, a, jnp.broadcast_to(scalar_mont(s), (1, 16))),
    )


@functools.lru_cache(maxsize=32)
def _zh_inv_ext(k: int, extended_k: int):
    """1 / Z_H over the extended coset; Z_H(zeta w_ext^i) = zeta^n w_ext^{in} - 1
    cycles with period 2^(extended_k - k)."""
    from ..poly.domain import get_domain

    n = 1 << k
    j = extended_k - k
    dom = get_domain(k, 1 << j)
    cycle = []
    zeta_n = pow(FR_ZETA, n, FR_MOD)
    w_n = pow(dom.extended_omega, n, FR_MOD)
    cur = zeta_n
    for _ in range(1 << j):
        cycle.append((cur - 1) % FR_MOD)
        cur = cur * w_n % FR_MOD
    inv = [pow(v, -1, FR_MOD) for v in cycle]
    tiled = inv * (n)
    return jnp.asarray(ints_to_mont_limbs(tiled[: 1 << extended_k], FR_MOD))


@functools.lru_cache(maxsize=32)
def coset_identity_ext(extended_k: int):
    """Extended values of the identity polynomial X: zeta * w_ext^i."""
    from ..poly.domain import get_domain

    # build as powers table times zeta
    dom_ext_omega = get_domain(extended_k).omega  # omega of the extended size
    pw = powers_table(dom_ext_omega, extended_k)
    zeta_m = scalar_mont(FR_ZETA)
    return mont.mul(FR, pw, zeta_m[None, :])


def quotient_ext(
    pk,
    advice_ext,
    instance_ext,
    z_exts,
    perm_value_exts,
    y: int,
    beta: int,
    gamma: int,
    lookup_exts=(),
    lookup_theta: int = 0,
    mesh=None,
):
    """h over the extended coset (device array [ext_n, 16]).

    perm_value_exts: [P, ext_n, 16] extended values of the permutation
    columns in order; z_exts: list of per-chunk z extended arrays.

    Domains that tile the vec kernel layout run through the fused Pallas
    field kernels (_quotient_ext_vec); small domains use the portable layer.
    Under a mesh the portable body runs SPMD over the sharded domain axis
    (Pallas kernels don't auto-shard), rolls lowering to collectives.
    """
    cs = pk.vk.cs
    dom = pk.vk.domain
    ext_n = dom.extended_n
    if ext_n % fv.GROUP == 0 and mesh is None:
        return _quotient_ext_vec(
            pk, advice_ext, instance_ext, z_exts, perm_value_exts,
            y, beta, gamma, lookup_exts, lookup_theta,
        )
    rot_scale = 1 << (dom.extended_k - dom.k)
    bf = cs.blinding_factors()
    y_m = scalar_mont(y)
    beta_m = scalar_mont(beta)
    gamma_m = scalar_mont(gamma)
    one = jnp.broadcast_to(scalar_mont(1), (1, 16))

    value = jnp.zeros((ext_n, 16), dtype=jnp.uint32)

    def fold(value, expr_val):
        return mont.add(FR, mont.mul(FR, value, y_m[None, :]), expr_val)

    # ---- custom gates ---------------------------------------------------------
    for gate in cs.gates:
        for poly in gate.polys:
            ev = eval_expr_ext(poly, pk.fixed_ext, advice_ext, instance_ext,
                               rot_scale, ext_n)
            ev = jnp.broadcast_to(ev, (ext_n, 16))
            value = fold(value, ev)

    # ---- permutation constraints ------------------------------------------------
    if z_exts:
        chunk_len = cs.permutation_chunk_len()
        l0 = pk.l0_ext
        l_last = pk.l_last_ext
        l_active = pk.l_active_ext
        # l_0 * (1 - z_0)
        value = fold(value, mont.mul(FR, l0, mont.sub(FR, one, z_exts[0])))
        # l_last * (z_l^2 - z_l)
        zl = z_exts[-1]
        value = fold(value, mont.mul(FR, l_last, mont.sub(FR, mont.square(FR, zl), zl)))
        # continuity: l_0 * (z_i - z_{i-1}(w^u X))
        for i in range(1, len(z_exts)):
            prev_at_last = _roll_rot(z_exts[i - 1], -(bf + 1), rot_scale)
            value = fold(value, mont.mul(FR, l0, mont.sub(FR, z_exts[i], prev_at_last)))
        # main product constraint per chunk
        ident_x = coset_identity_ext(dom.extended_k)
        for ci, z in enumerate(z_exts):
            s = ci * chunk_len
            e = min(s + chunk_len, perm_value_exts.shape[0])
            left = _roll_rot(z, 1, rot_scale)  # z(wX)
            right = z
            for j in range(s, e):
                v = perm_value_exts[j]
                sig = pk.sigma_ext[j]
                left = mont.mul(
                    FR,
                    left,
                    mont.add(FR, mont.add(FR, v, mont.mul(FR, sig, beta_m[None, :])),
                             gamma_m[None, :]),
                )
                delta_j = scalar_mont(
                    pow_delta(j)
                )
                id_term = mont.mul(
                    FR, mont.mul(FR, ident_x, beta_m[None, :]), delta_j[None, :]
                )
                right = mont.mul(
                    FR, right, mont.add(FR, mont.add(FR, v, id_term), gamma_m[None, :])
                )
            value = fold(value, mont.mul(FR, l_active, mont.sub(FR, left, right)))

    # ---- lookup constraints -------------------------------------------------------
    if lookup_exts:
        l0 = pk.l0_ext
        l_last = pk.l_last_ext
        l_active = pk.l_active_ext
        theta_m = scalar_mont(lookup_theta)

        def compress_ext(exprs):
            acc = jnp.zeros((1, 16), dtype=jnp.uint32)
            for e in exprs:
                ev = eval_expr_ext(e, pk.fixed_ext, advice_ext, instance_ext,
                                   rot_scale, ext_n)
                acc = mont.add(FR, mont.mul(FR, acc, theta_m[None, :]), ev)
            return jnp.broadcast_to(acc, (ext_n, 16))

        for le, (_name, pairs) in zip(lookup_exts, cs.lookups):
            z = le["z"]
            a_p = le["a_perm"]
            s_p = le["s_perm"]
            # the compressed input/table are EXPRESSIONS evaluated over the
            # extended coset (degree = expression degree), matching what the
            # verifier reconstructs from the query evals at x — NOT the
            # interpolation of the per-row values
            a_comp = compress_ext([i for i, _ in pairs])
            s_comp = compress_ext([t for _, t in pairs])
            # l_0 * (1 - z)
            value = fold(value, mont.mul(FR, l0, mont.sub(FR, one, z)))
            # l_last * (z^2 - z)
            value = fold(
                value, mont.mul(FR, l_last, mont.sub(FR, mont.square(FR, z), z))
            )
            # l_active * (z(wX)(A'+beta)(S'+gamma) - z(X)(A+beta)(S+gamma))
            left = mont.mul(
                FR,
                mont.mul(FR, _roll_rot(z, 1, rot_scale),
                         mont.add(FR, a_p, beta_m[None, :])),
                mont.add(FR, s_p, gamma_m[None, :]),
            )
            right = mont.mul(
                FR,
                mont.mul(FR, z, mont.add(FR, a_comp, beta_m[None, :])),
                mont.add(FR, s_comp, gamma_m[None, :]),
            )
            value = fold(value, mont.mul(FR, l_active, mont.sub(FR, left, right)))
            # l_0 * (A' - S')
            diff = mont.sub(FR, a_p, s_p)
            value = fold(value, mont.mul(FR, l0, diff))
            # l_active * (A' - S') * (A' - A'(w^-1 X))
            a_prev = _roll_rot(a_p, -1, rot_scale)
            value = fold(
                value,
                mont.mul(
                    FR, mont.mul(FR, l_active, diff), mont.sub(FR, a_p, a_prev)
                ),
            )

    # ---- divide by the vanishing polynomial ----------------------------------------
    zh_inv = _zh_inv_ext(dom.k, dom.extended_k)
    return mont.mul(FR, value, zh_inv)


def pow_delta(j: int) -> int:
    from ..field.bn254 import FR_DELTA

    return pow(FR_DELTA, j, FR_MOD)


# ---------------------------------------------------------------------------
# vec-layout quotient: same math as the portable body above, but every bulk
# field op is a fused Pallas kernel over [16, rows, 128] arrays (the portable
# [ext_n, 16] layout leaves the TPU lane axis 87% idle and round-trips HBM
# per op).  Scalars (y, beta, gamma, theta, deltas) ride SMEM.
# ---------------------------------------------------------------------------


def _quotient_ext_vec(
    pk, advice_ext, instance_ext, z_exts, perm_value_exts,
    y, beta, gamma, lookup_exts, lookup_theta,
):
    cs = pk.vk.cs
    dom = pk.vk.domain
    ext_n = dom.extended_n
    rot_scale = 1 << (dom.extended_k - dom.k)
    bf = cs.blinding_factors()
    rows = -(-ext_n // fv.GROUP) * fv.SUB

    lift = fv.to_vec

    def scal(v: int):
        return jnp.asarray(scalar_mont(v))

    y_m, beta_m, gamma_m = scal(y), scal(beta), scal(gamma)
    zero_v = jnp.zeros((16, rows, fv.LANES), dtype=jnp.uint32)

    def broadcast_scalar(s):
        return jnp.broadcast_to(s.reshape(16, 1, 1), (16, rows, fv.LANES))

    def vroll(a, rotation: int):
        if rotation == 0:
            return a
        flat = a.reshape(16, ext_n)
        return jnp.roll(flat, -rotation * rot_scale, axis=1).reshape(
            16, rows, fv.LANES
        )

    def mul_d(a, b):
        if a.ndim == 1 and b.ndim == 1:
            return mont.mul(FR, a[None, :], b[None, :])[0]
        if a.ndim == 1:
            return fv.vscale(FR, b, a)
        if b.ndim == 1:
            return fv.vscale(FR, a, b)
        return fv.vmul(FR, a, b)

    def add_d(a, b):
        if a.ndim == 1 and b.ndim == 1:
            return mont.add(FR, a[None, :], b[None, :])[0]
        if a.ndim == 1:
            return fv.vadd_scalar(FR, b, a)
        if b.ndim == 1:
            return fv.vadd_scalar(FR, a, b)
        return fv.vadd(FR, a, b)

    def neg_d(a):
        if a.ndim == 1:
            return mont.neg(FR, a[None, :])[0]
        return fv.vsub(FR, zero_v, a)

    def sub_d(a, b):
        return fv.vsub(FR, a, b)

    fixed_v = [lift(pk.fixed_ext[i]) for i in range(pk.fixed_ext.shape[0])]
    advice_v = [lift(advice_ext[i]) for i in range(advice_ext.shape[0])]
    instance_v = [lift(instance_ext[i]) for i in range(instance_ext.shape[0])]

    def eval_vec(expr):
        return evaluate(
            expr,
            constant=scal,
            fixed=lambda q: vroll(fixed_v[q.column_index], q.rotation),
            advice=lambda q: vroll(advice_v[q.column_index], q.rotation),
            instance=lambda q: vroll(instance_v[q.column_index], q.rotation),
            selector=lambda q: (_ for _ in ()).throw(
                AssertionError("unfinalized selector")
            ),
            add=add_d,
            mul=mul_d,
            neg=neg_d,
            scale=lambda a, s: mul_d(a, scal(s)),
        )

    value = zero_v

    def fold(value, ev):
        if ev.ndim == 1:
            ev = broadcast_scalar(ev)
        return fv.vfma_scalar(FR, value, y_m, ev)

    # ---- custom gates ---------------------------------------------------------
    for gate in cs.gates:
        for poly in gate.polys:
            value = fold(value, eval_vec(poly))

    # ---- permutation constraints ------------------------------------------------
    if z_exts:
        chunk_len = cs.permutation_chunk_len()
        l0 = lift(pk.l0_ext)
        l_last = lift(pk.l_last_ext)
        l_active = lift(pk.l_active_ext)
        one = scal(1)
        z_v = [lift(z) for z in z_exts]
        # l_0 * (1 - z_0)
        value = fold(
            value, fv.vmul(FR, l0, fv.vsub(FR, broadcast_scalar(one), z_v[0]))
        )
        # l_last * (z_l^2 - z_l)
        zl = z_v[-1]
        value = fold(
            value, fv.vmul(FR, l_last, fv.vsub(FR, fv.vmul(FR, zl, zl), zl))
        )
        # continuity: l_0 * (z_i - z_{i-1}(w^u X))
        for i in range(1, len(z_v)):
            prev_at_last = vroll(z_v[i - 1], -(bf + 1))
            value = fold(
                value, fv.vmul(FR, l0, fv.vsub(FR, z_v[i], prev_at_last))
            )
        # main product constraint per chunk
        ident_x = lift(coset_identity_ext(dom.extended_k))
        sigma_v = [lift(pk.sigma_ext[j]) for j in range(pk.sigma_ext.shape[0])]
        pv_v = [lift(perm_value_exts[j]) for j in range(perm_value_exts.shape[0])]
        for ci, z in enumerate(z_v):
            s = ci * chunk_len
            e = min(s + chunk_len, perm_value_exts.shape[0])
            left = vroll(z, 1)  # z(wX)
            right = z
            for j in range(s, e):
                v = pv_v[j]
                # left *= v + sigma_j * beta + gamma
                t = fv.vfma_scalar(FR, sigma_v[j], beta_m, v)
                left = fv.vmul(FR, left, fv.vadd_scalar(FR, t, gamma_m))
                # right *= v + X * (beta * delta^j) + gamma
                bd = mont.mul(
                    FR, beta_m[None, :], scal(pow_delta(j))[None, :]
                )[0]
                t = fv.vfma_scalar(FR, ident_x, bd, v)
                right = fv.vmul(FR, right, fv.vadd_scalar(FR, t, gamma_m))
            value = fold(value, fv.vmul(FR, l_active, fv.vsub(FR, left, right)))

    # ---- lookup constraints -------------------------------------------------------
    if lookup_exts:
        l0 = lift(pk.l0_ext)
        l_last = lift(pk.l_last_ext)
        l_active = lift(pk.l_active_ext)
        one = scal(1)
        theta_m = scal(lookup_theta)

        def compress_vec(exprs):
            acc = zero_v
            for e in exprs:
                ev = eval_vec(e)
                if ev.ndim == 1:
                    ev = broadcast_scalar(ev)
                acc = fv.vfma_scalar(FR, acc, theta_m, ev)
            return acc

        for le, (_name, pairs) in zip(lookup_exts, cs.lookups):
            z = lift(le["z"])
            a_p = lift(le["a_perm"])
            s_p = lift(le["s_perm"])
            a_comp = compress_vec([i for i, _ in pairs])
            s_comp = compress_vec([t for _, t in pairs])
            # l_0 * (1 - z)
            value = fold(
                value, fv.vmul(FR, l0, fv.vsub(FR, broadcast_scalar(one), z))
            )
            # l_last * (z^2 - z)
            value = fold(
                value, fv.vmul(FR, l_last, fv.vsub(FR, fv.vmul(FR, z, z), z))
            )
            # l_active * (z(wX)(A'+beta)(S'+gamma) - z(X)(A+beta)(S+gamma))
            left = fv.vmul(
                FR,
                fv.vmul(FR, vroll(z, 1), fv.vadd_scalar(FR, a_p, beta_m)),
                fv.vadd_scalar(FR, s_p, gamma_m),
            )
            right = fv.vmul(
                FR,
                fv.vmul(FR, z, fv.vadd_scalar(FR, a_comp, beta_m)),
                fv.vadd_scalar(FR, s_comp, gamma_m),
            )
            value = fold(value, fv.vmul(FR, l_active, fv.vsub(FR, left, right)))
            # l_0 * (A' - S')
            diff = fv.vsub(FR, a_p, s_p)
            value = fold(value, fv.vmul(FR, l0, diff))
            # l_active * (A' - S') * (A' - A'(w^-1 X))
            a_prev = vroll(a_p, -1)
            value = fold(
                value,
                fv.vmul(FR, fv.vmul(FR, l_active, diff), fv.vsub(FR, a_p, a_prev)),
            )

    # ---- divide by the vanishing polynomial ----------------------------------------
    zh_inv = lift(_zh_inv_ext(dom.k, dom.extended_k))
    return fv.from_vec(fv.vmul(FR, value, zh_inv), ext_n)
