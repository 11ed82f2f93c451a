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
    # the vec path only pays on TPU: off-TPU its Pallas kernels fall back to
    # composed jnp graphs whose XLA:CPU compiles dwarf the portable body
    # (a k=10 Collatz prove spent hours compiling them on the 1-core box)
    if ext_n % fv.GROUP == 0 and mesh is None and not fv._interpret():
        return _quotient_ext_vec(
            pk, advice_ext, instance_ext, z_exts, perm_value_exts,
            y, beta, gamma, lookup_exts, lookup_theta,
        )
    if (mesh is not None and not fv._interpret()
            and (ext_n // mesh.devices.size) % fv.GROUP == 0):
        # sharded vec path: pre-rolled inputs (rolls lower to collective
        # permutes in the enclosing jit), pointwise Pallas body per shard
        return _quotient_ext_vec(
            pk, advice_ext, instance_ext, z_exts, perm_value_exts,
            y, beta, gamma, lookup_exts, lookup_theta, mesh=mesh,
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


def _collect_rotations(cs):
    """(kind, column_index) -> sorted rotations used by gates + lookups."""
    rots: dict = {}

    def reg(kind, q):
        rots.setdefault((kind, q.column_index), set()).add(q.rotation)

    def walk(expr):
        evaluate(
            expr,
            constant=lambda v: None,
            fixed=lambda q: reg("fixed", q),
            advice=lambda q: reg("advice", q),
            instance=lambda q: reg("instance", q),
            selector=lambda q: None,
            add=lambda a, b: None,
            mul=lambda a, b: None,
            neg=lambda a: None,
            scale=lambda a, sc: None,
        )

    for gate in cs.gates:
        for poly in gate.polys:
            walk(poly)
    for (_name, pairs) in cs.lookups:
        for (inp, tab) in pairs:
            walk(inp)
            walk(tab)
    return {k: sorted(v) for k, v in rots.items()}


def _quotient_ext_vec(
    pk, advice_ext, instance_ext, z_exts, perm_value_exts,
    y, beta, gamma, lookup_exts, lookup_theta, mesh=None,
):
    """Vec-kernel quotient.  All rotations are applied to the INPUT arrays
    up front (they only ever touch inputs, never intermediates), so the
    remaining body is purely pointwise — under `mesh` it runs as a
    shard_map over the domain axis with every Pallas kernel operating on
    its local shard (round-3 review ask #7; the rolls lower to collective
    permutes in the enclosing jit)."""
    cs = pk.vk.cs
    dom = pk.vk.domain
    ext_n = dom.extended_n
    rot_scale = 1 << (dom.extended_k - dom.k)
    bf = cs.blinding_factors()
    chunk_len = cs.permutation_chunk_len() if z_exts else 0

    def scal(v: int):
        return jnp.asarray(scalar_mont(v))

    y_m, beta_m, gamma_m = scal(y), scal(beta), scal(gamma)
    theta_m = scal(lookup_theta)
    one_m = scal(1)

    def pre_roll(arr2d, rot: int):
        if rot == 0:
            return arr2d
        return jnp.roll(arr2d, -rot * rot_scale, axis=0)

    lift = fv.to_vec
    srcs = {"fixed": pk.fixed_ext, "advice": advice_ext,
            "instance": instance_ext}
    rolled = {
        f"{kind}.{col}.{rot}": lift(pre_roll(srcs[kind][col], rot))
        for (kind, col), rr in _collect_rotations(cs).items()
        for rot in rr
    }
    z_in = [
        {"0": lift(z), "1": lift(pre_roll(z, 1)),
         "last": lift(pre_roll(z, -(bf + 1)))}
        for z in z_exts
    ]
    lk_in = [
        {"z": lift(le["z"]), "z1": lift(pre_roll(le["z"], 1)),
         "a": lift(le["a_perm"]), "a_inv": lift(pre_roll(le["a_perm"], -1)),
         "s": lift(le["s_perm"])}
        for le in lookup_exts
    ]
    consts = {
        "zh_inv": lift(_zh_inv_ext(dom.k, dom.extended_k)),
    }
    if z_exts:
        consts.update(
            l0=lift(pk.l0_ext), l_last=lift(pk.l_last_ext),
            l_active=lift(pk.l_active_ext),
            ident_x=lift(coset_identity_ext(dom.extended_k)),
        )
        consts["sigma"] = [
            lift(pk.sigma_ext[j]) for j in range(pk.sigma_ext.shape[0])
        ]
        consts["pv"] = [
            lift(perm_value_exts[j]) for j in range(perm_value_exts.shape[0])
        ]
    elif lookup_exts:
        consts.update(
            l0=lift(pk.l0_ext), l_last=lift(pk.l_last_ext),
            l_active=lift(pk.l_active_ext),
        )

    def body(rolled, z_in, lk_in, consts):
        rows = consts["zh_inv"].shape[1]
        zero_v = jnp.zeros((16, rows, fv.LANES), dtype=jnp.uint32)

        def broadcast_scalar(sv):
            return jnp.broadcast_to(sv.reshape(16, 1, 1), (16, rows, fv.LANES))

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

        def eval_vec(expr):
            return evaluate(
                expr,
                constant=scal,
                fixed=lambda q: rolled[f"fixed.{q.column_index}.{q.rotation}"],
                advice=lambda q: rolled[f"advice.{q.column_index}.{q.rotation}"],
                instance=lambda q: rolled[
                    f"instance.{q.column_index}.{q.rotation}"
                ],
                selector=lambda q: (_ for _ in ()).throw(
                    AssertionError("unfinalized selector")
                ),
                add=add_d,
                mul=mul_d,
                neg=neg_d,
                scale=lambda a, sc: mul_d(a, scal(sc)),
            )

        value = zero_v

        def fold(value, evv):
            if evv.ndim == 1:
                evv = broadcast_scalar(evv)
            return fv.vfma_scalar(FR, value, y_m, evv)

        # ---- custom gates -------------------------------------------------
        for gate in cs.gates:
            for poly in gate.polys:
                value = fold(value, eval_vec(poly))

        # ---- permutation constraints --------------------------------------
        if z_in:
            l0 = consts["l0"]
            l_last = consts["l_last"]
            l_active = consts["l_active"]
            z_v = [zd["0"] for zd in z_in]
            # l_0 * (1 - z_0)
            value = fold(
                value,
                fv.vmul(FR, l0, fv.vsub(FR, broadcast_scalar(one_m), z_v[0])),
            )
            # l_last * (z_l^2 - z_l)
            zl = z_v[-1]
            value = fold(
                value, fv.vmul(FR, l_last, fv.vsub(FR, fv.vmul(FR, zl, zl), zl))
            )
            # continuity: l_0 * (z_i - z_{i-1}(w^u X))
            for i in range(1, len(z_v)):
                prev_at_last = z_in[i - 1]["last"]
                value = fold(
                    value, fv.vmul(FR, l0, fv.vsub(FR, z_v[i], prev_at_last))
                )
            # main product constraint per chunk
            ident_x = consts["ident_x"]
            sigma_v = consts["sigma"]
            pv_v = consts["pv"]
            for ci, zd in enumerate(z_in):
                st = ci * chunk_len
                en = min(st + chunk_len, len(pv_v))
                left = zd["1"]  # z(wX)
                right = zd["0"]
                for j in range(st, en):
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
                value = fold(
                    value, fv.vmul(FR, l_active, fv.vsub(FR, left, right))
                )

        # ---- lookup constraints -------------------------------------------
        if lk_in:
            l0 = consts["l0"]
            l_last = consts["l_last"]
            l_active = consts["l_active"]

            def compress_vec(exprs):
                acc = zero_v
                for e in exprs:
                    evv = eval_vec(e)
                    if evv.ndim == 1:
                        evv = broadcast_scalar(evv)
                    acc = fv.vfma_scalar(FR, acc, theta_m, evv)
                return acc

            for ld, (_name, pairs) in zip(lk_in, cs.lookups):
                z = ld["z"]
                a_p = ld["a"]
                s_p = ld["s"]
                a_comp = compress_vec([i for i, _ in pairs])
                s_comp = compress_vec([t for _, t in pairs])
                # l_0 * (1 - z)
                value = fold(
                    value,
                    fv.vmul(FR, l0, fv.vsub(FR, broadcast_scalar(one_m), z)),
                )
                # l_last * (z^2 - z)
                value = fold(
                    value,
                    fv.vmul(FR, l_last, fv.vsub(FR, fv.vmul(FR, z, z), z)),
                )
                # l_active * (z(wX)(A'+beta)(S'+gamma) - z(X)(A+beta)(S+gamma))
                left = fv.vmul(
                    FR,
                    fv.vmul(FR, ld["z1"], fv.vadd_scalar(FR, a_p, beta_m)),
                    fv.vadd_scalar(FR, s_p, gamma_m),
                )
                right = fv.vmul(
                    FR,
                    fv.vmul(FR, z, fv.vadd_scalar(FR, a_comp, beta_m)),
                    fv.vadd_scalar(FR, s_comp, gamma_m),
                )
                value = fold(
                    value, fv.vmul(FR, l_active, fv.vsub(FR, left, right))
                )
                # l_0 * (A' - S')
                diff = fv.vsub(FR, a_p, s_p)
                value = fold(value, fv.vmul(FR, l0, diff))
                # l_active * (A' - S') * (A' - A'(w^-1 X))
                value = fold(
                    value,
                    fv.vmul(
                        FR,
                        fv.vmul(FR, l_active, diff),
                        fv.vsub(FR, a_p, ld["a_inv"]),
                    ),
                )

        return fv.vmul(FR, value, consts["zh_inv"])

    if mesh is None:
        value = body(rolled, z_in, lk_in, consts)
    else:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..dist.mesh import SHARD_AXIS

        spec = P(None, SHARD_AXIS, None)
        args = (rolled, z_in, lk_in, consts)
        specs = jax.tree_util.tree_map(lambda _: spec, args)
        value = shard_map(
            body, mesh=mesh, in_specs=specs, out_specs=spec,
            check_rep=False,
        )(*args)
    return fv.from_vec(value, ext_n)
