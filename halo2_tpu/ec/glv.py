"""GLV endomorphism scalar decomposition for BN254 G1.

BN254 has the efficiently computable endomorphism phi(x, y) = (beta*x, y)
(beta a cube root of unity in Fq) acting as multiplication by lambda (a cube
root of unity in Fr, lambda^2 + lambda + 1 = 0).  Splitting each scalar as

    k = k1 + k2 * lambda  (mod r),   |k1|, |k2| < ~sqrt(r) ~ 2^128

halves the number of Pippenger windows for the MSM (8 windows of c=16 over
2n points instead of 16 over n): the linear sort+scan work is unchanged but
every per-window fixed cost (bucket reduction over 2^c buckets, searchsorted,
tail gathers, kernel dispatches) is paid half as often.

All parameters (beta, lambda, the reduced lattice basis, the Barrett
constant) are derived numerically at first use and verified against the
curve — nothing is hard-coded from literature.  `decompose_host` is the
exact reference; `decompose_batch` is the vectorized device version used by
the MSM (two's-complement 16-bit-limb arithmetic, error of the Barrett
rounding absorbed by the verified magnitude bound).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..field.bn254 import FQ_MOD, FR_MOD
from . import host as ec_host

LIMB_BITS = 16
MASK16 = (1 << 16) - 1

# Barrett shift: t = k * |b| + r//2 < 2^382; with S = 544 the quotient
# estimate floor(t*m / 2^S), m = floor(2^S / r), is exact or one below
# (t / 2^S < 2^-162), so c in {round-1, round}.  The extra slack is folded
# into MAX_MAG below.
BARRETT_S = 544


@dataclass(frozen=True)
class GLVParams:
    beta: int  # cube root of unity in Fq with phi(P) = lambda * P
    lam: int  # matching cube root of unity in Fr
    v1: tuple  # (a1, b1): a1 + b1*lambda = 0 mod r (short)
    v2: tuple  # (a2, b2)
    max_mag: int  # proven bound on |k1|, |k2| including Barrett slack


def _cube_root_of_unity(p: int) -> int:
    assert p % 3 == 1
    e = (p - 1) // 3
    for g in range(2, 100):
        z = pow(g, e, p)
        if z != 1:
            return z
    raise AssertionError("no cube root found")


def _gauss_reduce(u, v):
    """Lagrange-Gauss reduction of a rank-2 integer lattice basis."""

    def norm2(w):
        return w[0] * w[0] + w[1] * w[1]

    u, v = (u, v) if norm2(u) <= norm2(v) else (v, u)
    while True:
        n_u = norm2(u)
        # round(  <u,v> / <u,u> )
        dot = u[0] * v[0] + u[1] * v[1]
        q = (2 * dot + n_u) // (2 * n_u)  # round to nearest
        v = (v[0] - q * u[0], v[1] - q * u[1])
        if norm2(v) >= n_u:
            return u, v
        u, v = v, u


@functools.lru_cache(maxsize=1)
def params() -> GLVParams:
    lam = _cube_root_of_unity(FR_MOD)
    beta = _cube_root_of_unity(FQ_MOD)
    # match beta to lam on the curve: phi(G) = (beta * x, y) must equal
    # lambda * G; the other assignments use the conjugate roots.
    G = ec_host.G1_GEN
    ok = False
    for lam_c in (lam, pow(lam, 2, FR_MOD)):
        target = ec_host.g1_mul(G, lam_c)
        for beta_c in (beta, pow(beta, 2, FQ_MOD)):
            if (G[0] * beta_c % FQ_MOD, G[1]) == target:
                lam, beta = lam_c, beta_c
                ok = True
                break
        if ok:
            break
    assert ok, "no (beta, lambda) pairing matched the curve"

    v1, v2 = _gauss_reduce((FR_MOD, 0), ((-lam) % FR_MOD, 1))
    # decomposition bound per coordinate: k - c1 v1 - c2 v2 with the c_i
    # within 1/2 (rounding) + 1 (Barrett floor slack) of the real solution,
    # so |k1| <= 1.5 (|a1| + |a2|) and |k2| <= 1.5 (|b1| + |b2|)
    mag1 = abs(v1[0]) + abs(v2[0])
    mag2 = abs(v1[1]) + abs(v2[1])
    p = GLVParams(
        beta=beta, lam=lam, v1=v1, v2=v2,
        max_mag=(3 * max(mag1, mag2)) // 2 + 1,
    )
    assert p.max_mag < 1 << 128, hex(p.max_mag)
    # sanity: v_i are lattice vectors
    assert (v1[0] + v1[1] * lam) % FR_MOD == 0
    assert (v2[0] + v2[1] * lam) % FR_MOD == 0
    return p


def decompose_host(k: int):
    """Exact (round-to-nearest) decomposition: returns signed (k1, k2) with
    k1 + k2*lambda = k (mod r)."""
    p = params()
    (a1, b1), (a2, b2) = p.v1, p.v2
    r = FR_MOD
    # solve (c1, c2) ~ k * (v1, v2)^-1; det = a1*b2 - a2*b1 = +-r
    det = a1 * b2 - a2 * b1
    # c1 = round(k * b2 / det), c2 = round(-k * b1 / det)
    def rnd(num, den):
        if den < 0:
            num, den = -num, -den
        return (2 * num + den) // (2 * den)

    c1 = rnd(k * b2, det)
    c2 = rnd(-k * b1, det)
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    assert (k1 + k2 * p.lam - k) % r == 0
    return k1, k2


# ---------------------------------------------------------------------------
# vectorized device decomposition
# ---------------------------------------------------------------------------


def _int_limbs(x: int, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint32)
    for i in range(count):
        out[i] = x & MASK16
        x >>= LIMB_BITS
    assert x == 0
    return out


@functools.lru_cache(maxsize=1)
def _device_consts():
    """Limb tables for decompose_batch, derived from params().

    The rounding quotients are computed against det = +-r normalized to +r:
      c1 = round(k * b2 / det)  ->  sign(b2/det) folded into a flag
    We precompute |b2|, |b1| (the Barrett multiplicands), m = floor(2^S/r),
    and the magnitudes/signs of a1, a2, b1, b2.
    """
    p = params()
    (a1, b1), (a2, b2) = p.v1, p.v2
    det = a1 * b2 - a2 * b1
    assert abs(det) == FR_MOD
    if det < 0:
        # normalize: flip all signs of one coordinate set so det = +r
        a2, b2 = -a2, -b2
        det = a1 * b2 - a2 * b1
        v1n, v2n = (a1, b1), (a2, b2)
    else:
        v1n, v2n = (a1, b1), (a2, b2)
    assert det == FR_MOD
    m = (1 << BARRETT_S) // FR_MOD
    consts = {
        "mul1": _int_limbs(abs(b2), 8),  # c1 multiplicand |b2|
        "mul1_neg": b2 < 0,  # c1 = round(k*b2/r): sign of b2
        "mul2": _int_limbs(abs(b1), 8),  # c2 multiplicand |b1|
        "mul2_neg": not (b1 < 0),  # c2 = round(-k*b1/r)
        "half_r": _int_limbs(FR_MOD // 2, 16),
        "m": _int_limbs(m, (BARRETT_S - 254 + 16 + 15) // 16 + 16),
        "a1": abs(v1n[0]),
        "a1_neg": v1n[0] < 0,
        "a2": abs(v2n[0]),
        "a2_neg": v2n[0] < 0,
        "b1": abs(v1n[1]),
        "b1_neg": v1n[1] < 0,
        "b2": abs(v2n[1]),
        "b2_neg": v2n[1] < 0,
    }
    return consts, v1n, v2n


def _mul_const(x, const_limbs, out_limbs: int):
    """[..., La] u32 16-bit limbs times a small constant (python limb list)
    -> [..., out_limbs] canonical 16-bit limbs (truncated mod 2^(16*out)).

    Comba-style: one elementwise product per nonzero constant limb, then each
    output column is a sum of static slices (gather-only — no
    dynamic-update-slice, which XLA lowers to full-array copies).  Column
    sums stay < 2*len(const_limbs)*2^16 < 2^23, within _normalize's bound.
    """
    import jax.numpy as jnp

    from ..field.mont import _normalize

    La = x.shape[-1]
    los, his = {}, {}
    for j, cl in enumerate(const_limbs):
        cl = int(cl)
        if cl == 0 or j >= out_limbs:
            continue
        p = x * np.uint32(cl)  # < 2^32
        los[j] = p & MASK16
        his[j] = p >> LIMB_BITS
    zero = jnp.zeros(x.shape[:-1], dtype=jnp.uint32)
    cols = []
    for k in range(out_limbs):
        acc = None
        for j, lo in los.items():
            i = k - j
            if 0 <= i < La:
                acc = lo[..., i] if acc is None else acc + lo[..., i]
            i -= 1
            if 0 <= i < La:
                acc = his[j][..., i] if acc is None else acc + his[j][..., i]
        cols.append(zero if acc is None else acc)
    return _normalize(jnp.stack(cols, axis=-1), out_limbs)


def _add_limbs(a, b):
    """Canonical 16-bit limb add (same width), mod 2^(16*width)."""
    from ..field.mont import _normalize

    return _normalize(a + b, a.shape[-1])


def _neg_limbs(a):
    """Two's complement negation mod 2^(16*width)."""
    import jax.numpy as jnp

    from ..field.mont import _normalize

    inv = (~a) & MASK16
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return _normalize(inv + one, a.shape[-1])


def decompose_batch(scalars):
    """[n, 16] raw Fr limb scalars -> (k1_mag [n, 16], k1_neg [n],
    k2_mag [n, 16], k2_neg [n]) with k1 + k2*lambda = k (mod r) and
    magnitudes < 2^128 (top 8 limbs zero).

    Pure jnp (XLA fuses the limb arithmetic); runs on any backend.
    """
    import jax.numpy as jnp

    consts, v1n, v2n = _device_consts()
    n = scalars.shape[0]

    def quotient(mult_limbs):
        # t = k * |mult| + r//2  (26 limbs is plenty: < 2^382 + r)
        t = _mul_const(scalars, list(mult_limbs), 25)
        t = _add_limbs(
            t,
            jnp.broadcast_to(
                jnp.asarray(
                    np.pad(consts["half_r"], (0, 25 - 16)).astype(np.uint32)
                ),
                t.shape,
            ),
        )
        # q = (t * m) >> S ; keep limbs [S/16, S/16 + 9)
        shift_limbs = BARRETT_S // LIMB_BITS  # 34
        full = _mul_const(t, list(consts["m"]), shift_limbs + 9)
        return full[..., shift_limbs:]  # [n, 9] (magnitude of the rounded c)

    c1 = quotient(consts["mul1"])  # sign: consts["mul1_neg"]
    c2 = quotient(consts["mul2"])  # sign: consts["mul2_neg"]

    W = 16  # work width: 256-bit two's complement

    def signed_term(c_mag, c_neg, coef_mag: int, coef_neg: bool):
        prod = _mul_const(c_mag, list(_int_limbs(coef_mag, 9)), W)
        if c_neg != coef_neg:
            prod = _neg_limbs(prod)
        return prod

    kW = jnp.concatenate(
        [scalars, jnp.zeros((n, W - 16), dtype=jnp.uint32)], axis=-1
    ) if scalars.shape[-1] < W else scalars[..., :W]

    # k1 = k - c1*a1 - c2*a2
    k1 = _add_limbs(
        kW,
        _neg_limbs(
            _add_limbs(
                signed_term(c1, consts["mul1_neg"], consts["a1"], consts["a1_neg"]),
                signed_term(c2, consts["mul2_neg"], consts["a2"], consts["a2_neg"]),
            )
        ),
    )
    # k2 = -(c1*b1 + c2*b2)
    k2 = _neg_limbs(
        _add_limbs(
            signed_term(c1, consts["mul1_neg"], consts["b1"], consts["b1_neg"]),
            signed_term(c2, consts["mul2_neg"], consts["b2"], consts["b2_neg"]),
        )
    )

    def split(v):
        neg = v[..., W - 1] >= (1 << 15)
        mag = jnp.where(neg[..., None], _neg_limbs(v), v)
        return mag, neg

    k1_mag, k1_neg = split(k1)
    k2_mag, k2_neg = split(k2)
    return k1_mag, k1_neg, k2_mag, k2_neg


# ---------------------------------------------------------------------------
# fused Pallas decomposition (the production MSM path)
#
# The jnp version above keeps every ~40-limb intermediate in HBM ([n, L]
# arrays with a tiny minor axis), so at 2^20 scalars it is bandwidth-bound
# (~240 ms on a v5e).  The whole decomposition is ~1,500 u32 multiplies per
# element with zero cross-element communication — one VMEM-resident kernel
# runs it at compute speed.
# ---------------------------------------------------------------------------


def _k_carry(cols, width: int):
    """Serial carry propagation of lazy columns (each < 2^22) into `width`
    canonical 16-bit limbs (mod 2^(16*width))."""
    import jax.numpy as jnp

    out = []
    carry = None
    for k in range(width):
        v = cols[k] if k < len(cols) and cols[k] is not None else None
        if carry is not None:
            v = carry if v is None else v + carry
        if v is None:
            out.append(jnp.zeros_like(cols[0]))
            carry = None
        else:
            out.append(v & MASK16)
            carry = v >> LIMB_BITS
    return out


def _k_mul_const(x, const_ints, out_limbs: int, add_ints=None):
    """Limb-list [*, blocks] times a python-int limb tuple -> `out_limbs`
    canonical limbs (exact mod 2^(16*out)).  Lazy Comba columns: each column
    collects at most 2*min(len(x), #consts) terms < 2^22, well under u32.
    `add_ints` (python limbs) are folded into the columns before the carry
    pass (used for the +r/2 Barrett rounding bias)."""
    import numpy as np

    nx = len(x)
    cols = [None] * out_limbs
    for j, cl in enumerate(const_ints):
        cl = int(cl)
        if cl == 0 or j >= out_limbs:
            continue
        for i in range(min(nx, out_limbs - j)):
            p = x[i] * np.uint32(cl)
            k = i + j
            lo = p & MASK16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < out_limbs:
                hi = p >> LIMB_BITS
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    if add_ints is not None:
        for k, av in enumerate(add_ints):
            av = int(av)
            if av == 0 or k >= out_limbs:
                continue
            cols[k] = np.uint32(av) if cols[k] is None else cols[k] + np.uint32(av)
    ref = next(c for c in cols if c is not None)
    cols = [c if c is not None else jnp.zeros_like(ref) for c in cols]
    return _k_carry(cols, out_limbs)


def _k_add16(a, b):
    return _k_carry([x + y for x, y in zip(a, b)], len(a))


def _k_neg16(a):
    import numpy as np

    inv = [(~x) & MASK16 for x in a]
    inv[0] = inv[0] + np.uint32(1)
    return _k_carry(inv, len(a))


import jax.numpy as jnp  # noqa: E402  (kernel helpers above use it lazily)


@functools.lru_cache(maxsize=1)
def _decompose_call(rows: int):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..field import vec as fv

    consts, _, _ = _device_consts()
    m_ints = tuple(int(v) for v in consts["m"])
    while m_ints and m_ints[-1] == 0:
        m_ints = m_ints[:-1]
    half_r = tuple(int(v) for v in consts["half_r"])
    shift = BARRETT_S // LIMB_BITS  # 34
    QL = 9  # quotient magnitude < 2^136 -> 9 limbs
    TL = 25  # t = k*|b| + r/2 < 2^384 + 2^253

    def _int_limb_tuple(v: int, count: int):
        return tuple(int(x) for x in _int_limbs(v, count))

    mul1 = tuple(int(v) for v in consts["mul1"])
    mul2 = tuple(int(v) for v in consts["mul2"])
    a1_l = _int_limb_tuple(consts["a1"], 9)
    a2_l = _int_limb_tuple(consts["a2"], 9)
    b1_l = _int_limb_tuple(consts["b1"], 9)
    b2_l = _int_limb_tuple(consts["b2"], 9)

    def kernel(x_ref, k1_ref, n1_ref, k2_ref, n2_ref):
        k16 = [x_ref[i] for i in range(16)]

        def quotient(mult):
            t = _k_mul_const(k16, mult, TL, add_ints=half_r)
            full = _k_mul_const(t, m_ints, shift + QL)
            return full[shift:]

        c1 = quotient(mul1)
        c2 = quotient(mul2)

        def signed_term(c, c_neg: bool, coef, coef_neg: bool):
            prod = _k_mul_const(c, coef, 16)
            return _k_neg16(prod) if (c_neg != coef_neg) else prod

        # k1 = k - c1*a1 - c2*a2 ;  k2 = -(c1*b1 + c2*b2)   (mod 2^256)
        s_a = _k_add16(
            signed_term(c1, consts["mul1_neg"], a1_l, consts["a1_neg"]),
            signed_term(c2, consts["mul2_neg"], a2_l, consts["a2_neg"]),
        )
        k1 = _k_add16(k16, _k_neg16(s_a))
        k2 = _k_neg16(
            _k_add16(
                signed_term(c1, consts["mul1_neg"], b1_l, consts["b1_neg"]),
                signed_term(c2, consts["mul2_neg"], b2_l, consts["b2_neg"]),
            )
        )

        def write(mag_ref, neg_ref, v):
            neg = v[15] >= (1 << 15)
            negv = _k_neg16(v)
            for i in range(16):
                mag_ref[i] = jnp.where(neg, negv[i], v[i])
            neg_ref[0] = neg.astype(jnp.uint32)

        write(k1_ref, n1_ref, k1)
        write(k2_ref, n2_ref, k2)

    bs = pl.BlockSpec(
        (16, fv.SUB, fv.LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    bs_flag = pl.BlockSpec(
        (1, fv.SUB, fv.LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((16, rows, fv.LANES), jnp.uint32)
    fshape = jax.ShapeDtypeStruct((1, rows, fv.LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, fshape, shape, fshape),
        grid=(rows // fv.SUB,),
        in_specs=[bs],
        out_specs=(bs, bs_flag, bs, bs_flag),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def decompose_batch_dev(scalars):
    """decompose_batch through the fused Pallas kernel when the backend is
    TPU (falls back to the portable jnp version elsewhere / on ragged
    sizes).  Same contract as decompose_batch."""
    from ..field import vec as fv

    n = scalars.shape[0]
    if fv._interpret() or n % fv.GROUP:
        return decompose_batch(scalars)
    V = fv.to_vec(scalars)
    k1m, k1n, k2m, k2n = _decompose_call(V.shape[1])(V)
    return (
        fv.from_vec(k1m, n),
        k1n.reshape(-1)[:n] != 0,
        fv.from_vec(k2m, n),
        k2n.reshape(-1)[:n] != 0,
    )


@functools.lru_cache(maxsize=1)
def _decompose_phi_call(rows: int):
    """Decomposition + endomorphism point map in ONE VMEM pass.

    Inputs (vec layout [16, rows, 128]): scalars (raw Fr), PX, PY (Mont Fq).
    Outputs: k1 mag, k2 mag (signs folded into the Ys), beta*PX, Y1, Y2 with
    Y_i = -Y when k_i < 0.  The MSM then runs over the concatenated stream
    [P, phi(P)] with scalars [k1, k2] — no portable-layer field ops on the
    128 MB point arrays."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..field import vec as fv
    from ..field.mont import FQ

    consts, _, _ = _device_consts()
    m_ints = tuple(int(v) for v in consts["m"])
    while m_ints and m_ints[-1] == 0:
        m_ints = m_ints[:-1]
    half_r = tuple(int(v) for v in consts["half_r"])
    shift = BARRETT_S // LIMB_BITS
    QL, TL = 9, 25

    def _int_limb_tuple(v: int, count: int):
        return tuple(int(x) for x in _int_limbs(v, count))

    mul1 = tuple(int(v) for v in consts["mul1"])
    mul2 = tuple(int(v) for v in consts["mul2"])
    a1_l = _int_limb_tuple(consts["a1"], 9)
    a2_l = _int_limb_tuple(consts["a2"], 9)
    b1_l = _int_limb_tuple(consts["b1"], 9)
    b2_l = _int_limb_tuple(consts["b2"], 9)

    p16, n0inv = fv._field_consts(FQ)
    from ..field.limbs import int_to_mont_limbs
    from ..field.bn254 import FQ_MOD

    beta_mont = tuple(
        int(v) for v in int_to_mont_limbs(params().beta, FQ_MOD)
    )

    def kernel(s_ref, px_ref, py_ref, k1_ref, k2_ref, px2_ref, y1_ref, y2_ref):
        k16 = [s_ref[i] for i in range(16)]

        def quotient(mult):
            t = _k_mul_const(k16, mult, TL, add_ints=half_r)
            return _k_mul_const(t, m_ints, shift + QL)[shift:]

        c1 = quotient(mul1)
        c2 = quotient(mul2)

        def signed_term(c, c_neg: bool, coef, coef_neg: bool):
            prod = _k_mul_const(c, coef, 16)
            return _k_neg16(prod) if (c_neg != coef_neg) else prod

        s_a = _k_add16(
            signed_term(c1, consts["mul1_neg"], a1_l, consts["a1_neg"]),
            signed_term(c2, consts["mul2_neg"], a2_l, consts["a2_neg"]),
        )
        k1 = _k_add16(k16, _k_neg16(s_a))
        k2 = _k_neg16(
            _k_add16(
                signed_term(c1, consts["mul1_neg"], b1_l, consts["b1_neg"]),
                signed_term(c2, consts["mul2_neg"], b2_l, consts["b2_neg"]),
            )
        )

        px = [px_ref[i] for i in range(16)]
        py = [py_ref[i] for i in range(16)]
        beta = [jnp.full_like(px[0], bl) for bl in beta_mont]
        px2 = fv._redc(fv._comba_columns(px, beta), p16, n0inv)
        zero = [jnp.zeros_like(py[0]) for _ in range(16)]
        neg_y = fv._sub_body(zero, py, p16)

        def write_k(ref, v, y_ref):
            neg = v[15] >= (1 << 15)
            negv = _k_neg16(v)
            for i in range(16):
                ref[i] = jnp.where(neg, negv[i], v[i])
                y_ref[i] = jnp.where(neg, neg_y[i], py[i])

        write_k(k1_ref, k1, y1_ref)
        write_k(k2_ref, k2, y2_ref)
        for i in range(16):
            px2_ref[i] = px2[i]

    bs = pl.BlockSpec(
        (16, fv.SUB, fv.LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((16, rows, fv.LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape,) * 5,
        grid=(rows // fv.SUB,),
        in_specs=[bs] * 3,
        out_specs=(bs,) * 5,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def glv_split_device(PX, PY, scalars):
    """[n, 16] point/scalar arrays -> (PXa, PYa, S) each [2n, 16]: the
    concatenated [P, phi(P)] stream with 128-bit magnitudes [k1, k2]
    (signs folded into the Y coordinates).  One fused kernel on TPU; the
    portable jnp path elsewhere."""
    from ..field import mont, vec as fv
    from ..field.mont import FQ

    n = scalars.shape[0]
    if fv._interpret() or n % fv.GROUP:
        k1m, k1n, k2m, k2n = decompose_batch(scalars)
        beta_m = jnp.asarray(mont.const_mont(FQ, params().beta))
        PX2 = mont.mul(FQ, PX, beta_m[None, :])
        negY = mont.neg(FQ, PY)
        PY1 = mont.select(k1n, negY, PY)
        PY2 = mont.select(k2n, negY, PY)
    else:
        Sv, Xv, Yv = fv.to_vec(scalars), fv.to_vec(PX), fv.to_vec(PY)
        k1v, k2v, px2v, y1v, y2v = _decompose_phi_call(Xv.shape[1])(Sv, Xv, Yv)
        k1m, k2m = fv.from_vec(k1v, n), fv.from_vec(k2v, n)
        PX2 = fv.from_vec(px2v, n)
        PY1, PY2 = fv.from_vec(y1v, n), fv.from_vec(y2v, n)
    PXa = jnp.concatenate([PX, PX2], axis=0)
    PYa = jnp.concatenate([PY1, PY2], axis=0)
    S = jnp.concatenate([k1m, k2m], axis=0)
    return PXa, PYa, S
