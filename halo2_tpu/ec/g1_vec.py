"""BN254 G1 Jacobian ops over the limb-major vec layout (field/vec.py).

Same formulas and edge-case select logic as jax_g1.py (validated against the
host implementation), but every field op is a fused Pallas kernel over
[16, rows, 128] Fq arrays — the compute path of the production MSM.

A point batch is (X, Y, Z) vec arrays; Z == 0 encodes the identity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import vec as fv
from ..field.bn254 import FQ_MOD
from ..field.limbs import int_to_mont_limbs
from ..field.mont import FQ

_ONE_COL = int_to_mont_limbs(1, FQ_MOD).reshape(16, 1, 1)  # [16,1,1] broadcast


def videntity(rows: int):
    one = jnp.broadcast_to(jnp.asarray(_ONE_COL), (16, rows, fv.LANES))
    zero = jnp.zeros((16, rows, fv.LANES), dtype=jnp.uint32)
    return (one, one, zero)


def vis_zero(a):
    """[16, rows, 128] -> bool [rows, 128]."""
    return jnp.all(a == 0, axis=0)


def vselect(cond, P, Q):
    """cond [rows,128] ? P : Q over point tuples."""
    return tuple(jnp.where(cond[None, :, :], a, b) for a, b in zip(P, Q))


def _mul(a, b):
    return fv.vmul(FQ, a, b)


def _sqr(a):
    return fv.vmul(FQ, a, a)


def _add(a, b):
    return fv.vadd(FQ, a, b)


def _sub(a, b):
    return fv.vsub(FQ, a, b)


def _dbl(a):
    return fv.vadd(FQ, a, a)


def vpdouble(P):
    """Jacobian doubling (a = 0 curve), identical math to jax_g1.pdouble."""
    X, Y, Z = P
    A = _sqr(X)
    B = _sqr(Y)
    C = _sqr(B)
    D = _dbl(_sub(_sqr(_add(X, B)), _add(A, C)))
    E = _add(_dbl(A), A)
    F = _sqr(E)
    X3 = _sub(F, _dbl(D))
    eight_c = _dbl(_dbl(_dbl(C)))
    Y3 = _sub(_mul(E, _sub(D, X3)), eight_c)
    Z3 = _dbl(_mul(Y, Z))
    return (X3, Y3, Z3)


def vpadd(P, Q):
    """Full Jacobian addition, identical select logic to jax_g1.padd."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = _sqr(Z1)
    Z2Z2 = _sqr(Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, U1)
    r = _sub(S2, S1)
    HH = _sqr(H)
    HHH = _mul(H, HH)
    V = _mul(U1, HH)
    X3 = _sub(_sub(_sqr(r), HHH), _dbl(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _mul(S1, HHH))
    Z3 = _mul(_mul(Z1, Z2), H)
    out = (X3, Y3, Z3)

    p_inf = vis_zero(Z1)
    q_inf = vis_zero(Z2)
    h_zero = vis_zero(H)
    r_zero = vis_zero(r)
    finite = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    same = jnp.logical_and(jnp.logical_and(h_zero, r_zero), finite)
    opp = jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)), finite)

    out = vselect(same, vpdouble(P), out)
    out = vselect(opp, videntity(Z1.shape[1]), out)
    out = vselect(q_inf, P, out)
    out = vselect(p_inf, Q, out)
    return out


def vpneg(P):
    """(X, Y, Z) -> (X, -Y, Z); identity maps to itself (0 - 0 = 0... -Y of 0
    stays 0 because vsub(0, 0) = 0)."""
    X, Y, Z = P
    zero = jnp.zeros_like(Y)
    return (X, fv.vsub(FQ, zero, Y), Z)


# ---------------------------------------------------------------------------
# fused single-kernel padd: one Pallas call instead of ~28 (the MSM hot op)
# ---------------------------------------------------------------------------

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# only the largest scan levels get a dedicated kernel; smaller arrays use the
# composed-primitive path (compile-time economy; the top levels carry nearly
# all of the work)
FUSED_MIN_ROWS = 256

_ONE16 = tuple(np.uint32(int(v)) for v in int_to_mont_limbs(1, FQ_MOD))


def _padd_body_lists(p, q, p16, n0inv):
    """Full Jacobian add on limb LISTS (each entry one [S,128] block).
    p, q: (x, y, z) triples of 16-limb lists.  Returns (x3, y3, z3) lists."""
    L = fv.L
    (X1, Y1, Z1), (X2, Y2, Z2) = p, q

    def mul(a, b):
        return fv._redc(fv._comba_columns(a, b), p16, n0inv)

    def add(a, b):
        return fv._add_body(a, b, p16)

    def sub(a, b):
        return fv._sub_body(a, b, p16)

    def is_zero(a):
        acc = a[0]
        for v in a[1:]:
            acc = acc | v
        return acc == 0

    def select(cond, a, b):
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(Y1, mul(Z2, Z2Z2))
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = sub(U2, U1)
    r = sub(S2, S1)
    HH = mul(H, H)
    HHH = mul(H, HH)
    V = mul(U1, HH)
    X3 = sub(sub(mul(r, r), HHH), add(V, V))
    Y3 = sub(mul(r, sub(V, X3)), mul(S1, HHH))
    Z3 = mul(mul(Z1, Z2), H)

    # doubling branch (same-point inputs)
    A = mul(X1, X1)
    B = mul(Y1, Y1)
    C = mul(B, B)
    t = sub(mul(add(X1, B), add(X1, B)), add(A, C))
    D = add(t, t)
    E = add(add(A, A), A)
    F = mul(E, E)
    Xd = sub(F, add(D, D))
    c2 = add(C, C)
    c4 = add(c2, c2)
    c8 = add(c4, c4)
    Yd = sub(mul(E, sub(D, Xd)), c8)
    zy = mul(Y1, Z1)
    Zd = add(zy, zy)

    p_inf = is_zero(Z1)
    q_inf = is_zero(Z2)
    h_zero = is_zero(H)
    r_zero = is_zero(r)
    finite = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    same = jnp.logical_and(jnp.logical_and(h_zero, r_zero), finite)
    opp = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)), finite
    )

    ident = [
        [jnp.full_like(X1[0], _ONE16[i]) for i in range(L)],
        [jnp.full_like(X1[0], _ONE16[i]) for i in range(L)],
        [jnp.zeros_like(X1[0]) for _ in range(L)],
    ]
    out = [X3, Y3, Z3]
    dbl = [Xd, Yd, Zd]
    out = [select(same, d, o) for d, o in zip(dbl, out)]
    out = [select(opp, i, o) for i, o in zip(ident, out)]
    out = [select(q_inf, a, o) for a, o in zip([X1, Y1, Z1], out)]
    out = [select(p_inf, b, o) for b, o in zip([X2, Y2, Z2], out)]
    return out


@functools.lru_cache(maxsize=None)
def _vpadd_fused_call(rows: int):
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        p = tuple([ref[i] for i in range(L)] for ref in (x1, y1, z1))
        q = tuple([ref[i] for i in range(L)] for ref in (x2, y2, z2))
        out = _padd_body_lists(p, q, p16, n0inv)
        for i in range(L):
            ox[i] = out[0][i]
            oy[i] = out[1][i]
            oz[i] = out[2][i]

    bs = pl.BlockSpec(
        (L, fv.SUB, fv.LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, rows, fv.LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(rows // fv.SUB,),
        in_specs=[bs] * 6,
        out_specs=(bs, bs, bs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def vpadd_fused(P, Q):
    """vpadd as ONE Pallas kernel (used when the batch is large enough to
    amortize its compile; identical math/edge handling)."""
    rows = P[0].shape[1]
    if fv._interpret() or rows < FUSED_MIN_ROWS or rows % fv.SUB:
        return vpadd(P, Q)
    out = _vpadd_fused_call(rows)(*P, *Q)
    return tuple(out)


def _padd_mixed_body(p, q_xy, p16, n0inv, with_dbl: bool = True):
    """Jacobian += affine (Z2 = 1): 11 mul/sqr vs the full add's 16.

    q is never the identity (MSM inputs are real curve points); p may be
    (prefix could sum to O) and p == q / p == -q are handled like the full
    add.

    with_dbl=False drops the doubling branch (~6 of the 17 mul/sqr): in the
    MSM rank scan the accumulator is a sum of earlier DISTINCT base points,
    so acc == q requires a genuine curve-point collision (or a duplicated
    base point at a chain start) — never the case for SRS point streams.
    The caller gets (out, same_mask) back and must fall back to the safe
    body if the mask ever fires (the nodbl result for such a lane is a
    harmless identity, but wrong)."""
    L = fv.L
    (X1, Y1, Z1) = p
    (X2, Y2) = q_xy

    def mul(a, b):
        return fv._redc(fv._comba_columns(a, b), p16, n0inv)

    def add(a, b):
        return fv._add_body(a, b, p16)

    def sub(a, b):
        return fv._sub_body(a, b, p16)

    def is_zero(a):
        acc = a[0]
        for v in a[1:]:
            acc = acc | v
        return acc == 0

    def select(cond, a, b):
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]

    Z1Z1 = mul(Z1, Z1)
    U2 = mul(X2, Z1Z1)
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = sub(U2, X1)
    r = sub(S2, Y1)
    HH = mul(H, H)
    HHH = mul(H, HH)
    V = mul(X1, HH)
    X3 = sub(sub(mul(r, r), HHH), add(V, V))
    Y3 = sub(mul(r, sub(V, X3)), mul(Y1, HHH))
    Z3 = mul(Z1, H)

    p_inf = is_zero(Z1)
    h_zero = is_zero(H)
    r_zero = is_zero(r)
    finite = jnp.logical_not(p_inf)
    same = jnp.logical_and(jnp.logical_and(h_zero, r_zero), finite)
    opp = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)), finite
    )

    one_list = [jnp.full_like(X1[0], _ONE16[i]) for i in range(L)]
    ident = [one_list, one_list, [jnp.zeros_like(X1[0]) for _ in range(L)]]
    q_jac = [list(X2), list(Y2), one_list]
    out = [X3, Y3, Z3]
    if with_dbl:
        # doubling branch on the AFFINE q (p == q case)
        A = mul(X2, X2)
        B = mul(Y2, Y2)
        C = mul(B, B)
        t = sub(mul(add(X2, B), add(X2, B)), add(A, C))
        D = add(t, t)
        E = add(add(A, A), A)
        F = mul(E, E)
        Xd = sub(F, add(D, D))
        c2 = add(C, C)
        c4 = add(c2, c2)
        c8 = add(c4, c4)
        Yd = sub(mul(E, sub(D, Xd)), c8)
        Zd = add(Y2, Y2)
        dbl = [Xd, Yd, Zd]
        out = [select(same, d, o) for d, o in zip(dbl, out)]
    out = [select(opp, i, o) for i, o in zip(ident, out)]
    out = [select(p_inf, b, o) for b, o in zip(q_jac, out)]
    if with_dbl:
        return out
    return out, same


SCAN_CHUNK = 32


# ---------------------------------------------------------------------------
# single-block butterfly kernels: reduce / scan over <= 64K points with NO
# inter-kernel glue.  These replace the pairwise-recursion tails of the MSM
# (the per-window dispatch storm: ~300 composed-primitive XLA ops for the
# 2^16-bucket sum and the chain-offset scan).
# ---------------------------------------------------------------------------


def _jac_padd_wrap(P, Q, p16, n0inv):
    """_padd_body_lists over (x, y, z) tuples of limb lists."""
    out = _padd_body_lists(tuple(P), tuple(Q), p16, n0inv)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _block_reduce_call(rows: int):
    """Sum of rows*128 Jacobian points in ONE kernel: halve the sublane axis
    until 8 rows remain, then circular-roll butterflies over sublanes and
    lanes (every position ends holding the total).  Input/output
    [16, rows, 128] coordinate triples; identity is Z == 0 padding."""
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L

    def kernel(x, y, z, ox, oy, oz):
        P = tuple([ref[i] for i in range(L)] for ref in (x, y, z))
        r = rows
        while r > 8:
            half = r // 2
            lo = tuple([c[:half] for c in coord] for coord in P)
            hi = tuple([c[half:r] for c in coord] for coord in P)
            P = _jac_padd_wrap(lo, hi, p16, n0inv)
            r = half
        for axis, shifts in ((0, (4, 2, 1)), (1, (64, 32, 16, 8, 4, 2, 1))):
            for s in shifts:
                Q = tuple(
                    [pltpu.roll(c, shift=s, axis=axis) for c in coord]
                    for coord in P
                )
                P = _jac_padd_wrap(P, Q, p16, n0inv)
        for ref, coord in zip((ox, oy, oz), P):
            for i in range(L):
                ref[i] = coord[i]

    bs_in = pl.BlockSpec(
        (fv.L, rows, fv.LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM
    )
    bs_out = pl.BlockSpec(
        (fv.L, 8, fv.LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM
    )
    shape_out = jax.ShapeDtypeStruct((fv.L, 8, fv.LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape_out, shape_out, shape_out),
        in_specs=[bs_in] * 3,
        out_specs=(bs_out, bs_out, bs_out),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


BLOCK_REDUCE_MAX = 512 * fv.LANES  # 64K points in one kernel

REDUCE_STEP_ROWS = 64  # rows per grid step of the chunked reduce


@functools.lru_cache(maxsize=None)
def _block_reduce_grid_call(rows: int, nsteps: int):
    """block_reduce restructured as a sequential grid: each step reduces a
    (16, rows, 128) slab to 8 rows and accumulates into VMEM scratch; the
    last step finishes with the sublane/lane butterfly.  The monolithic
    single-block kernel held the full 38 MB input live in VMEM and measured
    ~20x off its ALU floor at 2^16 points; slab-at-a-time keeps the working
    set ~2 MB."""
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L

    def kernel(x, y, z, ox, oy, oz, ax, ay, az):
        g = pl.program_id(0)
        P = tuple([ref[i] for i in range(L)] for ref in (x, y, z))
        r = rows
        while r > 8:
            half = r // 2
            lo = tuple([c[:half] for c in coord] for coord in P)
            hi = tuple([c[half:r] for c in coord] for coord in P)
            P = _jac_padd_wrap(lo, hi, p16, n0inv)
            r = half

        @pl.when(g == 0)
        def _():
            for ref, coord in zip((ax, ay, az), P):
                for i in range(L):
                    ref[i] = coord[i]

        @pl.when(g > 0)
        def _():
            acc = tuple([ref[i] for i in range(L)] for ref in (ax, ay, az))
            nxt = _jac_padd_wrap(acc, P, p16, n0inv)
            for ref, coord in zip((ax, ay, az), nxt):
                for i in range(L):
                    ref[i] = coord[i]

        @pl.when(g == nsteps - 1)
        def _():
            Q = tuple([ref[i] for i in range(L)] for ref in (ax, ay, az))
            for axis, shifts in ((0, (4, 2, 1)), (1, (64, 32, 16, 8, 4, 2, 1))):
                for s in shifts:
                    R = tuple(
                        [pltpu.roll(c, shift=s, axis=axis) for c in coord]
                        for coord in Q
                    )
                    Q = _jac_padd_wrap(Q, R, p16, n0inv)
            for ref, coord in zip((ox, oy, oz), Q):
                for i in range(L):
                    ref[i] = coord[i]

    bs_in = pl.BlockSpec(
        (fv.L, rows, fv.LANES), lambda g: (0, g, 0), memory_space=pltpu.VMEM
    )
    bs_out = pl.BlockSpec(
        (fv.L, 8, fv.LANES), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
    )
    shape_out = jax.ShapeDtypeStruct((fv.L, 8, fv.LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape_out, shape_out, shape_out),
        grid=(nsteps,),
        in_specs=[bs_in] * 3,
        out_specs=(bs_out, bs_out, bs_out),
        scratch_shapes=[pltpu.VMEM((fv.L, 8, fv.LANES), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def block_reduce(P, m: int):
    """Sum m Jacobian points (flat [16, m] coords, m <= BLOCK_REDUCE_MAX);
    returns flat [16, 1].  Zero (identity) padding."""
    rows = max(8, -(-m // fv.LANES))
    rows = 1 << (rows - 1).bit_length()  # power of two for clean halving
    pad = rows * fv.LANES - m
    coords = tuple(
        jnp.pad(a, ((0, 0), (0, pad))).reshape(16, rows, fv.LANES) for a in P
    )
    if rows > REDUCE_STEP_ROWS:
        out = _block_reduce_grid_call(
            REDUCE_STEP_ROWS, rows // REDUCE_STEP_ROWS
        )(*coords)
    else:
        out = _block_reduce_call(rows)(*coords)
    return tuple(a.reshape(16, -1)[:, :1] for a in out)


@functools.lru_cache(maxsize=None)
def _block_scan_call():
    """Inclusive Jacobian prefix scan of 1024 points ([16, 8, 128], order
    pos = row*128 + lane) in ONE kernel: Hillis-Steele over lanes, then
    sublane offsets."""
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L

    def masked_step(P, axis, s, idx):
        Q = tuple(
            [pltpu.roll(c, shift=s, axis=axis) for c in coord] for coord in P
        )
        S = _jac_padd_wrap(P, Q, p16, n0inv)
        keep = idx >= s
        return tuple(
            [jnp.where(keep, a, b) for a, b in zip(cs, cp)]
            for cs, cp in zip(S, P)
        )

    def kernel(x, y, z, ox, oy, oz):
        P = tuple([ref[i] for i in range(L)] for ref in (x, y, z))
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, fv.LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, fv.LANES), 0)
        for s in (1, 2, 4, 8, 16, 32, 64):
            P = masked_step(P, 1, s, lane)
        # per-row totals (lane 127), scanned over rows, shifted exclusive
        tot = tuple(
            [jnp.broadcast_to(c[:, 127:128], (8, fv.LANES)) for c in coord]
            for coord in P
        )
        for s in (1, 2, 4):
            tot = masked_step(tot, 0, s, row)
        excl = tuple(
            [pltpu.roll(c, shift=1, axis=0) for c in coord] for coord in tot
        )
        first = row == 0
        one = jnp.full((8, fv.LANES), 0, dtype=jnp.uint32)
        ident = (
            [jnp.full((8, fv.LANES), _ONE16[i]) for i in range(L)],
            [jnp.full((8, fv.LANES), _ONE16[i]) for i in range(L)],
            [one for _ in range(L)],
        )
        excl = tuple(
            [jnp.where(first, a, b) for a, b in zip(ci, ce)]
            for ci, ce in zip(ident, excl)
        )
        out = _jac_padd_wrap(excl, P, p16, n0inv)
        for ref, coord in zip((ox, oy, oz), out):
            for i in range(L):
                ref[i] = coord[i]

    bs = pl.BlockSpec(
        (fv.L, 8, fv.LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((fv.L, 8, fv.LANES), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        in_specs=[bs] * 3,
        out_specs=(bs, bs, bs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


def block_scan_1024(P):
    """Inclusive prefix scan of exactly 1024 Jacobian points, flat [16, 1024]
    coords (rank = position); returns the same shape."""
    coords = tuple(a.reshape(16, 8, fv.LANES) for a in P)
    out = _block_scan_call()(*coords)
    return tuple(a.reshape(16, 1024) for a in out)


# ---------------------------------------------------------------------------
# rank-major chain scan: consumes the lax.sort payload outputs DIRECTLY.
#
# Chain c owns ranks c*CHUNK + r; rank-major storage [chains, CHUNK] is a
# pure reshape of the sorted rank stream, so there is no stacking copy and
# no HBM-level relayout between the sort and the kernel (measured: the
# jnp.stack of 32 sort outputs alone cost ~11.5 ms per window).  The kernel
# transposes each [blk, CHUNK] limb plane to [CHUNK, sub, 128] in VMEM,
# scans the CHUNK ranks serially (statically unrolled), and writes
# rank-major prefixes back.
# ---------------------------------------------------------------------------

RANK_BLK = 1024  # chains per grid step (sub = 8 sublane rows)


@functools.lru_cache(maxsize=None)
def _rank_scan_call(chunk: int, chains: int, mixed: bool = True,
                    blk: int = RANK_BLK, nodbl: bool = False):
    """Per-chain inclusive scan consuming RANK-MAJOR input (chain c owns
    ranks c*chunk + r at [c, r] — a pure reshape of the sorted rank stream,
    so no stacking/transpose of the 128 MB point data outside the kernel).

    Phase A transposes each [blk, chunk] limb plane to the chained
    [chunk*sub, 128] layout in VMEM scratch; phase B is the serial rank
    loop over pl.ds sublane slices (one padd body, small kernel).  Outputs
    stay CHAINED: chain c = j*blk + s*128 + l holds rank c*chunk + r at
    [:, r*sub + s, j*128 + l].

    nodbl (mixed only) uses the doubling-free mixed body (~35% fewer muls in
    the serial loop) and appends a 4th output [nblocks, sub, 128]: nonzero
    where an acc == q collision invalidated a lane — the caller must then
    recompute through the safe body.
    """
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L
    sub = blk // 128
    ncoord = 2 if mixed else 3
    n_in = ncoord * L
    rows = chunk * sub
    assert not (nodbl and not mixed)

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in : n_in + 3]
        flag_ref = refs[n_in + 3] if nodbl else None
        scratch = refs[n_in + 3 + (1 if nodbl else 0) :]  # ncoord VMEM bufs

        for ci in range(ncoord):
            for i in range(L):
                v = ins[ci * L + i][...]  # [blk, chunk]
                scratch[ci][i] = jnp.transpose(v, (1, 0)).reshape(rows, 128)

        def read(r):
            off = pl.multiple_of(r * sub, sub)
            return tuple(
                jnp.stack([scratch[ci][i, pl.ds(off, sub), :] for i in range(L)])
                for ci in range(ncoord)
            )

        def write(r, acc):
            off = pl.multiple_of(r * sub, sub)
            for ref, coord in zip(outs, acc):
                for i in range(L):
                    ref[i, pl.ds(off, sub), :] = coord[i]

        first = read(0)
        if mixed:
            one = jnp.stack(
                [jnp.full_like(first[0][0], _ONE16[i]) for i in range(L)]
            )
            acc0 = (first[0], first[1], one)
        else:
            acc0 = first
        write(0, acc0)

        def body(r, carry):
            acc = carry[:3]
            cur = read(r)
            pp = tuple([c[i] for i in range(L)] for c in acc)
            qq = tuple([c[i] for i in range(L)] for c in cur)
            if nodbl:
                out, same = _padd_mixed_body(pp, qq, p16, n0inv, with_dbl=False)
            elif mixed:
                out = _padd_mixed_body(pp, qq, p16, n0inv)
            else:
                out = _padd_body_lists(pp, qq, p16, n0inv)
            nxt = tuple(jnp.stack(c) for c in out)
            write(r, nxt)
            if nodbl:
                return nxt + (carry[3] | same.astype(jnp.uint32),)
            return nxt

        if nodbl:
            acc0 = acc0 + (jnp.zeros((sub, 128), dtype=jnp.uint32),)
        fin = jax.lax.fori_loop(1, chunk, body, acc0)
        if nodbl:
            flag_ref[0] = fin[3]

    nblocks = chains // blk
    in_bs = pl.BlockSpec((blk, chunk), lambda j: (j, 0), memory_space=pltpu.VMEM)
    out_bs = pl.BlockSpec(
        (L, rows, 128), lambda j: (0, 0, j), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, rows, nblocks * 128), jnp.uint32)
    out_shapes = (shape, shape, shape)
    out_specs = (out_bs, out_bs, out_bs)
    if nodbl:
        flag_bs = pl.BlockSpec(
            (1, sub, 128), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        )
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((nblocks, sub, 128), jnp.uint32),
        )
        out_specs = out_specs + (flag_bs,)
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(nblocks,),
        in_specs=[in_bs] * n_in,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((L, rows, 128), jnp.uint32)] * ncoord,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


@functools.lru_cache(maxsize=None)
def _rows_prep_call(chunk: int, nblocks: int, nplanes: int = 16):
    """Sorted rank streams -> the rows-scan layout, on the Mosaic transpose
    unit.  Input planes [nblocks, 1024, chunk] (chain-major per block, a pure
    reshape of the [n] sorted stream); output [nblocks, chunk*8, 128] with
    position [b, r*8+s, l] = rank (b*1024 + s*128 + l)*chunk + r.  Replaces
    the XLA reshape/swapaxes path, which ran ~36x off HBM bandwidth
    (measured 12 ms/window at n=2^21 for 268 MB of traffic)."""

    def kernel(*refs):
        ins, outs = refs[:nplanes], refs[nplanes:]
        for j in range(nplanes):
            v = ins[j][0]  # (1024, chunk)
            t = jnp.transpose(v, (1, 0))  # (chunk, 1024)
            outs[j][0] = t.reshape(chunk * 8, 128)

    in_bs = pl.BlockSpec((1, 1024, chunk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out_bs = pl.BlockSpec((1, chunk * 8, 128), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((nblocks, chunk * 8, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape,) * nplanes,
        grid=(nblocks,),
        in_specs=[in_bs] * nplanes,
        out_specs=(out_bs,) * nplanes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def rows_prep_fused(planes, nblocks: int, chunk: int):
    """[n]-shaped sorted planes -> rows-scan layout via ONE Pallas kernel."""
    ins = [p.reshape(nblocks, 1024, chunk) for p in planes]
    return list(_rows_prep_call(chunk, nblocks, len(planes))(*ins))


@functools.lru_cache(maxsize=None)
def _rank_scan_rows_call(chunk: int, nblocks: int, nodbl: bool = False):
    """Row-major chain scan over PACKED limb planes.

    Input: 16 planes [nblocks, chunk*8, 128] u32, plane j holding limbs
    (2j, 2j+1) packed lo|hi<<16 — j < 8 the affine X, j >= 8 the affine Y of
    the digit-sorted point stream.  Position [b, r*8+s, l] = rank
    (b*1024 + s*128 + l)*chunk + r, i.e. each of the 1024 chains of a block
    owns `chunk` CONTIGUOUS ranks and rank-step r of all chains is ONE
    aligned (8, 128) sublane tile: the serial loop reads/writes whole tiles
    with zero in-kernel relayout (the [chains, chunk] -> [chunk*8, 128]
    transpose runs OUTSIDE as one XLA transpose per plane, bandwidth-bound,
    instead of the previous kernel's per-block VMEM transposes + per-step
    sublane stacking — the reason the old scan ran ~10x off its ALU floor).

    Output: ONE fused array [24, nblocks, chunk*8, 128] of packed prefix
    planes (X, Y, Z accumulator limbs, same inner layout) — fused so the
    bucket-tail reads downstream are a single gather over its flat view;
    nodbl appends a flag plane [nblocks, 8, 128] (nonzero where an acc == q
    collision invalidated the doubling-free body).
    """
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L

    def kernel(*refs):
        ins = refs[:16]
        out = refs[16]
        flag_ref = refs[17] if nodbl else None

        def read(r):
            off = pl.multiple_of(r * 8, 8)
            xs, ys = [], []
            for j in range(16):
                v = ins[j][0, pl.ds(off, 8), :]
                (xs if j < 8 else ys).extend([v & 0xFFFF, v >> 16])
            return xs, ys

        def write(r, coords):
            off = pl.multiple_of(r * 8, 8)
            for ci in range(3):
                for j in range(8):
                    out[ci * 8 + j, 0, pl.ds(off, 8), :] = coords[ci][
                        2 * j
                    ] | (coords[ci][2 * j + 1] << 16)

        xs, ys = read(0)
        one = [jnp.full_like(xs[0], _ONE16[i]) for i in range(L)]
        acc0 = (tuple(xs), tuple(ys), tuple(one))
        write(0, acc0)

        def body(r, carry):
            acc = tuple([c[i] for i in range(L)] for c in carry[:3])
            xq, yq = read(r)
            if nodbl:
                out, same = _padd_mixed_body(
                    acc, (xq, yq), p16, n0inv, with_dbl=False
                )
            else:
                out = _padd_mixed_body(acc, (xq, yq), p16, n0inv)
            out = tuple(tuple(c) for c in out)
            write(r, out)
            if nodbl:
                return out + (carry[3] | same.astype(jnp.uint32),)
            return out

        init = acc0
        if nodbl:
            init = acc0 + (jnp.zeros((8, 128), jnp.uint32),)
        fin = jax.lax.fori_loop(1, chunk, body, init)
        if nodbl:
            flag_ref[0] = fin[3]

    bs = pl.BlockSpec(
        (1, chunk * 8, 128), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    # all 24 prefix planes in ONE output array so bucket-tail gathers can
    # run as a single gather op over its flat view
    out_bs = pl.BlockSpec(
        (24, 1, chunk * 8, 128), lambda j: (0, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((24, nblocks, chunk * 8, 128), jnp.uint32),
    )
    out_specs = (out_bs,)
    if nodbl:
        flag_bs = pl.BlockSpec(
            (1, 8, 128), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        )
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.uint32),
        )
        out_specs = out_specs + (flag_bs,)
    import os as _os

    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(nblocks,),
        in_specs=[bs] * 16,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        # CPU-side numeric validation of the kernel body (tests only)
        interpret=bool(_os.environ.get("HALO2_PALLAS_INTERPRET")),
    )


@functools.lru_cache(maxsize=None)
def _offset_add_call(chunk: int, rows: int, lanes: int, sub: int = 8):
    """out[:, r*sub+s, :] = padd(x[:, r*sub+s, :], off[:, s, :]) for every
    r — adds each chain's exclusive offset to its local prefixes."""
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L

    def kernel(x1, y1, z1, fx, fy, fz, ox, oy, oz):
        off = tuple([ref[i] for i in range(L)] for ref in (fx, fy, fz))

        def body(r, _):
            o8 = pl.multiple_of(r * sub, sub)
            cur = tuple(
                [ref[i, pl.ds(o8, sub), :] for i in range(L)]
                for ref in (x1, y1, z1)
            )
            res = _padd_body_lists(off, cur, p16, n0inv)
            for ref, coord in zip((ox, oy, oz), res):
                for i in range(L):
                    ref[i, pl.ds(o8, sub), :] = coord[i]
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    bs = pl.BlockSpec(
        (L, chunk * sub, 128), lambda j: (0, 0, j), memory_space=pltpu.VMEM
    )
    bs_off = pl.BlockSpec((L, sub, 128), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, rows, lanes), jnp.uint32)
    off_shape = jax.ShapeDtypeStruct((L, sub, lanes), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(lanes // 128,),
        in_specs=[bs] * 3 + [bs_off] * 3,
        out_specs=(bs, bs, bs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


@functools.lru_cache(maxsize=None)
def _rank_offset_add_call(chunk: int, chains: int, blk: int = RANK_BLK):
    """out[:, c, r] = padd(off[:, c, 0], x[:, c, r]) — adds each chain's
    exclusive offset to its rank-major local prefixes (lane-1 broadcast)."""
    p16, n0inv = fv._field_consts(FQ)
    L = fv.L

    def kernel(x1, y1, z1, fx, fy, fz, ox, oy, oz):
        off = tuple([ref[i] for i in range(L)] for ref in (fx, fy, fz))
        cur = tuple([ref[i] for i in range(L)] for ref in (x1, y1, z1))
        res = _padd_body_lists(off, cur, p16, n0inv)
        for ref, coord in zip((ox, oy, oz), res):
            for i in range(L):
                ref[i] = coord[i]

    bs = pl.BlockSpec(
        (L, blk, chunk), lambda j: (0, j, 0), memory_space=pltpu.VMEM
    )
    bs_off = pl.BlockSpec(
        (L, blk, 1), lambda j: (0, j, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, chains, chunk), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(chains // blk,),
        in_specs=[bs] * 3 + [bs_off] * 3,
        out_specs=(bs, bs, bs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


# ---------------------------------------------------------------------------
# Per-tile bitonic payload sort (the MSM's bucket-grouping step).
#
# Replaces the GLOBAL XLA sort over the whole window stream — measured ~60%
# of the MSM at 2^20 (ROADMAP round-4 profile: ~31 ms/window for 17 u32
# payload operands through a 2^21-deep network) — with an IN-VMEM bitonic
# sort of independent tiles.  Bucket partial sums are associative across
# tiles, and the cross-tile correction terms cancel exactly in the bucket
# telescope (see msm_vec._msm_window_partials), so grouping only ever needs
# to be tile-local.  The tile lives entirely in VMEM: the only HBM traffic
# is one read + one write of the payload (vs log2(n) round trips for the
# global sort).
#
# Every compare-exchange stage is expressed with jnp.roll on the row or
# lane axis: partner(i) = i ^ s == i + s (bit clear) / i - s (bit set), so
# part = where(bit_s(i), roll(+s), roll(-s)) — no transposes, no
# gather/scatter, just rotates and selects the VPU handles natively.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _tile_sort_call(ntiles: int, rows: int, interpret: bool):
    """Bitonic sort of each tile's rows*128 elements by u32 key, the 16
    packed payload planes riding along (key discarded — bucket boundaries
    come from the digit histogram, not the sorted keys).

    key:     [ntiles, rows, 128] u32 (window digits, values < 2^16)
    payload: [16, ntiles, rows, 128] u32 (packed X|Y limb planes)
    returns  [16, ntiles, rows, 128] u32, tile-locally grouped by key.

    Flat element index within a tile is i = r*128 + l (row-major), matching
    the [n]-stream reshape the downstream rows-scan consumes.
    """
    m = rows * 128
    nbits = m.bit_length() - 1
    assert (1 << nbits) == m and rows >= 8, (ntiles, rows)

    PCHUNK = 4  # payload planes rolled/selected together (bounds VMEM temps)

    def kernel(k_ref, p_ref, o_ref):
        key = k_ref[0]       # [rows, 128]
        pay = [p_ref[g : g + PCHUNK, 0] for g in range(0, 16, PCHUNK)]
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        for k in range(1, nbits + 1):
            # direction = bit k of i (bit nbits is 0 -> final phase ascends)
            if k <= 6:
                desc = (li >> k) & 1
            else:
                desc = (ri >> (k - 7)) & 1
            for sb in range(k - 1, -1, -1):
                if sb >= 7:
                    s, ax = 1 << (sb - 7), 0
                    hi = (ri >> (sb - 7)) & 1
                else:
                    s, ax = 1 << sb, 1
                    hi = (li >> sb) & 1
                hib = hi == 1
                kpart = jnp.where(
                    hib, jnp.roll(key, s, axis=ax), jnp.roll(key, -s, axis=ax)
                )
                # swap out-of-order pairs; on equal keys both sides keep
                # self (consistent, no element duplicated).  Boolean algebra
                # instead of where-over-bool-branches (Mosaic cannot select
                # between i1 vectors)
                flip = (hi ^ desc) == 1
                keep = (hi ^ desc) == 0
                take = (flip & (kpart > key)) | (keep & (kpart < key))
                key = jnp.where(take, kpart, key)
                for g in range(len(pay)):
                    ppart = jnp.where(
                        hib[None],
                        jnp.roll(pay[g], s, axis=ax + 1),
                        jnp.roll(pay[g], -s, axis=ax + 1),
                    )
                    pay[g] = jnp.where(take[None], ppart, pay[g])
        for g in range(len(pay)):
            o_ref[g * PCHUNK : (g + 1) * PCHUNK, 0] = pay[g]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, ntiles, rows, 128), jnp.uint32),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1, rows, 128), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, 1, rows, 128), lambda t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )
