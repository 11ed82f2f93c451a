"""Fused Pallas NTT: recursive four-step with VMEM-resident radix passes.

The production replacement for the reference's external
`halo2_proofs::arithmetic::best_fft` (SURVEY.md 2.2) at bench scale.  The
jnp formulation (poly/ntt.py) launches one XLA elementwise chain per stage
with HBM round-trips between stages; this module instead decomposes

    NTT_n = (NTT_R x I) . twiddle . (I x NTT_C),   n = R * C, R <= 256

where each NTT_R runs entirely inside one Pallas kernel (all R rows of a
128-lane batch block live in VMEM across all log R stages, plus the
cross-level twiddle multiply fused into the same kernel), and the only
HBM-level operations between kernels are an axis transpose and a bit-reverse
row gather.  The recursion bottoms out when the transform length fits one
pass.  Values (and the data layout at the API boundary) are bit-identical to
poly/ntt.py.

Layout: the "vec" limb-major layout of field/vec.py — [16, M, B] uint32 where
axis 1 is the transform axis (sublanes in-kernel) and axis 2 the batch
(lanes).  Use `field.vec.to_vec`/`from_vec` at the boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import vec as fv
from ..field.bn254 import FR_MOD
from ..field.limbs import int_to_mont_limbs
from ..field.mont import FR, FieldSpec
from .ntt import _bitrev_perm

L = fv.L
LANES = fv.LANES
RMAX = 256

# minimum size for the fused path; below this the jnp path (poly/ntt.py) is
# used — small transforms are latency-bound either way.
MIN_FUSED_K = 15


# ---------------------------------------------------------------------------
# host-side tables (cached)
# ---------------------------------------------------------------------------


def _pow_table(base: int, count: int, scale: int = 1) -> np.ndarray:
    """[16, count] Montgomery powers scale * base^i (host bigint, cached use)."""
    out = np.empty((L, count), dtype=np.uint32)
    cur = scale % FR_MOD
    for i in range(count):
        out[:, i] = int_to_mont_limbs(cur, FR_MOD)  # -> cur * R mod p limbs
        cur = cur * base % FR_MOD
    return out


ROLL_STAGES = 3  # stages 1..3 (half < 8) run as full-width sublane rolls


@functools.lru_cache(maxsize=None)
def _stage_twiddles(omega_r: int, R: int):
    """Stage twiddles [16, R, 3].

    Column 0: packed DIT stage twiddles — for stage s (m=2^s), offset
    2^{s-1}-1 holds the 2^{s-1} values omega_r^{j * R/m} (stages half >= 8).
    Columns 1, 2: full per-ROW twiddle tables for roll-stages 2 and 3
    (twrow[r] = omega_r^{(r mod half) * R/m}) — those stages butterfly the
    whole [R, lanes] value with sublane rolls, so the twiddle must be laid
    out per row rather than per packed offset."""
    cols = []
    log_r = R.bit_length() - 1
    for s in range(1, log_r + 1):
        half = 1 << (s - 1)
        step = R >> s
        cols.append(_pow_table(pow(omega_r, step, FR_MOD), half))
    packed = np.concatenate(cols, axis=1)  # [16, R-1]
    packed = np.pad(packed, ((0, 0), (0, R - packed.shape[1])))
    planes = [packed]
    for s in (2, 3):
        col = np.zeros((L, R), dtype=np.uint32)
        if s <= log_r:
            half = 1 << (s - 1)
            w = pow(omega_r, R >> s, FR_MOD)
            row_vals = [_pow_table(1, 1, pow(w, j, FR_MOD))[:, 0] for j in range(half)]
            for r in range(R):
                col[:, r] = row_vals[r % half]
        planes.append(col)
    return np.stack(planes, axis=2)  # [16, R, 3] numpy (safe to cache)


@functools.lru_cache(maxsize=None)
def _cross_twiddles(omega_m: int, R: int, M2: int, scale: int):
    """[16, R, M2] table T[k1, m2] = scale * omega_m^{k1 * m2} (Montgomery)."""
    # rows built as geometric sequences: row k1 is powers of omega_m^{k1}
    rows = []
    for k1 in range(R):
        rows.append(_pow_table(pow(omega_m, k1, FR_MOD), M2, scale))
    return np.stack(rows, axis=1)  # [16, R, M2] numpy (safe to cache)


# ---------------------------------------------------------------------------
# the radix pass kernel
# ---------------------------------------------------------------------------


def _pass_body(x, ts, t, R: int, p16, n0inv, roll=None):
    """Shared math for one radix pass: x = list of 16 [R, nb] limb arrays,
    ts = list of 16 [R, 3] stage-twiddle planes (see _stage_twiddles),
    t = final-twiddle limb list ([R, nb], [R, 1]) or None.

    Decimation-in-time: expects rows pre-permuted to bit-reversed order,
    produces natural-order rows.  (A Gentleman-Sande DIF variant was
    measured 2.5x slower in the butterflies and needed a 147 ms composed
    digit-reversal gather at 2^22; see git history.)

    Stages with half < 8 (m <= 8) butterfly the full [R, nb] value via
    circular sublane rolls + a row mask — the reshape formulation would
    compute on (m, nb) tiles with < 8 sublanes, wasting most of each vreg
    (measured: those stages dominated the pass kernel).  roll(a, shift,
    axis) must behave like jnp.roll (out[i] = in[i - shift])."""
    log_r = R.bit_length() - 1
    nb = x[0].shape[-1]
    for s in range(1, log_r + 1):
        m = 1 << s
        half = m >> 1
        off = half - 1
        if half < 8 and R >= 16 and roll is not None:
            iota = jax.lax.broadcasted_iota(jnp.int32, (R, nb), 0)
            is_lo = (iota % m) < half
            twrow = None
            if s > 1:
                twrow = [v[:, s - 1 : s] for v in ts]  # [R, 1] per-row
            tt = (
                x
                if twrow is None  # stage-1 twiddle is omega^0 = 1
                else fv._redc(fv._comba_columns(x, twrow), p16, n0inv)
            )
            up = [roll(v, -half, 0) for v in tt]  # tt[r + half] at row r
            down = [roll(v, half, 0) for v in x]  # x[r - half] at row r
            e = fv._add_body(x, up, p16)
            o = fv._sub_body(down, tt, p16)
            x = [jnp.where(is_lo, a, b) for a, b in zip(e, o)]
            continue
        lo = [v.reshape(R // m, m, nb)[:, :half, :] for v in x]
        hi = [v.reshape(R // m, m, nb)[:, half:, :] for v in x]
        tw = None
        if s > 1:
            tw = [v[off : off + half, 0:1][None, :, :] for v in ts]  # [1,half,1]
        tt = (
            hi
            if tw is None  # stage-1 twiddle is omega^0 = 1
            else fv._redc(fv._comba_columns(hi, tw), p16, n0inv)
        )
        e = fv._add_body(lo, tt, p16)
        o = fv._sub_body(lo, tt, p16)
        x = [jnp.concatenate([a, b], axis=1).reshape(R, nb) for a, b in zip(e, o)]
    if t is not None:
        x = fv._redc(fv._comba_columns(x, t), p16, n0inv)
    return x


def _jnp_roll(a, shift, axis):
    return jnp.roll(a, shift, axis=axis)


def _pass_jnp(
    spec: FieldSpec, R: int, tw_mode: str, B: int, xb, ts, tw=None,
):
    """XLA fallback for non-TPU backends: same math, full arrays at once."""
    p16, n0inv = fv._field_consts(spec)
    nb = xb.shape[2]
    x = [xb[i] for i in range(L)]
    tsl = [ts[i] for i in range(L)]
    t = None
    if tw_mode == "lanes":
        t = [tw[i] for i in range(L)]  # [R, M2] == [R, nb]
    elif tw_mode == "percol":
        # tw arrives as [L, M2, R, 1]; expand to [R, M2*B] (repeat cols B times)
        t = [
            jnp.repeat(jnp.transpose(tw[i, :, :, 0], (1, 0)), B, axis=1)
            for i in range(L)
        ]
    elif tw_mode == "const":
        t = [tw[i] for i in range(L)]  # [R, 1] broadcasts
    out = _pass_body(x, tsl, t, R, p16, n0inv, roll=_jnp_roll)
    return jnp.stack(out)


@functools.lru_cache(maxsize=None)
def _pass_call(
    spec: FieldSpec, R: int, n_batch: int, tw_mode: str, B: int = 0, M2: int = 0,
    out_t: bool = False,
):
    """One fused kernel: log2(R) DIT butterfly stages along the sublane axis
    plus, unless tw_mode is 'none', the cross-level twiddle multiply.
    Input rows must be pre-permuted to bit-reversed order (an XLA take of a
    256-entry index — Mosaic cannot gather across sublane vregs in-kernel,
    so the take stays outside; its rows are 64 KB contiguous and cheap).

    out_t=True absorbs the inter-level (R, M2) -> (M2, R) transpose into
    the OUTPUT BlockSpec, so the next level reads its natural layout with
    no HBM relayout pass at all:
      'lanes'  — output [L, M2, R]: the kernel transposes its [R, 128]
                 block in VMEM and writes a (L, 128, R) block
      'percol' — output [L, M2, R, B]: pure index-map relayout, the block
                 (L, 1, R, 128) is the kernel's native value

    tw_mode:
      'none'    — plain NTT_R (recursion base case, no extra multiply)
      'lanes'   — T is [16, R, M2] with B == 1: lane-block i gets T cols
                  [i*128, i*128+128) (block (L, R, 128))
      'percol'  — T is [16, R, M2]; the batch axis is (m2-major, b-minor)
                  with B >= 128 lanes per m2: a 2D grid (m2, block) makes the
                  T column a static grid index (block (L, R, 1))
      'const'   — T is [16, R, 1], same column for every block (iNTT scale)
    """
    p16, n0inv = fv._field_consts(spec)
    has_tw = tw_mode != "none"
    assert not out_t or tw_mode in ("lanes", "percol")
    def mosaic_roll(a, shift, axis):
        return pltpu.roll(a, shift=shift % a.shape[axis], axis=axis)

    def kernel(*refs):
        if has_tw:
            x_ref, ts_ref, t_ref, o_ref = refs
        else:
            x_ref, ts_ref, o_ref = refs
        x = [x_ref[i] for i in range(L)]  # each [R, 128]
        ts = [ts_ref[i] for i in range(L)]  # [R, 3]
        if not has_tw:
            t = None
        elif tw_mode == "percol":
            t = [t_ref[i, 0] for i in range(L)]  # 4D T: [R, 1]
        else:
            t = [t_ref[i] for i in range(L)]  # [R, 128] or [R, 1]
        out = _pass_body(x, ts, t, R, p16, n0inv, roll=mosaic_roll)
        if not out_t:
            for i in range(L):
                o_ref[i] = out[i]
        elif tw_mode == "lanes":
            for i in range(L):
                o_ref[i] = jnp.transpose(out[i], (1, 0))  # [128, R]
        else:  # percol: block (L, 1, R, LANES) is the native value
            for i in range(L):
                o_ref[i, 0] = out[i]

    if tw_mode == "percol":
        assert B >= LANES and B % LANES == 0, B
        bpc = B // LANES  # lane-blocks per m2 column
        bs_x = pl.BlockSpec(
            (L, R, LANES), lambda i, j: (0, 0, i * bpc + j), memory_space=pltpu.VMEM
        )
        in_specs = [
            bs_x,
            pl.BlockSpec((L, R, 3), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            # T reshaped to [L, M2, R, 1]: block last-two dims (R, 1) are legal
            pl.BlockSpec(
                (L, 1, R, 1), lambda i, j: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        grid_of = lambda nb: (nb // B, bpc)
        if out_t:
            out_spec = pl.BlockSpec(
                (L, 1, R, LANES), lambda i, j: (0, i, 0, j),
                memory_space=pltpu.VMEM,
            )
            out_shape_of = lambda nb: (L, nb // B, R, B)
        else:
            out_spec = bs_x
            out_shape_of = lambda nb: (L, R, nb)
    else:
        bs_x = pl.BlockSpec(
            (L, R, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        in_specs = [
            bs_x,
            pl.BlockSpec((L, R, 3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        if tw_mode == "lanes":
            in_specs.append(
                pl.BlockSpec(
                    (L, R, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                )
            )
        elif tw_mode == "const":
            in_specs.append(
                pl.BlockSpec((L, R, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
            )
        grid_of = lambda nb: (nb // LANES,)
        if out_t:
            out_spec = pl.BlockSpec(
                (L, LANES, R), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            out_shape_of = lambda nb: (L, nb, R)
        else:
            out_spec = bs_x
            out_shape_of = lambda nb: (L, R, nb)

    def call(x, ts, t=None):
        if fv._interpret():
            y = _pass_jnp(spec, R, tw_mode, B, x, ts, t)
            if out_t:  # emulate the fused transpose write
                nb = x.shape[2]
                if tw_mode == "lanes":
                    y = jnp.transpose(y, (0, 2, 1))  # [L, M2, R]
                else:
                    y = jnp.transpose(
                        y.reshape(L, R, nb // B, B), (0, 2, 1, 3)
                    )  # [L, M2, R, B]
            return y
        nb = x.shape[2]
        args = (x, ts) + ((t,) if has_tw else ())
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape_of(nb), jnp.uint32),
            grid=grid_of(nb),
            in_specs=in_specs,
            out_specs=out_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(*args)

    return call


# ---------------------------------------------------------------------------
# recursive driver (XLA glue: reshapes, transposes, bit-reverse gathers)
# ---------------------------------------------------------------------------


def _choose_r(M: int, B: int) -> int:
    """Largest R <= RMAX with M2 * B >= 128 (so lane blocks are full)."""
    R = min(RMAX, M)
    while R > 2 and (M // R) * B < LANES:
        R //= 2
    return R


def _plan(k: int, omega: int, scale: int):
    """Static recursion plan for n = 2^k: list of levels
    (M, B, R, M2, omega_level, scale_level).  The cross-twiddle tables are
    too large to bake into HLO as constants, so callers build them from the
    plan and pass them as jit arguments (see _tw_args)."""
    levels = []
    M, B = 1 << k, 1
    om = omega
    sc = scale
    while True:
        R = _choose_r(M, B)
        if M == R:
            levels.append((M, B, R, 0, om, sc))
            return levels
        M2 = M // R
        levels.append((M, B, R, M2, om, sc))
        M, B = M2, R * B
        om = pow(om, R, FR_MOD)
        sc = 1  # scale folds into the first level's table only


@functools.lru_cache(maxsize=None)
def _tw_args(k: int, omega: int, scale: int):
    """Device cross-twiddle tables, one per plan level (None where a level
    needs no table), built OUTSIDE any trace."""
    args = []
    for (M, B, R, M2, om, sc) in _plan(k, omega, scale):
        if M == R:
            args.append(
                jnp.asarray(_cross_twiddles(1, R, 1, sc)) if sc != 1 else None
            )
        elif B == 1:
            args.append(jnp.asarray(_cross_twiddles(om, R, M2, sc)))
        else:
            tw = _cross_twiddles(om, R, M2, sc)
            args.append(
                jnp.asarray(np.transpose(tw, (0, 2, 1))[:, :, :, None])
            )
    return tuple(args)


def _ntt_axis(x, levels, tws):
    """DIT recursion over x [16, M, B] with half the old glue absorbed:
    each level's bit-reverse row permutation stays an XLA-level take of a
    256-entry index over 64 KB-contiguous rows (Mosaic cannot gather
    across sublane vregs in-kernel), but the inter-level (R, M2) -> (M2, R)
    transpose rides the pass kernel's output BlockSpec (out_t), and the
    output comes out in natural order with no final permutation.

    (Measured at 2^22 on v5e: take+transpose XLA glue cost ~12.5 ms per
    level boundary; a Gentleman-Sande DIF variant removed all glue but its
    butterflies ran 2.5x slower and the composed digit-reversal gather
    cost 147 ms — DIT + fused output transpose keeps the fast butterflies
    and pays only the takes.)"""
    (M, B, R, M2, om, sc), *rest = levels
    tw, *tw_rest = tws
    omega_r = pow(om, M // R, FR_MOD)
    ts = _stage_twiddles(omega_r, R)
    rev = jnp.asarray(np.asarray(_bitrev_perm(R.bit_length() - 1)))

    if M == R:
        xb = jnp.take(x, rev, axis=1)
        if tw is not None:
            return _pass_call(FR, R, B, "const")(xb, ts, tw)
        return _pass_call(FR, R, B, "none")(xb, ts)

    x4 = x.reshape(L, R, M2, B)
    xb = jnp.take(x4, rev, axis=1).reshape(L, R, M2 * B)
    if B == 1:
        assert M2 % LANES == 0, (M, R, M2)
        y = _pass_call(FR, R, M2 * B, "lanes", out_t=True)(xb, ts, tw)
    else:
        y = _pass_call(FR, R, M2 * B, "percol", B, M2, out_t=True)(xb, ts, tw)
    # out_t already wrote the (M2, R) transpose: recurse on m2, batch (R, B)
    return _ntt_axis(y.reshape(L, M2, R * B), rest, tw_rest)


def ntt_vec(xv, k: int, omega: int, inverse: bool = False, tws=None):
    """NTT (or scaled iNTT) of a [16, n] flat vec-layout array."""
    n = 1 << k
    assert k >= MIN_FUSED_K, f"fused NTT needs k >= {MIN_FUSED_K}, got {k}"
    assert xv.shape == (L, n) or xv.shape == (L, n // LANES, LANES)
    x = xv.reshape(L, n, 1)
    if inverse:
        omega = pow(omega, -1, FR_MOD)
        scale = pow(n, -1, FR_MOD)
    else:
        scale = 1
    if tws is None:
        tws = _tw_args(k, omega, scale)  # constants if called in a trace
    out = _ntt_axis(x, _plan(k, omega, scale), list(tws))
    return out.reshape(L, n)


@functools.partial(jax.jit, static_argnames=("k", "omega", "inverse"))
def _ntt_jit_inner(a, tws, k: int, omega: int, inverse: bool):
    v = fv.to_vec(a)
    out = ntt_vec(v.reshape(L, -1), k, omega, inverse, tws=tws)
    return fv.from_vec(out.reshape(L, -1, LANES), 1 << k)


def _ntt_jit(a, k: int, omega: int, inverse: bool):
    if inverse:
        tws = _tw_args(k, pow(omega, -1, FR_MOD), pow(1 << k, -1, FR_MOD))
    else:
        tws = _tw_args(k, omega, 1)
    return _ntt_jit_inner(a, tws, k, omega, inverse)


def use_fused(k: int) -> bool:
    """The fused path runs on TPU for large domains; elsewhere the portable
    jnp path (value-identical) is both the fallback and the test oracle —
    mirroring the 25k-op kernel body through XLA-CPU is uncompilable."""
    return k >= MIN_FUSED_K and not fv._interpret()


def ntt_fused(a, k: int, omega: int):
    """Drop-in for poly.ntt.ntt on a [n, 16] array (single polynomial)."""
    if not use_fused(k):
        from . import ntt as _jnp_ntt

        return _jnp_ntt.ntt(a, k, omega)
    return _ntt_jit(a, k, omega, False)


def intt_fused(a, k: int, omega: int):
    if not use_fused(k):
        from . import ntt as _jnp_ntt

        return _jnp_ntt.intt(a, k, omega)
    return _ntt_jit(a, k, omega, True)
