"""Per-stage NTT profile at k=22: pass kernels vs XLA glue (bit-reverse
takes, inter-level transposes)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from halo2_tpu.utils import enable_compilation_cache


def log(m):
    print(m, file=sys.stderr, flush=True)


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])


def timeit(name, fn, variants, reps=3):
    fence(fn(variants[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = fn(variants[i % len(variants)])
    fence(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:<34} {ms:8.2f} ms")
    return ms


def main():
    enable_compilation_cache()
    from halo2_tpu.field import vec as fv
    from halo2_tpu.field.bn254 import FR_MOD, FR_ROOT_OF_UNITY, FR_S
    from halo2_tpu.poly import ntt_pallas as nt

    k = 22
    n = 1 << k
    L = nt.L
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
    levels = nt._plan(k, omega, 1)
    log(f"plan: {[(M, B, R, M2) for (M, B, R, M2, _, _) in levels]}")
    tws = nt._tw_args(k, omega, 1)

    rng = np.random.default_rng(5)
    mk = lambda s: jnp.asarray(
        rng.integers(0, 1 << 16, size=(L, n, 1), dtype=np.uint32)
    )
    xs = [mk(i) for i in range(3)]
    for x in xs:
        fence(x)

    # full NTT
    f_full = lambda a: nt._ntt_jit_inner(
        fv.from_vec(a.reshape(L, -1, 128), n), tws, k, omega, False)
    # level pieces
    (M, B, R, M2, om, sc) = levels[0]
    from halo2_tpu.poly.ntt import _bitrev_perm

    rev = jnp.asarray(_bitrev_perm(R.bit_length() - 1))
    ts = nt._stage_twiddles(pow(om, M // R, FR_MOD), R)

    @jax.jit
    def f_rev(x):
        x4 = x.reshape(L, R, M2, B)
        return jnp.take(x4, rev, axis=1).reshape(L, R, M2 * B)

    xb = f_rev(xs[0])
    timeit("lvl1 bit-reverse take", f_rev, xs)

    pass1 = nt._pass_call(nt.FR, R, M2 * B, "lanes")

    @jax.jit
    def f_pass1_t(xb_, tw):
        return pass1(xb_, ts, tw)

    f_pass1 = lambda xb_: f_pass1_t(xb_, tws[0])
    xbs = [f_rev(x) for x in xs]
    for v in xbs:
        fence(v)
    y1 = f_pass1(xbs[0])
    timeit("lvl1 pass kernel (R=256+tw)", f_pass1, xbs)

    @jax.jit
    def f_transpose1(y):
        return y.reshape(L, R, M2, B).transpose(0, 2, 1, 3).reshape(L, M2, R * B)

    ys = [f_pass1(v) for v in xbs]
    for v in ys:
        fence(v)
    timeit("lvl1 transpose (R,M2)->(M2,R)", f_transpose1, ys)

    # level 2
    (M_2, B_2, R_2, M2_2, om2, _) = levels[1]
    rev2 = jnp.asarray(_bitrev_perm(R_2.bit_length() - 1))
    ts2 = nt._stage_twiddles(pow(om2, M_2 // R_2, FR_MOD), R_2)
    zs = [f_transpose1(v) for v in ys]
    for v in zs:
        fence(v)

    @jax.jit
    def f_rev2(z):
        z4 = z.reshape(L, R_2, M2_2, B_2)
        return jnp.take(z4, rev2, axis=1).reshape(L, R_2, M2_2 * B_2)

    timeit("lvl2 bit-reverse take", f_rev2, zs)
    pass2 = nt._pass_call(nt.FR, R_2, M2_2 * B_2, "percol", B_2, M2_2)

    @jax.jit
    def f_pass2_t(zb, tw):
        return pass2(zb, ts2, tw)

    f_pass2 = lambda zb: f_pass2_t(zb, tws[1])

    z2s = [f_rev2(v) for v in zs]
    for v in z2s:
        fence(v)
    timeit("lvl2 pass kernel (percol)", f_pass2, z2s)

    timeit("FULL ntt 2^22", f_full, xs)


if __name__ == "__main__":
    main()
