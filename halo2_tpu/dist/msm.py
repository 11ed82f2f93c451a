"""Sharded Pippenger MSM (SURVEY.md 2.3 'Data-parallel MSM').

Points and scalars are sharded contiguously over the mesh; each chip runs a
local bucket pipeline on its shard, then the per-chip partials are
`all_gather`ed over ICI and folded.  EC addition is not a `psum`-able monoid
over uint32 limbs, so the gather+fold replaces the reference's rayon
chunk-join (`best_multiexp`).

Two local pipelines:
  * `msm_sharded` — the portable Pippenger core (ec/msm.py) per shard;
    one Jacobian point gathered per chip.  Runs everywhere (the CPU
    dryrun path).
  * `msm_sharded_vec` — the production sort+scan window-partials kernel
    set (ec/msm_vec.py) per shard; the per-window (T_max, sum_T) partials
    are additive across shards, so each chip gathers the [n_windows, 2, 48]
    partial block and the tiny Horner window fold runs on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ec import jax_g1 as g1
from ..ec.msm import TINY_MSM_MAX, _msm_core, _msm_tiny
from .mesh import SHARD_AXIS


@functools.partial(jax.jit, static_argnames=("c", "mesh"))
def _msm_sharded_jit(PX, PY, scalars, c: int, mesh):
    def local(px, py, s):
        # c == 0 selects the compile-light bit-serial kernel (tiny shards:
        # the CPU-mesh dryrun, where XLA:CPU compile time dominates)
        if c == 0:
            x, y, z = _msm_tiny(px, py, s)
        else:
            x, y, z = _msm_core(px, py, s, c)
        gx = jax.lax.all_gather(x, SHARD_AXIS)  # [d, 16]
        gy = jax.lax.all_gather(y, SHARD_AXIS)
        gz = jax.lax.all_gather(z, SHARD_AXIS)
        pt = (gx, gy, gz)
        while pt[0].shape[0] > 1:
            m = pt[0].shape[0]
            half = m // 2
            lo = tuple(t[:half] for t in pt)
            hi = tuple(t[half : 2 * half] for t in pt)
            s2 = g1.padd(lo, hi)
            if m % 2:
                s2 = tuple(
                    jnp.concatenate([a, t[-1:]], axis=0) for a, t in zip(s2, pt)
                )
            pt = s2
        return tuple(t[0] for t in pt)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(PX, PY, scalars)


def msm_sharded(PX, PY, scalars, mesh, c: int | None = None):
    """MSM over sharded device arrays.

    PX, PY: [n, 16] Montgomery Fq affine coords, sharded along axis 0.
    scalars: [n, 16] raw Fr limbs, sharded along axis 0.
    Returns a replicated Jacobian point (x, y, z) of [16] arrays.
    """
    n = PX.shape[0]
    d = mesh.devices.size
    if n % d:
        raise ValueError(f"point count {n} not divisible by mesh size {d}")
    if c is None:
        local_n = n // d
        if local_n <= TINY_MSM_MAX:
            c = 0
        else:
            c = 16 if local_n >= (1 << 16) else (8 if local_n >= (1 << 7) else 4)
    return _msm_sharded_jit(PX, PY, scalars, c, mesh)


@functools.partial(jax.jit, static_argnames=("c", "mesh", "safe", "glv"))
def _msm_partials_sharded_jit(PX, PY, scalars, c: int, mesh,
                              safe: bool = False, glv: bool = False):
    from ..ec.msm_vec import _msm_window_partials, _msm_window_partials_glv

    def local(px, py, s):
        if glv:
            # production single-chip pipeline per shard (half the windows
            # for the same sort+scan volume) — the per-window partials stay
            # additive across shards, so the collective is unchanged
            parts, flags = _msm_window_partials_glv(px, py, s, c, safe=safe)
        else:
            parts, flags = _msm_window_partials(px, py, s, c, safe=safe)
        return (
            jax.lax.all_gather(parts, SHARD_AXIS),  # [d, n_windows, 2, 48]
            jax.lax.psum(jnp.max(flags), SHARD_AXIS),
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(PX, PY, scalars)


def msm_sharded_vec(PX, PY, scalars, mesh, c: int | None = None,
                    glv: bool | None = None):
    """MSM over sharded device arrays through the production window-partials
    pipeline; returns a host affine point (or None).

    Each shard's (T_max, sum_T) per-window Jacobian partials are additive
    across shards, so the collective is one [d, n_windows, 2, 48] gather and
    the 2^c scalar multiply / Horner fold stay on the host exactly as in
    `ec.msm_vec.msm_vec`."""
    import numpy as np

    from ..ec import host as ec_host
    from ..field.bn254 import FQ_MOD
    from ..field.limbs import mont_limbs_to_int

    n = PX.shape[0]
    d = mesh.devices.size
    if n % d:
        raise ValueError(f"point count {n} not divisible by mesh size {d}")
    local_n = n // d
    if c is None:
        c = 16 if local_n >= (1 << 16) else (8 if local_n >= (1 << 7) else 4)
    if glv is None:
        # mirror ec.msm_vec.msm_vec's gate: GLV pays once the shard is big
        # enough for the split kernel (and never in interpret/CPU-dryrun)
        from ..field import vec as fv

        glv = local_n >= (1 << 15) and not fv._interpret()
    V = 1 << c
    parts, flag = _msm_partials_sharded_jit(PX, PY, scalars, c, mesh, glv=glv)
    parts = np.asarray(parts)
    if int(np.asarray(flag)):
        # doubling-free scan hit an acc == q collision; safe re-run
        parts = np.asarray(
            _msm_partials_sharded_jit(PX, PY, scalars, c, mesh, safe=True,
                                      glv=glv)[0]
        )

    def to_host(coords):
        x = mont_limbs_to_int(coords[0:16], FQ_MOD)
        y = mont_limbs_to_int(coords[16:32], FQ_MOD)
        z = mont_limbs_to_int(coords[32:48], FQ_MOD)
        return ec_host.g1_jacobian_to_affine(x, y, z)

    acc = None
    n_windows = parts.shape[1]
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = ec_host.g1_double(acc)
        t_max = None
        sum_t = None
        for s in range(d):
            t_max = ec_host.g1_add(t_max, to_host(parts[s, w, 0, :]))
            sum_t = ec_host.g1_add(sum_t, to_host(parts[s, w, 1, :]))
        wsum = ec_host.g1_add(
            ec_host.g1_mul(t_max, V - 1) if t_max is not None else None,
            ec_host.g1_neg(sum_t) if sum_t is not None else None,
        )
        acc = ec_host.g1_add(acc, wsum)
    return acc
