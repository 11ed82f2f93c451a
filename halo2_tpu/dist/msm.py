"""Sharded Pippenger MSM (SURVEY.md 2.3 'Data-parallel MSM').

Points and scalars are sharded contiguously over the mesh; each chip runs the
full local bucket pipeline (ec/msm.py) on its shard, then the per-chip
Jacobian partials are `all_gather`ed over ICI (one tiny 3×16-word point per
chip) and tree-added.  EC addition is not a `psum`-able monoid over uint32
limbs, so the gather+fold replaces the reference's rayon chunk-join
(`best_multiexp`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ec import jax_g1 as g1
from ..ec.msm import _msm_core
from .mesh import SHARD_AXIS


@functools.partial(jax.jit, static_argnames=("c", "mesh"))
def _msm_sharded_jit(PX, PY, scalars, c: int, mesh):
    def local(px, py, s):
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
        c = 16 if local_n >= (1 << 16) else (8 if local_n >= (1 << 7) else 4)
    return _msm_sharded_jit(PX, PY, scalars, c, mesh)
